"""Streaming near-dup ingestion gate: every micro-batch of incoming
documents is deduplicated against EVERYTHING accepted so far via the
persisted MinHash signature index (operators/incremental.py), its
keep/remove verdicts are landed, and the kept docs' signatures are
appended to the index — so the next batch dedups against base ∪ all
previously kept content. The streaming composition of the round-7
incremental-dedup operator family (reference has no streaming
surface — engine extension per SURVEY.md §2.9; the method is the
standard public LSH-index ingestion shape).

Exactly-once without a transaction log, by construction:

- the index append lands under the batch's own ``bl`` label by
  physically deleting the whole label slice and rewriting it in
  append mode (``append_to_minhash_index``) — replay fully REPLACES
  the label, never double-inserts. (Delete-then-append, NOT dynamic
  partition overwrite: dynamic overwrite only replaces the leaves
  the new write touches, so a replay whose kept-set shrank would
  leave stale band rows alive in untouched leaves — see the append
  docstring for the full review history.);
- the probe excludes the batch's own label
  (``probe_minhash_index(exclude_label=...)``) — on replay the
  crashed attempt's append is already present, and without the
  exclusion every batch doc would match its own signatures and be
  dropped; with it, replay sees exactly the pre-batch index state;
- decisions land partitioned by the same label with dynamic
  overwrite — replay replaces them with identical rows (decisions
  are a pure function of batch content + pre-batch index state).

Scale: per trigger, cost is the measured probe shape — batch-sized
signature compute, partition-pruned band/gram reads, pair-sized
verify + CC — never a rescan of accepted history. State lives in
parquet, not the state store, so it survives checkpoint loss and is
queryable mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.operators.dedup import (
    gram_hash_arrays,
    minhash_lsh_pairs_arr,
)
from firefox_public_data_report_etl_spark.operators.incremental import (
    append_to_minhash_index,
    incremental_decisions,
    probe_minhash_index,
)

NEARDUP_THRESHOLD = 0.5


def neardup_gate_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_path: str,
    decisions_path: str,
    batch_id: int,
    threshold: float = NEARDUP_THRESHOLD,
) -> None:
    """Process one micro-batch: probe → decide → land decisions →
    append kept signatures. ``batch_id`` is the streaming epoch id;
    the index label is ``batch_id + 1`` (0 is the initial build)."""
    label = batch_id + 1
    batch_hs = gram_hash_arrays(batch_docs).cache()
    probe = probe_minhash_index(
        spark, index_path, batch_hs, exclude_label=label
    )
    cross = probe.filter(F.col("jaccard") >= threshold)
    within = minhash_lsh_pairs_arr(batch_hs).filter(
        F.col("jaccard") >= threshold
    )
    # cached: the decisions DAG (probe verify + within-batch LSH +
    # CC) otherwise re-executes for each of the append's two writes —
    # measured as ~3x the probe work per trigger (review fix); the
    # relation is batch-grain ints
    decisions = (
        incremental_decisions(batch_docs.select("doc_id"), cross, within)
        .withColumn("batch_label", F.lit(label))
        .cache()
    )
    # dynamic mode scoped to the decisions write (shared context
    # manager — review fix history on sources.partition_overwrite_mode)
    from firefox_public_data_report_etl_spark.sources import (
        partition_overwrite_mode,
    )

    with partition_overwrite_mode(spark, "dynamic"):
        decisions.write.partitionBy("batch_label").mode(
            "overwrite"
        ).parquet(decisions_path)
    kept = decisions.filter("keep").select("doc_id")
    kept_hs = batch_hs.join(kept, "doc_id")
    append_to_minhash_index(spark, index_path, kept_hs, label)
    decisions.unpersist()
    batch_hs.unpersist()
    # decisions are materialized on disk now — release the probe's
    # cached candidate set so a long-running gate doesn't leak one
    # cached relation per micro-batch (probe docstring: caller-owned)
    for cached in getattr(probe, "_probe_persisted", []):
        cached.unpersist()


def stream_neardup_gate(
    docs_stream: DataFrame,
    index_path: str,
    decisions_path: str,
    checkpoint: str,
    threshold: float = NEARDUP_THRESHOLD,
):
    """writeStream wiring: foreachBatch over a streaming documents
    source (columns doc_id, text). ``availableNow`` so backfills
    drain and stop — a tailing deployment drops that option."""
    return (
        docs_stream.writeStream.foreachBatch(
            lambda b, bid: neardup_gate_batch(
                b.sparkSession, b, index_path, decisions_path, bid, threshold
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
