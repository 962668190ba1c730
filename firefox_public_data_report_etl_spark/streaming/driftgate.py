"""Streaming drift gate: the data-quality circuit breaker.

The batch drift audit (plans/quality.py:corpus_drift_audit) scores a
whole release against its parent. At ingestion time the equivalent
control is per micro-batch: bin the arriving documents with the SAME
literal edges, score the batch against a FIXED reference histogram
with the same integer-exact TVD-in-ppm formula, and admit or reject
the batch WHOLE — a drifted batch (upstream regression, schema creep,
a scraper gone wrong) must not poison the corpus one accepted row at
a time, which is why this gate's unit of acceptance is the batch, not
the row (every other gate here filters rows; this one trips).

Exactly-once by the same label protocol as the other six surfaces
(neardup / embed / media / video / idalloc / budget):

- accepted batches land under the batch's own ``bl`` label via scoped
  dynamic overwrite — replay REPLACES the slice with identical rows;
- the verdict meta row (label, n_rows, tvd_ppm, accepted) is written
  LAST and is a pure function of (batch content, reference, edges,
  threshold) — replay rewrites it bit-identically;
- a rejected batch commits ONLY its meta row (audit trail: the trip
  is durable and replayable, the rows never land);
- read_accepted hides any half-written slice whose meta is missing
  (crash window) and any slice whose verdict is a reject.

Scale: per trigger, one map-side histogram of the batch (≤ bins
rows collected — meta-sized, same class as the other gates' driver
sums), one ppm comparison in exact integers, one label write. The
reference histogram is a constant; history is never rescanned.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.operators.incremental import (
    _require_local_dir,
)
from firefox_public_data_report_etl_spark.sources.tables import (
    partition_overwrite_mode,
)

META_SCHEMA = "bl long, n_rows long, tvd_ppm long, accepted boolean"


def _drift_constants():
    # deferred: plans.quality import at module level would re-enter
    # the streaming package through plans/__init__ → registry →
    # streamingq (circular import, caught by test collection)
    from firefox_public_data_report_etl_spark.plans.quality import (
        DRIFT_BIN_EDGES,
        DRIFT_PPM_THRESHOLD,
    )

    return DRIFT_BIN_EDGES, DRIFT_PPM_THRESHOLD


def _bin_expr(len_col: str):
    edges, _ = _drift_constants()
    e = F.when(F.length(len_col) < edges[0], 0)
    for i in range(1, len(edges)):
        e = e.when(F.length(len_col) < edges[i], i)
    return e.otherwise(len(edges))


def reference_histogram(
    docs: DataFrame, text_col: str = "text"
) -> dict[int, int]:
    """Bin counts of the reference corpus — computed once at gate
    setup (e.g. from the last promoted release) and passed to every
    trigger as a constant."""
    rows = (
        docs.select(_bin_expr(text_col).alias("bin"))
        .groupBy("bin")
        .count()
        .collect()
    )
    return {int(r["bin"]): int(r["count"]) for r in rows}


def tvd_ppm(batch_counts: dict[int, int], ref_counts: dict[int, int]) -> int:
    """Integer-exact TVD in ppm between two histograms — the
    corpus_drift_audit formula, driver-side over ≤ bins entries."""
    n_b = sum(batch_counts.values())
    n_r = sum(ref_counts.values())
    if n_b == 0 or n_r == 0:
        return 1_000_000
    num = sum(
        abs(batch_counts.get(b, 0) * n_r - ref_counts.get(b, 0) * n_b)
        for b in set(batch_counts) | set(ref_counts)
    )
    return (1_000_000 * num) // (2 * n_b * n_r)


def drift_gate_batch(
    spark: SparkSession,
    batch: DataFrame,
    store: str,
    reference: dict[int, int],
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int | None = None,
) -> None:
    """One micro-batch of the circuit breaker: score, then admit the
    batch whole or trip and commit only the audit row."""
    if threshold_ppm is None:
        threshold_ppm = _drift_constants()[1]
    _require_local_dir(store)
    label = batch_id + 1
    counts = {
        int(r["bin"]): int(r["cnt"])
        for r in batch.select(_bin_expr(text_col).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n_rows = sum(counts.values())
    ppm = tvd_ppm(counts, reference)
    accepted = ppm < threshold_ppm and n_rows > 0
    if accepted:
        slice_rows = batch.select(
            id_col,
            text_col,
            F.lit(label).cast("long").alias("bl"),
        )
        with partition_overwrite_mode(spark, "dynamic"):
            slice_rows.write.partitionBy("bl").mode("overwrite").parquet(
                f"{store}/accepted"
            )
    meta = spark.createDataFrame(
        [(label, n_rows, ppm, accepted)], META_SCHEMA
    )
    with partition_overwrite_mode(spark, "dynamic"):
        meta.write.partitionBy("bl").mode("overwrite").parquet(
            f"{store}/meta"
        )


def read_accepted(
    spark: SparkSession,
    store: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of batches that were scored, admitted, AND committed —
    a half-written slice without meta (crash window) and a tripped
    batch's stray rows are both invisible. A store where every batch
    tripped has no accepted/ directory at all; that reads as empty,
    not as an error (the breaker doing its job is not a fault)."""
    if not (Path(store) / "accepted").exists():
        return spark.createDataFrame(
            [], f"{id_col} long, {text_col} string"
        )
    acc = spark.read.parquet(f"{store}/accepted")
    ok = (
        spark.read.schema(META_SCHEMA)
        .parquet(f"{store}/meta")
        .filter(F.col("accepted"))
        .select("bl")
        .distinct()
    )
    return acc.join(ok, "bl", "left_semi").drop("bl")


def read_verdicts(spark: SparkSession, store: str) -> DataFrame:
    """The durable audit trail: one row per scored batch."""
    return spark.read.schema(META_SCHEMA).parquet(f"{store}/meta")


def stream_drift_gate(
    stream: DataFrame,
    store: str,
    checkpoint: str,
    reference: dict[int, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int | None = None,
):
    """writeStream wiring; availableNow so backfills drain and stop."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: drift_gate_batch(
                b.sparkSession,
                b,
                store,
                reference,
                bid,
                id_col,
                text_col,
                threshold_ppm,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
