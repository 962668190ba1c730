"""Streaming incremental upsert sink: ``foreachBatch`` + row-level
MERGE.

The lambda-architecture collapse for mutable state: a stream of
document revisions lands in a parquet "table" where each key's latest
revision wins — the streaming twin of ``operators.merge.merge_rows``.
``foreachBatch`` is the Structured Streaming escape hatch for sinks
Spark doesn't ship (MERGE targets among them): each micro-batch is a
plain DataFrame, so the SAME batch merge operator runs per batch, and
checkpointing makes the whole pipeline restartable.

Scale notes: per batch this reads the current target, merges, and
rewrites — correct and idempotent, but a full rewrite per batch. At
100 TB the target write goes through ``write_partitioned`` on a
date/bucket column (only partitions containing touched keys rewrite)
or a MERGE-native table format; the operator and the foreachBatch
wiring are unchanged — only the sink write strategy swaps.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from firefox_public_data_report_etl_spark.operators.merge import merge_rows


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str | None = None,
) -> None:
    """One micro-batch MERGE into the parquet target.

    A micro-batch can carry several revisions of one key; they collapse
    to the latest (by ``order_col``, else arbitrary-but-deterministic
    max) BEFORE the merge, since MERGE requires unique source keys.
    """
    if order_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        batch = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        batch = batch.dropDuplicates(keys)
    if Path(target_path).exists():
        target = spark.read.parquet(target_path)
        merged = merge_rows(target, batch, keys)
    else:
        merged = batch
    # Rewrite via a staging dir: the merge reads the files it replaces.
    staging = f"{target_path}._staging"
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(target_path)


def stream_upsert(
    source: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str | None = None,
):
    """Wires a streaming source into the upsert sink; returns the
    started query (availableNow-compatible; call awaitTermination)."""

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        upsert_batch(batch.sparkSession, batch, target_path, keys, order_col)

    return (
        source.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
