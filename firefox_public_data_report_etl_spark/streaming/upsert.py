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

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from firefox_public_data_report_etl_spark.operators.merge import merge_rows


def recover_swap(target_path: str) -> None:
    """Roll forward/back an interrupted swap so checkpoint replay never
    merges against a half-written target. Invariant of the swap
    protocol below: ``._old`` only exists between the two renames, and
    the target dir is only ever a COMPLETE table (staging is written
    aside, never in place)."""
    old = f"{target_path}._old"
    if Path(old).exists() and not Path(target_path).exists():
        os.rename(old, target_path)  # crashed between the two renames
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(f"{target_path}._staging", ignore_errors=True)


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str | None = None,
) -> None:
    """One micro-batch MERGE into the parquet target.

    With ``order_col``, each key's LATEST revision wins globally: the
    winner is picked over union(target, batch) ordered by order_col
    (tie → the incoming batch row), so an out-of-order older revision
    arriving in a later micro-batch can NOT overwrite a newer row
    already in the target. Without ``order_col`` the contract is
    last-write-wins: the batch row replaces the target row
    (within-batch duplicates collapse arbitrarily-but-deterministically
    first, since MERGE requires unique source keys).

    The target rewrite is crash-safe on a POSIX filesystem: write to a
    staging dir, rename the live target aside, rename staging into
    place (both renames atomic), then delete the old copy — and
    ``recover_swap`` rolls an interrupted swap forward on the next batch.
    On an object store without atomic rename, swap the sink for a
    manifest-pointer flip or a MERGE-native table format; the merge
    logic is unchanged.
    """
    recover_swap(target_path)
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
        if order_col is not None:
            # Latest-wins ACROSS batches: rank over union(target, batch)
            # by order_col desc; _src breaks exact-timestamp ties toward
            # the incoming row (same one-shuffle shape as merge_rows).
            tagged = target.withColumn("_src", F.lit(0)).unionByName(
                batch.withColumn("_src", F.lit(1))
            )
            w = Window.partitionBy(*keys).orderBy(
                F.desc(order_col), F.desc("_src")
            )
            merged = (
                tagged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_src", "_rn")
            )
        else:
            merged = merge_rows(target, batch, keys)
    else:
        merged = batch
    swap_write(merged, target_path)


def swap_write(df: DataFrame, target_path: str) -> None:
    """Staging-then-swap parquet rewrite: fully materialize the new
    table aside (the plan may read the files it replaces), then two
    atomic renames — the crash window `recover_swap` rolls forward. Shared
    by every foreachBatch sink in this package that rewrites a
    read-modify-write target."""
    staging = f"{target_path}._staging"
    old = f"{target_path}._old"
    df.write.mode("overwrite").parquet(staging)
    if Path(target_path).exists():
        os.rename(target_path, old)
    os.rename(staging, target_path)
    shutil.rmtree(old, ignore_errors=True)


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
