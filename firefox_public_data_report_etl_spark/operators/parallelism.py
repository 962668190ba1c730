"""Scan-width repair for expansion-heavy narrow pipelines.

Spark's scan parallelism is bounded by parquet row groups (a split
cannot cut inside one). A compact table written as a single row group
therefore feeds ALL of its downstream narrow work — per-row feature
extraction, shingle explosion, Arrow-batched matmuls — through ONE
task, no matter how many cores the cluster has: narrow stages inherit
their parent's partitioning.

``widen_partitions`` repairs that ONLY when it is actually broken
(incoming partitions < the session's default parallelism — at real
scale a 100 TB table scans as thousands of splits and this is a
no-op). The repartition shuffles the PRE-expansion form of the data —
the compact side, e.g. documents before a 50x shingle explosion — so
the shuffle moves the small representation and buys full-width
execution for the expensive transform. That trade is scale-stable:
the cost is one pass over the narrow input, the win grows with the
expansion factor and the per-row compute.

When NOT to use it: scan→aggregate pipelines whose first shuffle
arrives quickly anyway (the groupBy re-parallelizes downstream), or
floor-bound queries where one extra exchange costs more than the
single-task map phase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` partitions
    (default: the session's ``defaultParallelism``) — a no-op when the
    plan already has at least that many.

    The partition count is read from the physical plan without running
    a job; round-robin (no key) keeps the expansion load balanced even
    when row payload sizes are skewed.
    """
    spark = df.sparkSession
    if target is None:
        try:
            target = spark.sparkContext.defaultParallelism
        except Exception:  # Spark Connect: no sparkContext handle —
            # the shuffle-partition conf is the session's stated
            # parallelism target and is readable in both modes
            target = int(
                spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
    # ``.rdd`` here only materializes the physical plan's partitioning
    # metadata (driver-side analysis, no job runs and no data moves);
    # ``getNumPartitions`` is the stable public API for that read —
    # DataFrame exposes no plan-level equivalent. Under Spark Connect
    # the RDD surface is absent: skip the no-op check and repartition
    # unconditionally (correct either way; at worst one extra
    # round-robin exchange).
    try:
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:
        pass
    return df.repartition(target)
