"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the recurring lineitem⋈orders-shaped joins dominate shuffle
volume. Writing both sides bucketed (+ sorted) by the join key lets
Spark plan a SortMergeJoin with NO Exchange on either side — the
shuffle is paid once at layout time and amortized over every
subsequent join. This module wraps the saveAsTable bucketing API
(bucketing metadata only exists for catalog tables, not bare parquet
paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. ``n_buckets`` should match cluster reduce parallelism and
    stay stable across tables that join together."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key; with matching
    bucket specs Catalyst elides both Exchanges (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
