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


# Hive-style directory partitioning — the OTHER layout lever besides
# bucketing. A filter on a partition column prunes at LISTING time
# (static pruning), and a join against a filtered dim prunes at RUN
# time via Spark's dynamic partition pruning (DPP): the dim side
# executes first as a subquery and the fact scan reads only the
# matched partition directories.
#
# DPP caveat the tests pin (tests/test_dpp.py): it only matters when
# the dim filter is on a NON-key attribute. A predicate expressible in
# the join key itself (e.g. ``dayofmonth(week) <= 7``) is propagated
# to the fact side as a STATIC partition filter by constraint
# propagation — measured: such a join reads the same files with DPP
# disabled. The week→attribute lookup shape (annotations, release
# dims) is the one that needs DPP.
#
# One implementation only (sources/tables.py) — re-exported here so
# layout callers find both levers in one module without two same-named
# functions drifting apart.
from firefox_public_data_report_etl_spark.sources.tables import (  # noqa: E402
    write_partitioned,
)

__all__ = [
    "write_bucketed",
    "cobucketed_join",
    "write_partitioned",
    "scan_file_stats",
]


def scan_file_stats(df: DataFrame) -> list[tuple[int, int | None]]:
    """(numFiles, numPartitions) per parquet scan of an EXECUTED
    DataFrame — the honest measure of partition pruning (plan strings
    show the filter; these metrics show files actually read). Walks
    the physical tree via py4j; requires adaptive execution OFF for
    the executed plan to be the final tree (test helper, not a
    production path)."""
    qe = df._jdf.queryExecution().executedPlan()
    out: list[tuple[int, int | None]] = []

    def walk(node) -> None:
        if "Scan" in node.nodeName():
            m = node.metrics()
            keys = m.keys().toList()
            d = {
                keys.apply(i): m.apply(keys.apply(i)).value()
                for i in range(keys.size())
            }
            if "numFiles" in d:
                out.append((d["numFiles"], d.get("numPartitions")))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(qe)
    return out
