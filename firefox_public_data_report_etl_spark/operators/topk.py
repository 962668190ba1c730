"""Per-group top-K (reference A13/O5).

Reference: ``ARRAY_AGG(STRUCT(name, ratio) ORDER BY ratio DESC LIMIT K)``
per (week, country) — top-10 addons, top-5 locales
(…user_activity.sql:245-255,315-325).

Scale notes: the window `row_number` strategy is a single hash
shuffle on the group keys followed by a per-partition sort — no global
sort. For extreme cardinality groups, Spark's window TopK pushdown
(rank limit) keeps state bounded; the `top_k_array` variant instead
aggregates with ``slice(sort_array(collect_list(...)))`` which does
partial aggregation map-side and is preferable when K is tiny and
groups are huge (state is K structs per group, not the full group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Flat form: keeps the top-K rows per group with a 1-based rank.

    ``order_by`` must be a deterministic total order (pass tie-breaker
    columns) or ranks are nondeterministic under retries.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_array(
    df: DataFrame,
    group_cols: Sequence[str],
    sort_key: Column,
    payload: Column,
    k: int,
    out_col: str,
) -> DataFrame:
    """Nested form (faithful to A13's ARRAY_AGG output): one row per
    group with an ordered array of the top-K payload structs.

    Aggregation-based: ``collect_list`` + ``sort_array`` + ``slice``
    benefits from partial (map-side) aggregation; sort key is embedded
    first in the struct so ``sort_array`` orders by it.
    """
    struct = F.struct(sort_key.alias("_k"), payload.alias("v"))
    arr = F.slice(F.sort_array(F.collect_list(struct), asc=False), 1, k)
    return df.groupBy(*group_cols).agg(
        F.transform(arr, lambda s: s["v"]).alias(out_col)
    )


def top_k_per_group_salted(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    salt: Column | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase top-K for LOW-CARDINALITY groups: a plain window on
    25 nation keys funnels every row into 25 shuffle partitions no
    matter how many cores the cluster has. Phase 1 ranks within
    (group, salt) — group_cardinality x n_salts partitions, each
    sorting 1/n_salts of a group — and keeps k rows per salt; phase 2
    re-ranks the surviving group_cardinality x n_salts x k rows with
    the plain window, which is now trivially small.

    Identical output to ``top_k_per_group`` for any salt assignment:
    every global top-k row is necessarily in its own salt's local
    top-k, and phase 2's total order (the same ``order_by``; pass
    tie-breakers) re-derives the exact ranks. Default salt is
    ``spark_partition_id()`` — zero extra columns read; pass a
    key-derived hash instead if the input partitioning is itself
    skewed.
    """
    for tmp in ("_salt", "_lr"):
        if tmp in df.columns:
            raise ValueError(
                f"input already has a {tmp!r} column; rename it before "
                "the salted top-K (temp columns would clobber it)"
            )
    s = salt if salt is not None else F.spark_partition_id() % n_salts
    local_w = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("_salt", s)
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
        .drop("_salt", "_lr")
    )
    return top_k_per_group(survivors, group_cols, order_by, k, rank_col)
