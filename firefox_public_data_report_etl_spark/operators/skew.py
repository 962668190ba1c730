"""Skew-mitigation operators.

The reference's Worldwide fan-out (J2) concentrates half of all rows
under one group key — the canonical aggregation-skew shape. Spark's
partial (map-side) aggregation already bounds simple sums, but
high-cardinality DISTINCT aggregates under a hot key still funnel one
reducer. ``salted_count_distinct`` spreads a hot group across
``n_salts`` reducers by hashing the distinct key into salt buckets:

  stage 1: groupBy(group, salt = hash(key) % n) → per-salt distincts
  stage 2: groupBy(group) → sum of per-salt distinct counts

Counting is exact because a given key always lands in the same salt
bucket (no double counting across buckets). AQE's skew handling covers
joins; this covers the aggregation side it doesn't.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    out_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT key) per group via two-stage salting."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salts)))
    per_salt = salted.groupBy(*group_cols, "_salt").agg(
        F.countDistinct(key_col).alias("_d")
    )
    return per_salt.groupBy(*group_cols).agg(F.sum("_d").alias(out_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key join salting: when ONE join key exceeds what a single
    task can process, AQE's skew split (which splits partitions, not
    keys) is not enough — the key itself must be spread.

    Left rows get a deterministic salt from their full row hash
    (content-derived: reproducible, no RNG); the right side is
    replicated ``n_salts`` times, one copy per salt; the join runs on
    (keys..., salt) so the hot key fans across ``n_salts`` reducers.
    Replication multiplies the right side — use for dim-like or
    pre-aggregated right sides, with AQE handling residual imbalance.
    Semantics are identical to the plain join (agreement-tested) for
    inner/left joins."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l.join(r, keys + ["_salt"], how).drop("_salt")


def key_skew_audit(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """The measurement that DECIDES salting: per-key count rollup →
    the K hottest keys, each row carrying the global skew summary —
    row count, key cardinality, hottest-key count, the hot key's
    share, and ``suggested_salt`` = how many times the hottest key
    exceeds the average key (the salt-bucket count that levels it;
    1 = no salting needed). Run this before choosing between the
    native and salted forms of a hot aggregation/join.

    Scale shape: ONE map-side-combined count aggregate (key grain);
    the global summary is a second aggregate over the KEY-grain
    rollup; the top-K is orderBy+limit → TakeOrderedAndProject
    (per-partition partial top-K, no global sort); rank is a window
    over the ALREADY-LIMITED K rows. Every share is a single final
    division over exact integers."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    g = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(g))
        .select(
            "key",
            "cnt",
            "rank",
            (F.col("cnt").cast("double") / F.col("n_rows")).alias("share"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_cnt").cast("long").alias("max_cnt"),
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("(max_cnt * n_keys) div n_rows"),
            ).alias("suggested_salt"),
        )
    )
