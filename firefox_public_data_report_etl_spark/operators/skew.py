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
