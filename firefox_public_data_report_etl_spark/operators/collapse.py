"""Threshold bucket-collapse (reference A15 — the one genuinely novel
operator; hardware_report.py:278-324).

Semantics (from the reference's golden test
tests/test_hardware_report.py:161-190):
  - buckets whose count < threshold (1% of the scope total) fold into
    an ``"Other"`` bucket;
  - designated sentinel keys (resolution ``"0x0"``) always fold;
  - exempt dimensions (``has_flash``, ``osArch``) never fold;
  - the ``os`` dimension collapses in TWO phases: small ``name-version``
    keys first fold to ``"name-Other"``, and still-small family buckets
    then fold to plain ``"Other"``.

Spark-first shape: the data-dependent rewrite is 2-3 chained
aggregations — counts, a window total per scope, a conditional re-key,
and a re-aggregation. No driver-side loops; the scope total comes from
a window SUM (one shuffle already paid by the first groupBy, reused).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

OTHER = "Other"


def _rekey_and_sum(
    df: DataFrame,
    scope_cols: Sequence[str],
    key_col: str,
    count_col: str,
    new_key: Column,
) -> DataFrame:
    return (
        df.withColumn(key_col, new_key)
        .groupBy(*scope_cols, key_col)
        .agg(F.sum(count_col).alias(count_col))
    )


def collapse_buckets(
    counts: DataFrame,
    scope_cols: Sequence[str],
    key_col: str,
    count_col: str,
    threshold: tuple[int, int] = (1, 100),
    sentinel_keys: Sequence[str] = (),
    family_split: str | None = None,
) -> DataFrame:
    """Collapse small buckets into ``Other`` within each scope.

    ``counts``: one row per (scope, key) with an additive ``count_col``.
    ``scope_cols``: e.g. the week — totals and thresholds are per scope.
    ``threshold``: (num, den) — a bucket is small iff
    ``count < floor(total * num / den)``, matching the reference's
    ``int(client_count * 0.01)`` absolute threshold
    (hardware_report.py:442) at (1, 100). Exact integer arithmetic
    (NOT ``count < total * 0.01`` in floats) so the boundary case is
    deterministic and engine-independent.
    ``sentinel_keys``: always collapsed regardless of size (reference
    resolution ``"0x0"``, hardware_report.py:292-293).
    ``family_split``: if set (e.g. ``"-"``), runs the two-phase os-style
    collapse: phase one folds small ``family<sep>version`` keys into
    ``family<sep>Other``, phase two folds still-small buckets into
    ``Other`` (hardware_report.py:295-315).

    Returns (scope_cols..., key_col, count_col, ratio) where ratio is
    count / scope total — deterministic: exact integer counts, single
    final division.
    """
    num, den = threshold
    scope_w = Window.partitionBy(*scope_cols) if scope_cols else Window.partitionBy()
    total = F.sum(count_col).over(scope_w)
    counts = counts.withColumn("_total", total).withColumn(
        "_thr", F.expr(f"_total * {num} div {den}")
    )

    small = (F.col(count_col) < F.col("_thr")) | F.col(key_col).isin(
        list(sentinel_keys)
    )

    if family_split is None:
        collapsed = _rekey_and_sum(
            counts,
            [*scope_cols, "_total", "_thr"],
            key_col,
            count_col,
            F.when(small, F.lit(OTHER)).otherwise(F.col(key_col)),
        )
    else:
        import re

        # escape: family_split is a literal separator, F.split takes a
        # regex ('.' or '|' would otherwise split on everything).
        family = F.split(F.col(key_col), re.escape(family_split), 2).getItem(0)
        phase1 = _rekey_and_sum(
            counts,
            [*scope_cols, "_total", "_thr"],
            key_col,
            count_col,
            F.when(
                small, F.concat(family, F.lit(family_split), F.lit(OTHER))
            ).otherwise(F.col(key_col)),
        )
        still_small = F.col(count_col) < F.col("_thr")
        collapsed = _rekey_and_sum(
            phase1,
            [*scope_cols, "_total", "_thr"],
            key_col,
            count_col,
            F.when(still_small, F.lit(OTHER)).otherwise(F.col(key_col)),
        )

    return collapsed.select(
        *scope_cols,
        key_col,
        count_col,
        (F.col(count_col).cast("double") / F.col("_total")).alias("ratio"),
    )
