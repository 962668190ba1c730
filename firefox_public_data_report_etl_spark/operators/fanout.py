"""Row fan-out operators (reference J2, J3, U1).

Reference shapes:
  - ``FROM t, UNNEST([country, 'Worldwide'])`` — every row counted in
    its own group AND a rollup group (…user_activity.sql:23-24).
  - ``UNNEST(IF(ARRAY_LENGTH(a)>0, a, [a[SAFE_OFFSET(0)]]))`` — lateral
    unnest that KEEPS rows whose array is empty/NULL as a single
    NULL-element row, so they still count in distinct-count
    denominators (…user_activity.sql:59-67; SURVEY.md §7.4 flags this
    as a silent-wrong-answer hazard if done with plain ``explode``).

Scale notes: ``explode`` is a narrow transformation (no shuffle); the
2x fan-out doubles rows ahead of aggregation, which is exactly what the
reference does — the rollup group is skewed, AQE's skew handling plus
partial aggregation keep it safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_total_group(
    df: DataFrame, group_col: str, out_col: str, total_label: str = "Worldwide"
) -> DataFrame:
    """J2/U1: duplicate every row into its own group and `total_label`."""
    return df.withColumn(
        out_col, F.explode(F.array(F.col(group_col), F.lit(total_label)))
    )


def explode_preserving_empty(
    df: DataFrame, array_col: Column, out_col: str
) -> DataFrame:
    """J3: lateral unnest that emits one NULL row for empty/NULL arrays.

    ``explode_outer(when(size(arr) > 0, arr))`` — ``when`` maps empty
    arrays to NULL, and ``explode_outer`` keeps NULL/empty-array rows
    with a NULL element instead of dropping them.
    """
    return df.withColumn(
        out_col, F.explode_outer(F.when(F.size(array_col) > 0, array_col))
    )
