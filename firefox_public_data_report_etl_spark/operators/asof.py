"""As-of / range join (reference J4, J5).

Reference shapes:
  - J4: generated date spine joined to builds on
    ``DATE(build.date) <= day`` then MAX(version) per day
    (annotations.py:46-62) — latest release as of each spine day.
  - J5: active clients joined to ``latest_releases.day <= last_day_seen``
    then MAX per client (…user_activity.sql:166-186).

Three physical strategies, chosen by the caller:

  * ``asof_latest_broadcast`` — broadcast the (small) right side and do
    a theta join + group-max. Right side must be broadcastable
    (releases = hundreds of rows). O(|L| x |R|) work but no shuffle of
    the left side beyond the final aggregation.

  * ``asof_latest_union_window`` — the 100 TB path: union left and
    right on a shared time axis and take ``last(value) ignore nulls``
    over an ordered window. ONE hash shuffle + sort, no cross
    product; scales to large right sides and is the strategy a
    custom as-of operator would lower to.

  * ``asof_latest_cogroup`` — the pandas escape-hatch form:
    ``groupby(...).cogroup(...).applyInPandas`` hands each key's left
    and right slices to ``pandas.merge_asof`` (Arrow-batched). Same
    shuffle shape as the union-window form (both sides hash on the
    `by` key); useful when as-of semantics grow beyond what a window
    expresses (nearest-tolerance, backward+forward). All three are
    equivalence-tested against each other.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_latest_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    allow_equal: bool = True,
) -> DataFrame:
    """Left + the max of each value col over right rows at-or-before
    ``left_time``. Right side is broadcast (must be small).

    Duplicate left rows are preserved (a hidden row id keeps the
    post-join re-aggregation from collapsing them), matching the
    union-window strategy's multiplicity semantics.
    """
    cond = (
        F.col(f"_r.{right_time}") <= F.col(f"_l.{left_time}")
        if allow_equal
        else F.col(f"_r.{right_time}") < F.col(f"_l.{left_time}")
    )
    l = left.withColumn("_rid", F.monotonically_increasing_id())
    joined = l.alias("_l").join(F.broadcast(right.alias("_r")), cond, "left")
    aggs = [F.max(f"_r.{v}").alias(v) for v in value_cols]
    return (
        joined.groupBy(*[F.col(f"_l.{c}") for c in l.columns])
        .agg(*aggs)
        .drop("_rid")
    )


def asof_latest_union_window(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Scalable as-of: merge both sides on the time axis, carry the most
    recent right value forward with ``last(..., ignorenulls)``.

    Right rows sort before left rows at equal timestamps, so
    ``right_time == left_time`` matches (BigQuery ``<=`` semantics).
    """
    lcols = left.columns
    l = left.withColumn("_t", F.col(left_time)).withColumn("_src", F.lit(1))
    r = (
        right.select(
            *by,
            F.col(right_time).alias("_t"),
            F.col(value_col).alias("_v"),
        )
        .withColumn("_src", F.lit(0))
    )
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    merged = l.withColumn("_v", F.lit(None).cast(r.schema["_v"].dataType)).select(
        *[F.col(c) for c in lcols], "_t", "_src", "_v"
    ).unionByName(
        r.select(
            *[
                F.col(c) if c in by else F.lit(None).cast(ltypes[c]).alias(c)
                for c in lcols
            ],
            "_t",
            "_src",
            "_v",
        ),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn("_asof", F.last("_v", ignorenulls=True).over(w))
    return out.filter(F.col("_src") == 1).select(
        *lcols, F.col("_asof").alias(value_col)
    )


def asof_latest_cogroup(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """As-of via cogrouped ``applyInPandas``: per `by`-key slices of
    both sides meet in one Arrow batch and ``pandas.merge_asof``
    (backward, exact matches allowed) does the lookup — identical
    semantics to ``asof_latest_union_window``.

    Shuffle shape is the same as the union-window form (both sides
    hash-partition on the key); reach for this one when the as-of
    needs pandas-only variants (tolerance windows, forward/nearest).

    PRECONDITION (all three strategies): right_time values must be
    unique per key. With duplicate timestamps, merge_asof keeps the
    last duplicate in INPUT order and the union-window twin's last()
    keeps the last in partition order — both orders depend on how
    Spark happened to partition the right side, so the result is
    nondeterministic and the strategies can disagree. Pre-aggregate
    the right side to one value per (key, timestamp) — e.g.
    max_by(value, revision) — before the lookup; the agreement test
    (test_operators) runs on unique-timestamp fixtures.
    """
    import pandas as pd

    from pyspark.sql.types import StructType

    lcols = left.columns
    vfield = right.schema[value_col]
    out_schema = StructType(list(left.schema.fields) + [vfield])
    int_value = vfield.dataType.typeName() in ("long", "integer", "short", "byte")
    keys = list(by) if by else ["_k"]
    if not by:
        left = left.withColumn("_k", F.lit(0))
        right = right.withColumn("_k", F.lit(0))

    def _merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=lcols + [value_col])
        l = l.copy()
        l["_t"] = pd.to_datetime(l[left_time])
        if len(r) == 0:
            out = l
            out[value_col] = None
        else:
            r = r[[right_time, value_col]].copy()
            r["_t"] = pd.to_datetime(r[right_time])
            out = pd.merge_asof(
                l.sort_values("_t", kind="stable"),
                r[["_t", value_col]].sort_values("_t", kind="stable"),
                on="_t",
                direction="backward",
                allow_exact_matches=True,
            )
        if int_value:
            out[value_col] = out[value_col].astype("Int64")
        return out[lcols + [value_col]]

    return (
        left.groupby(*keys)
        .cogroup(right.groupby(*keys))
        .applyInPandas(_merge, out_schema)
    )
