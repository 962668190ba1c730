"""Grid-bucketed interval overlap join.

Spark has no native interval join; the naive formulation
(``l.start < r.end AND r.start < l.end``) plans as a
BroadcastNestedLoopJoin — quadratic and broadcast-bound, unusable at
scale. This operator implements the standard distributed answer:

1. quantize time into fixed-width grid cells;
2. explode each interval into every cell it touches (narrow — no
   shuffle; fan-out = interval length / cell width, bounded when the
   cell width is chosen near the typical interval length);
3. equi-join on the cell id (hash shuffle both sides — the only
   shuffle, AQE-coalesced/skew-split like any other key join);
4. keep the exact overlap predicate as a residual filter;
5. emit each overlapping pair ONLY in the canonical cell containing
   ``max(l_start, r_start)`` — a filter, so no distinct/dedup shuffle
   is ever needed for pairs that co-occur in many cells.

Reference analog: the annotations spine range join (J4) broadcasts a
tiny side; this is the fact-×-fact form where neither side fits a
broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    grid_us: int = 3_600_000_000,
) -> DataFrame:
    """Pairs (left, right) rows whose half-open [start, end) intervals
    overlap. Interval columns are BIGINT epoch-micros. Returns all
    left columns + all right columns (names must not collide).

    ``grid_us`` tunes the fan-out/selectivity trade: cells much wider
    than typical intervals put many intervals per cell (bigger join
    groups); much narrower cells replicate long intervals across many
    cells. Near the median interval length is right.
    """

    def cells(s: str, e: str) -> Column:
        # half-open: an interval touching a cell boundary at its end
        # does not occupy the next cell ⇒ (e - 1) div grid
        return F.expr(
            f"sequence(`{s}` div {grid_us}, (`{e}` - 1) div {grid_us})"
        )

    # Empty intervals ([s, s)) overlap nothing under the half-open
    # predicate, and sequence(s div g, (s-1) div g) would auto-step -1
    # into a phantom DESCENDING cell list — drop them before exploding.
    lt = left.filter(F.col(l_start) < F.col(l_end)).withColumn(
        "_cell", F.explode(cells(l_start, l_end))
    )
    rt = right.filter(F.col(r_start) < F.col(r_end)).withColumn(
        "_cell", F.explode(cells(r_start, r_end))
    )
    joined = lt.join(rt.withColumnRenamed("_cell", "_rcell"),
                     F.col("_cell") == F.col("_rcell"))
    overlap = (F.col(l_start) < F.col(r_end)) & (
        F.col(r_start) < F.col(l_end)
    )
    # integer div, not / : float division loses exactness at large
    # epoch-micros magnitudes
    canonical = (
        F.expr(f"greatest(`{l_start}`, `{r_start}`) div {grid_us}")
        == F.col("_cell")
    )
    return joined.filter(overlap & canonical).drop("_cell", "_rcell")
