"""Stream-stream interval join — the Structured Streaming join family
the other modules don't cover (windows/sessions are aggregations;
upsert is a sink). The reference has no streaming at all (SURVEY.md
§2.9); this completes the engine's streaming surface with the
canonical event-attribution shape: purchases matched to the clicks
they followed within a bounded delay.

One definition serves batch (plain non-equi join) and streaming
(watermarks on BOTH sides plus the time-range condition are exactly
what lets Spark bound join state: each side's buffer is evicted once
the other side's watermark passes the interval).

Scale notes: the join keys on user_id, so both streams shuffle once
on the same key; state per key is the events inside the delay window
— bounded by watermark eviction, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Pairs each purchase with every click by the same user in the
    preceding ``max_delay`` (inclusive start, exclusive end). Pass
    ``watermark`` when both inputs are streams; on batch frames the
    same condition runs as a regular join.
    """
    if watermark is not None:
        clicks = clicks.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (c.c_user == p.p_user)
        & (p.purchase_ts >= c.click_ts)
        & (p.purchase_ts < c.click_ts + F.expr(f"interval {max_delay}"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
