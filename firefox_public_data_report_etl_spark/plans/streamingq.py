"""Batch twin of the streaming tumbling-window aggregation.

The same ``tumbling_event_value`` function powers the Structured
Streaming pipeline (tests/test_streaming.py runs it with an
availableNow trigger); this batch binding gives it an oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.sources import load_table
from firefox_public_data_report_etl_spark.streaming import tumbling_event_value

WINDOW_SECONDS = 21600  # 6 hours


def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_event_value(ev, window="6 hours")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "sum_cents",
    )


TUMBLING_ORACLE = f"""
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / {WINDOW_SECONDS}) AS BIGINT)
                               * {WINDOW_SECONDS} * 1000000),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
"""


ATTRIBUTION_DELAY_S = 3600  # 1 hour


def click_purchase_pairs_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch binding (with oracle) of the stream-stream interval join
    (streaming/joins.py): purchases attributed to same-user clicks
    within the preceding hour, rolled up to click-week grain. The
    SAME join function runs as a watermarked stream-stream join in
    tests/test_streaming equivalence.

    Scale: both sides shuffle once on user_id; the per-user state the
    streaming form buffers is watermark-bounded, and the batch form's
    non-equi residual evaluates inside the equi-join on user_id (never
    a cross product — plan-asserted in test_plan_quality).
    """
    from firefox_public_data_report_etl_spark.streaming import (
        click_purchase_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    pairs = click_purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        max_delay="1 hour",
    )
    agg = pairs.groupBy(
        F.date_trunc("week", F.col("click_ts")).cast("date").alias("week_start")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            (
                F.signum(F.col("purchase_value"))
                * F.floor(F.abs(F.col("purchase_value")) * 100 + F.lit(0.5))
            ).cast("long")
        ).alias("attributed_cents"),
    )
    return agg.select(
        F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
        "n_pairs",
        "n_users",
        "attributed_cents",
    )


CLICK_PURCHASE_ORACLE = f"""
WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS purchase_ts, value FROM events
      WHERE event_type = 'purchase')
SELECT strftime(CAST(date_trunc('week', click_ts) AS DATE), '%Y-%m-%d')
         AS week_start,
       count(*) AS n_pairs,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS attributed_cents
FROM c JOIN p USING (user_id)
WHERE purchase_ts >= click_ts
  AND purchase_ts < click_ts + INTERVAL {ATTRIBUTION_DELAY_S} SECOND
GROUP BY 1
"""


QUERIES = {
    "tumbling_window_counts": tumbling_window_counts,
    "click_purchase_pairs_weekly": click_purchase_pairs_weekly,
}
ORACLES = {
    "tumbling_window_counts": TUMBLING_ORACLE,
    "click_purchase_pairs_weekly": CLICK_PURCHASE_ORACLE,
}
