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


QUERIES = {"tumbling_window_counts": tumbling_window_counts}
ORACLES = {"tumbling_window_counts": TUMBLING_ORACLE}
