"""Session-window aggregation — the idiomatic Structured Streaming
form of sessionization (``F.session_window`` with a 30-minute gap),
usable on both batch and streaming inputs.

Cross-validated two ways in tests:
  - batch session_window totals equal the lag+cumsum sessionization
    (plans/windowsq.user_sessions) — two independent formulations;
  - the availableNow streaming run equals the batch run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GAP = "30 minutes"


def session_window_stats(
    events: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Per (user, session-window): event count and span micros."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    per_session = events.groupBy(
        F.session_window("ts", GAP).alias("w"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "span_us"
        ),
    )
    return per_session.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        "n_events",
        "span_us",
    )


def per_user_session_totals(sessions: DataFrame) -> DataFrame:
    """Rollup matching plans/windowsq.user_sessions' output columns."""
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("span_us").alias("active_us"),
        F.max("n_events").alias("max_session_events"),
    )
