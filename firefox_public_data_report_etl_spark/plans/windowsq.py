"""Window-function query shapes.

The reference itself needs no window frames (SURVEY.md §2.9) — these
complete the engine's surface for the operations any analytics user of
the reference would reach for next: sessionization (lag + cumulative
boundary counts) and running totals (ordered frame aggregation). Both
are exactly-deterministic (integer micros / exact cents), so they get
full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from firefox_public_data_report_etl_spark.functions import cents, week_start
from firefox_public_data_report_etl_spark.sources import load_table

SESSION_GAP_MIN = 30


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts when the gap to the user's
    previous event exceeds 30 minutes. Per user: session count, event
    count, and total active micros summed within sessions.

    Scale: one shuffle on user_id for the lag/cum-sum windows, then a
    per-user aggregate on the already-partitioned stream (no second
    shuffle — the window and the groupBy share partitioning).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("span_us").alias("active_us"),
        F.max("n_events").alias("max_session_events"),
    )


USER_SESSIONS_ORACLE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {SESSION_GAP_MIN * 60 * 1000000}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(us) - min(us) AS span_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(span_us) AS BIGINT) AS active_us,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
"""


def running_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals: weekly order revenue per priority with a
    cumulative sum over an ordered unbounded-preceding frame."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        week_start(F.col("o_orderdate")).alias("w"),
        cents(F.col("o_totalprice")).alias("c"),
    )
    weekly = orders.groupBy("o_orderpriority", "w").agg(
        F.sum("c").alias("week_cents")
    )
    cum = Window.partitionBy("o_orderpriority").orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return weekly.select(
        "o_orderpriority",
        F.date_format("w", "yyyy-MM-dd").alias("week_start"),
        "week_cents",
        F.sum("week_cents").over(cum).alias("cum_cents"),
    )


RUNNING_REVENUE_ORACLE = """
WITH weekly AS (
  SELECT o_orderpriority,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS w,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS week_cents
  FROM orders GROUP BY o_orderpriority, w
)
SELECT o_orderpriority,
       strftime(w, '%Y-%m-%d') AS week_start,
       week_cents,
       CAST(sum(week_cents) OVER (PARTITION BY o_orderpriority ORDER BY w
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM weekly
"""


QUERIES = {
    "user_sessions": user_sessions,
    "running_weekly_revenue": running_weekly_revenue,
}

ORACLES = {
    "user_sessions": USER_SESSIONS_ORACLE,
    "running_weekly_revenue": RUNNING_REVENUE_ORACLE,
}
