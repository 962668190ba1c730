"""Scalar-function and unnest-semantics showcase queries.

Covers the reference scalar surface not already exercised by the
activity/hardware DAGs: date arithmetic with column intervals (X5),
day-of-week (X2/F6), deterministic sampling (F5), the bitfield UDF
replacements (X8/X9), and the empty-preserving lateral unnest (J3 —
SURVEY.md §7.4 hazard: plain ``explode`` silently drops empty arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.functions import (
    bitcount_lowest_7,
    is_last_day_of_week,
    pos_of_trailing_set_bit,
)
from firefox_public_data_report_etl_spark.operators import explode_preserving_empty
from firefox_public_data_report_etl_spark.sources import load_table

# Knuth multiplicative hash → synthetic 28-bit activity bitfield, the
# clients_last_seen days_seen_bits analog (FIXTURES.md §2).
_BITS = "CAST((user_id * 2654435761) % 268435456 AS BIGINT)"


def scalar_expr_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5/X8/X9/F5/F6 + F12 + JSON extraction in one aggregate over
    events.

    - sample filter ``user_id % 100 < 50`` (F5 — hash-bucket column
      sampling, NOT df.sample),
    - ``d - (user_id % 7) days`` column-interval date arithmetic (X5),
    - synthetic 28-bit bitfield → days-active-this-week popcount (X8)
      and days-since-last-seen trailing-bit position (X9),
    - Sunday flag (X2/F6),
    - JSON path extraction from props (get_json_object, JVM-side) with
      an F12 nested-field FILTER: the high-k branch filters on the
      extracted field BEFORE its aggregate (the reference's
      build.channel predicate shape, annotations_pipeline.py), then
      left-joins back so types with no high-k rows keep a 0.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 < 50)
    bits = F.expr(_BITS)
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        bits.alias("bits"),
        F.date_sub(F.to_date("ts"), (F.col("user_id") % 7).cast("int")).alias(
            "shifted"
        ),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    main = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(bitcount_lowest_7(F.col("bits")).cast("long")).alias(
            "sum_days_active"
        ),
        F.sum(pos_of_trailing_set_bit(F.col("bits")).cast("long")).alias(
            "sum_days_since"
        ),
        F.count(F.when(is_last_day_of_week(F.col("d")), True)).alias("n_sunday"),
        F.countDistinct("shifted").alias("n_shifted_days"),
        F.sum("k").alias("sum_k"),
    )
    high = (
        base.filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_high"))
    )
    return main.join(high, "event_type", "left").withColumn(
        "n_high", F.coalesce(F.col("n_high"), F.lit(0))
    )


SCALAR_SHOWCASE_ORACLE = f"""
WITH base AS (
  SELECT event_type,
         CAST(ts AS DATE) AS d,
         {_BITS} AS bits,
         CAST(ts AS DATE) - to_days(CAST(user_id % 7 AS INTEGER)) AS shifted,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events WHERE user_id % 100 < 50
),
main AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(bit_count(bits & 127) AS BIGINT)) AS BIGINT) AS sum_days_active,
         CAST(sum(CASE WHEN bits <> 0
                       THEN CAST(bit_count((bits & -bits) - 1) AS BIGINT) END) AS BIGINT)
           AS sum_days_since,
         count(*) FILTER (WHERE dayofweek(d) = 0) AS n_sunday,
         count(DISTINCT shifted) AS n_shifted_days,
         CAST(sum(k) AS BIGINT) AS sum_k
  FROM base
  GROUP BY event_type
),
high AS (
  SELECT event_type, count(*) AS n_high FROM base WHERE k > 50 GROUP BY event_type
)
SELECT main.*, CAST(coalesce(n_high, 0) AS BIGINT) AS n_high
FROM main LEFT JOIN high USING (event_type)
"""


def empty_preserving_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: per-order item arrays where empty arrays must still yield a
    row (reference …user_activity.sql:59-67 keeps zero-addon clients in
    COUNT DISTINCT denominators).

    Orders collect their qualifying (l_quantity > 45) lineitems into an
    array; ``explode_preserving_empty`` emits one NULL-item row for
    orders with none, so the per-priority denominators count every
    order — the exact hazard plain ``explode`` gets wrong.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    items = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(F.collect_list("l_linenumber").alias("items"))
    )
    arr = orders.join(items, orders.o_orderkey == items.l_orderkey, "left")
    exploded = explode_preserving_empty(arr, F.col("items"), "item")
    return exploded.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("item").isNull(), True)).alias("empty_orders"),
        F.countDistinct("o_orderkey").alias("orders"),
    )


EMPTY_PRESERVING_ORACLE = """
WITH q AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45)
SELECT o_orderpriority,
       count(*) AS n_rows,
       count(*) FILTER (WHERE q.l_orderkey IS NULL) AS empty_orders,
       count(DISTINCT o.o_orderkey) AS orders
FROM orders o LEFT JOIN q ON o.o_orderkey = q.l_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "scalar_expr_showcase": scalar_expr_showcase,
    "empty_preserving_unnest": empty_preserving_unnest,
}

ORACLES = {
    "scalar_expr_showcase": SCALAR_SHOWCASE_ORACLE,
    "empty_preserving_unnest": EMPTY_PRESERVING_ORACLE,
}
