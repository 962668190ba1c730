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
    week_start,
)
from firefox_public_data_report_etl_spark.operators import (
    explode_preserving_empty,
    with_total_group,
)
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


def channel_struct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 in its TRUE struct-nested form: a dotted filter on a nested
    struct column (the reference's ``environment.settings.channel =
    'release'`` predicate, …user_activity.sql:161-162), oracle-backed.

    The testdata has no struct columns, so the plan builds the
    reference's shape honestly: ``from_json`` parses props into a
    typed struct, a two-level ``environment.settings`` struct is
    assembled around it, and the filter + aggregate access fields ONLY
    through dotted struct paths — the Catalyst struct-field extraction
    operator, not JSON re-parsing. DuckDB twin computes the same values
    from the flat JSON, proving the struct path yields identical
    results.
    """
    ev = load_table(spark, sf_dir, "events")
    payload = F.from_json("props", "k BIGINT").alias("payload")
    k = F.col("payload.k")
    parsed = ev.select("user_id", "event_type", payload).select(
        "user_id",
        "event_type",
        F.struct(
            F.struct(
                k.alias("k"),
                F.when(k % 4 == 0, "release")
                .when(k % 4 == 1, "beta")
                .when(k % 4 == 2, "nightly")
                .otherwise("esr")
                .alias("channel"),
            ).alias("settings")
        ).alias("environment"),
    )
    release = parsed.filter(
        F.col("environment.settings.channel") == "release"
    )
    return release.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.sum("environment.settings.k").alias("sum_k"),
    )


CHANNEL_STRUCT_ORACLE = """
WITH parsed AS (
  SELECT user_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS users,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM parsed
WHERE k % 4 = 0
GROUP BY event_type
"""


def locale_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: distinct-user counts at the (week, country, locale) grain
    with the Worldwide rollup fan-out (reference
    …user_activity.sql:286-301 counts clients per (week, country,
    locale) including the UNNEST'd 'Worldwide' group).

    Testdata mapping: country := event_type (+ Worldwide fan-out via
    J2), locale := a 5-way categorical derived from props.k. The grain
    and the exact-distinct-at-finer-grain shape are the operator; the
    column sources are the sandbox analogs.

    Scale notes: one shuffle keyed (week, country, locale); the
    Worldwide rows are the skewed rollup group the reference also
    carries — AQE skew handling plus partial aggregation (distinct is
    a two-phase Expand here, fine at this grain count) keep it safe.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        week_start(F.col("ts")).alias("week_start"),
        F.col("event_type").alias("etype"),
        F.concat(
            F.lit("loc-"),
            (F.get_json_object("props", "$.k").cast("long") % 5).cast(
                "string"
            ),
        ).alias("locale"),
        "user_id",
    )
    fanned = with_total_group(base, "etype", "country")
    agg = fanned.groupBy("week_start", "country", "locale").agg(
        F.countDistinct("user_id").alias("distinct_users")
    )
    # X19 edge convention: dates string-formatted at export (also
    # disambiguates DATE vs TIMESTAMP across engines in the gate).
    return agg.select(
        F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
        "country",
        "locale",
        "distinct_users",
    )


LOCALE_DISTINCT_ORACLE = """
WITH base AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
         event_type AS etype,
         'loc-' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
                        AS VARCHAR) AS locale,
         user_id
  FROM events
),
fanned AS (
  SELECT week_start, u.country, locale, user_id
  FROM base, UNNEST([etype, 'Worldwide']) AS u(country)
)
SELECT strftime(week_start, '%Y-%m-%d') AS week_start, country, locale,
       count(DISTINCT user_id) AS distinct_users
FROM fanned
GROUP BY 1, 2, 3
"""


def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4 VARIANT — the schema-on-read
    sibling of `channel_struct_rollup`'s `from_json`-with-schema form:
    `parse_json` builds the binary variant once (no schema declared,
    shredding-eligible in a lakehouse table), `variant_get` extracts
    typed paths per consumer, `try_variant_get` degrades missing paths
    to NULL instead of failing, and `schema_of_variant` is asserted in
    the output so a payload drift breaks the value hash. Scale: the
    variant parse + path extraction stay JVM-side in the scan
    projection; the rollup is one shuffle on event_type.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "long").alias("k"),
        F.try_variant_get("v", "$.missing", "long").alias("m"),
        F.schema_of_variant(F.col("v")).alias("vschema"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("m").alias("n_missing_path"),
        F.count_distinct("vschema").alias("n_schemas"),
        F.min("vschema").alias("vschema_min"),
    )


VARIANT_PROPS_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(NULL AS BIGINT) AS m,
         'OBJECT<k: BIGINT>' AS vschema
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(count(m) AS BIGINT) AS n_missing_path,
       CAST(count(DISTINCT vschema) AS BIGINT) AS n_schemas,
       min(vschema) AS vschema_min
FROM v
GROUP BY event_type
"""


QUERIES = {
    "scalar_expr_showcase": scalar_expr_showcase,
    "variant_props_rollup": variant_props_rollup,
    "empty_preserving_unnest": empty_preserving_unnest,
    "channel_struct_rollup": channel_struct_rollup,
    "locale_distinct_counts": locale_distinct_counts,
}

ORACLES = {
    "scalar_expr_showcase": SCALAR_SHOWCASE_ORACLE,
    "variant_props_rollup": VARIANT_PROPS_ORACLE,
    "empty_preserving_unnest": EMPTY_PRESERVING_ORACLE,
    "channel_struct_rollup": CHANNEL_STRUCT_ORACLE,
    "locale_distinct_counts": LOCALE_DISTINCT_ORACLE,
}
