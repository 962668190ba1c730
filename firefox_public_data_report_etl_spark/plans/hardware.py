"""Hardware-report query shapes bound to the `part`/`events` tables.

The reference's hardware_report job (hardware_report.py) runs 11
independent GROUP BYs over one weekly slice packed into a single row
(A1), re-keys via mapping tables (A14), collapses sub-1% buckets into
"Other" (A15, with the two-phase os collapse), normalizes to ratios
(A16), and pivots wide for export (P2). Testdata bindings:

  part (p_type x p_brand x p_size) ↔ the hardware dimension columns
  events (week x event_type)       ↔ the weekly pivot export
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.functions import cents, week_start
from firefox_public_data_report_etl_spark.operators import collapse_buckets
from firefox_public_data_report_etl_spark.sources import load_table


def hardware_dims_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a single-pass GROUPING SETS aggregate.

    The reference issues 11 per-dimension GROUP BYs inside one SQL text
    (hardware_report.py:34-39); the faithful single-scan Spark plan is
    GROUPING SETS — one scan, one Expand, one aggregate. At 100 TB
    this reads the fact table once instead of N times (the alternative
    — N groupBys over a cached slice — trades memory for the Expand's
    row multiplication; grouping-sets wins when the scan dominates).
    """
    part = load_table(spark, sf_dir, "part")
    g = part.groupingSets(
        [[F.col("p_brand")], [F.col("p_type")], [F.col("p_size")]],
        F.col("p_brand"),
        F.col("p_type"),
        F.col("p_size"),
    ).agg(
        F.count("*").alias("client_count"),
        # grouping() is only valid inside the grouping-sets aggregate.
        F.when(F.grouping("p_brand") == 0, F.lit("brand"))
        .when(F.grouping("p_type") == 0, F.lit("type"))
        .otherwise(F.lit("size"))
        .alias("dim"),
    )
    return g.select(
        "dim",
        F.coalesce(
            F.col("p_brand"), F.col("p_type"), F.col("p_size").cast("string")
        ).alias("val"),
        "client_count",
    )


HARDWARE_DIMS_ORACLE = """
SELECT CASE WHEN GROUPING(p_brand) = 0 THEN 'brand'
            WHEN GROUPING(p_type) = 0 THEN 'type'
            ELSE 'size' END AS dim,
       coalesce(p_brand, p_type, CAST(p_size AS VARCHAR)) AS val,
       count(*) AS client_count
FROM part
GROUP BY GROUPING SETS ((p_brand), (p_type), (p_size))
"""


def bucket_collapse_ptype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/A16: the two-phase threshold collapse on a long-tail key.

    Key = ``p_type-p_brand`` (150 combos, most under the 1% threshold)
    → phase 1 folds small combos to ``<p_type>-Other``, phase 2 folds
    still-small families to ``Other`` — exactly the reference os
    collapse (hardware_report.py:295-315) with exact-integer threshold
    comparison (see operators.collapse).
    """
    part = load_table(spark, sf_dir, "part")
    counts = (
        part.withColumn(
            "p_key", F.concat_ws("-", F.col("p_type"), F.col("p_brand"))
        )
        .groupBy("p_key")
        .agg(F.count("*").alias("client_count"))
    )
    out = collapse_buckets(
        counts,
        scope_cols=[],
        key_col="p_key",
        count_col="client_count",
        threshold=(1, 100),
        family_split="-",
    )
    return out.select("p_key", "client_count", "ratio")


BUCKET_COLLAPSE_ORACLE = """
WITH counts AS (
  SELECT p_type || '-' || p_brand AS p_key, count(*) AS cnt
  FROM part GROUP BY 1
), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
p1 AS (
  SELECT CASE WHEN cnt < (total * 1) // 100
              THEN split_part(p_key, '-', 1) || '-Other' ELSE p_key END AS p_key,
         cnt
  FROM counts, tot
), p1a AS (SELECT p_key, CAST(sum(cnt) AS BIGINT) AS cnt FROM p1 GROUP BY p_key),
p2 AS (
  SELECT CASE WHEN cnt < (total * 1) // 100 THEN 'Other' ELSE p_key END AS p_key, cnt
  FROM p1a, tot
), fin AS (SELECT p_key, CAST(sum(cnt) AS BIGINT) AS client_count FROM p2 GROUP BY p_key)
SELECT p_key, client_count,
       CAST(client_count AS DOUBLE) / (SELECT total FROM tot) AS ratio
FROM fin
"""


# shared with the data-quality audit — see contracts.py docstring
from firefox_public_data_report_etl_spark.contracts import EVENT_TYPES  # noqa: E402


def pivot_weekly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 wide pivot (flatten_aggregates, hardware_report.py:327-350):
    long (week, event_type, cents) → one row per week with a
    ``<type>_cents`` column per event type.

    ``pivot`` with the explicit value list skips the extra distinct-
    values job and keeps the plan a single aggregate."""
    ev = load_table(spark, sf_dir, "events")
    long = ev.select(
        F.date_format(week_start(F.col("ts")), "yyyy-MM-dd").alias("week_start"),
        "event_type",
        cents(F.col("value")).alias("cents"),
    )
    wide = (
        long.groupBy("week_start")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum("cents"))
    )
    return wide.select(
        "week_start",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_cents") for t in EVENT_TYPES],
    )


PIVOT_WEEKLY_ORACLE = """
SELECT strftime(CAST(date_trunc('week', ts) AS DATE), '%Y-%m-%d') AS week_start,
       CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type='click'), 0) AS BIGINT) AS click_cents,
       CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type='error'), 0) AS BIGINT) AS error_cents,
       CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type='purchase'), 0) AS BIGINT) AS purchase_cents,
       CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type='signup'), 0) AS BIGINT) AS signup_cents,
       CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type='view'), 0) AS BIGINT) AS view_cents
FROM events
GROUP BY 1
"""

# 12-pattern NOT LIKE blocklist (F10 analog of the addon blocklist,
# …user_activity.sql:208-219) over p_name adjective-noun values.
BLOCKLIST_PATTERNS = (
    "%red%",
    "%small%",
    "%mini%",
    "%anti%",
    "%proto%",
    "%test%",
    "%shield%",
    "%pilot%",
    "%corp%",
    "%tiny%",
    "%demo%",
    "%beta%",
)


def part_blocklist_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11: conditional DISTINCT count under a NOT-LIKE blocklist,
    and its ratio against the unconditional distinct count."""
    part = load_table(spark, sf_dir, "part")
    ok = F.lit(True)
    for p in BLOCKLIST_PATTERNS:
        ok = ok & ~F.col("p_name").like(p)
    g = part.groupBy("p_brand").agg(
        F.countDistinct(F.when(ok, F.col("p_partkey"))).alias("ok_parts"),
        F.countDistinct("p_partkey").alias("all_parts"),
    )
    return g.select(
        "p_brand",
        "ok_parts",
        "all_parts",
        (F.col("ok_parts").cast("double") / F.col("all_parts")).alias("ok_ratio"),
    )


_BLOCK_PRED = " AND ".join(f"p_name NOT LIKE '{p}'" for p in BLOCKLIST_PATTERNS)

PART_BLOCKLIST_ORACLE = f"""
SELECT p_brand,
       count(DISTINCT CASE WHEN {_BLOCK_PRED} THEN p_partkey END) AS ok_parts,
       count(DISTINCT p_partkey) AS all_parts,
       CAST(count(DISTINCT CASE WHEN {_BLOCK_PRED} THEN p_partkey END) AS DOUBLE)
         / count(DISTINCT p_partkey) AS ok_ratio
FROM part
GROUP BY p_brand
"""


# X21 analog of the reference's static (vendor_id, device_id) → model
# map (hardware_report.py:148-166 joins the broadcast device table and
# defaults misses to 'Other'): a composite-key literal dimension over
# (brand, type-class).
MODEL_MAP = (
    ("Brand#11", "ECONOMY", "Economy 11"),
    ("Brand#12", "STANDARD", "Standard 12"),
    ("Brand#13", "PROMO", "Promo 13"),
    ("Brand#21", "ECONOMY", "Economy 21"),
    ("Brand#22", "MEDIUM", "Medium 22"),
    ("Brand#31", "LARGE", "Large 31"),
    ("Brand#41", "SMALL", "Small 41"),
    ("Brand#51", "STANDARD", "Standard 51"),
)


def part_model_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: composite-key broadcast lookup join with an 'Other'
    default — the (vendor, device) → model shape. The lookup is a
    literal in-memory dimension (like the reference's packaged device
    map), broadcast so the fact side never shuffles; unmatched rows
    coalesce to 'Other' (left join, X3).

    Scale: broadcast stays constant-size however big `part` grows;
    the only shuffle is the final model-grain aggregate.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.split(F.col("p_type"), " ").getItem(0).alias("tclass"),
    )
    lookup = spark.createDataFrame(
        list(MODEL_MAP), ["b", "t", "model"]
    )
    joined = part.join(
        F.broadcast(lookup),
        (part.p_brand == lookup.b) & (part.tclass == lookup.t),
        "left",
    )
    return (
        joined.withColumn("model", F.coalesce(F.col("model"), F.lit("Other")))
        .groupBy("model")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


_MODEL_VALUES = ", ".join(f"('{b}', '{t}', '{m}')" for b, t, m in MODEL_MAP)

PART_MODEL_LOOKUP_ORACLE = f"""
WITH lookup(b, t, model) AS (VALUES {_MODEL_VALUES}),
part_c AS (
  SELECT p_partkey, p_brand, split_part(p_type, ' ', 1) AS tclass FROM part
)
SELECT coalesce(model, 'Other') AS model,
       count(*) AS n_parts,
       count(DISTINCT p_brand) AS n_brands
FROM part_c LEFT JOIN lookup ON p_brand = b AND tclass = t
GROUP BY 1
"""


QUERIES = {
    "hardware_dims_grouping_sets": hardware_dims_grouping_sets,
    "bucket_collapse_ptype": bucket_collapse_ptype,
    "pivot_weekly_events": pivot_weekly_events,
    "part_model_lookup": part_model_lookup,
}

ORACLES = {
    "hardware_dims_grouping_sets": HARDWARE_DIMS_ORACLE,
    "bucket_collapse_ptype": BUCKET_COLLAPSE_ORACLE,
    "pivot_weekly_events": PIVOT_WEEKLY_ORACLE,
    "part_model_lookup": PART_MODEL_LOOKUP_ORACLE,
}
