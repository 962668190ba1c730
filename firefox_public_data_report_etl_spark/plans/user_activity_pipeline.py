"""The user_activity flagship query (reference
scripts/public_data_report_user_activity.sql, 361 LoC / 26 CTEs) as a
Spark DataFrame DAG over its NATIVE schema (FIXTURES.md §2
clients_last_seen + country_names + buildhub2), at full fidelity:
bitfield UDF replacements, empty-preserving addon unnest, the 12-entry
addon blocklist, per-group top-K arrays, and the armagaddon week
exclusion.

CTE → Spark mapping (SURVEY.md §2 ids in parens):
  sample (:8-46)            fan-out to country+'Worldwide' (J2),
                            broadcast country-name join (J1), allowlist
                            + date/sample/outlier filters (F2-F5)
  sample_addons (:47-70)    empty-preserving unnest (J3)
  mau_wau (:71-84)          conditional COUNT DISTINCT (A3)
  daily_usage (:85-112)     two-level AVG with HAVING (A4/F8)
  intensity (:113-126)      bitcount_lowest_7 ratio-of-sums (A5/X8)
  new_profile_rate(:127-140) trailing-set-bit conditional ratio (A6/X9)
  latest releases (:141-197) as-of range join + max (J5/A7/A8/X7)
  addon/locale branches (:198-325) blocklisted distinct counts
                            (A10-A12/F10), ratio joins (J6/J7),
                            ARRAY_AGG top-K (A13)
  final join (:326-361)     8-way composite-key join (J8) + NOT IN (F9)

Scale notes: `sample` is cached before the 8-branch fan-out (Spark
re-inlines CTEs); countries and latest_releases broadcast; every other
shuffle keys on (week_start, country_name) so AQE can coalesce and the
branches co-partition.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.functions import (
    bitcount_lowest_7,
    is_last_day_of_week,
    major_version,
    pos_of_trailing_set_bit,
    safe_div,
    week_start,
)
from firefox_public_data_report_etl_spark.operators import (
    explode_preserving_empty,
    top_k_array,
    with_total_group,
)

# …user_activity.sql:30-41
COUNTRY_ALLOWLIST = (
    "Worldwide",
    "Brazil",
    "China",
    "France",
    "Germany",
    "India",
    "Indonesia",
    "Italy",
    "Poland",
    "Russia",
    "United States",
)

# …user_activity.sql:208-219 (the duplicate @testpilot-addon entry in
# the reference is collapsed; LIKE is idempotent).
ADDON_BLOCKLIST = (
    "%@mozilla%",
    "%@shield.mozilla%",
    "%@unified-urlbar-shield-study-%",
    "%@testpilot-addon%",
    "%@activity-streams%",
    "%support@laserlike.com%",
    "%testpilot@cliqz.com%",
    "%@testpilot-containers%",
    "%@sloth%",
    "%@min-vid%",
    "%jid1-NeEaf3sAHdKHPA@jetpack%",
)

# …user_activity.sql:359-360
ARMAGADDON_WEEKS = (date(2019, 4, 29), date(2019, 5, 6))

DATE_FROM = "2018-12-31"
DATE_TO = "2020-06-29"


def sample_cte(
    clients: DataFrame,
    countries: DataFrame,
    date_from: str = DATE_FROM,
    date_to: str = DATE_TO,
) -> DataFrame:
    """The `sample` CTE: country fan-out, name join, all base filters."""
    fanned = with_total_group(clients, "country", "country_group")
    joined = fanned.join(
        F.broadcast(countries),
        fanned.country_group == countries.code,
        "left",
    )
    named = joined.withColumn(
        "country_name", F.coalesce(F.col("name"), F.col("country_group"))
    )
    return named.filter(
        F.col("country_name").isin(list(COUNTRY_ALLOWLIST))
        & (F.col("submission_date") >= F.lit(date_from))
        & (F.col("submission_date") < F.lit(date_to))
        & (F.col("subsession_hours_sum") < 24)
        & (F.col("sample_id") == 1)
    ).select(
        "submission_date",
        week_start(F.col("submission_date")).alias("week_start"),
        is_last_day_of_week(F.col("submission_date")).alias("is_last_day_of_week"),
        "days_since_seen",
        "country_name",
        "subsession_hours_sum",
        "days_seen_bits",
        "days_created_profile_bits",
        "client_id",
        "app_version",
        "locale",
        "active_addons",
    )


def sample_addons_cte(sample: DataFrame) -> DataFrame:
    """The empty-preserving lateral unnest (J3): clients with zero
    addons keep one NULL-addon row so they stay in COUNT DISTINCT
    denominators."""
    weekly = sample.filter(
        (F.col("days_since_seen") < 7) & F.col("is_last_day_of_week")
    )
    exploded = explode_preserving_empty(weekly, F.col("active_addons"), "addons")
    return exploded.select(
        "week_start",
        "country_name",
        "client_id",
        "locale",
        F.col("addons.is_system").alias("is_system"),
        F.col("addons.foreign_install").alias("foreign_install"),
        F.col("addons.addon_id").alias("addon_id"),
        F.col("addons.name").alias("addon_name"),
    )


def _blocklist_ok() -> F.Column:
    ok = (F.col("is_system") == False) & (F.col("foreign_install") == False)  # noqa: E712
    for p in ADDON_BLOCKLIST:
        ok = ok & ~F.col("addon_id").like(p)
    return ok


def user_activity_weekly(
    clients: DataFrame,
    countries: DataFrame,
    buildhub: DataFrame,
    date_from: str = DATE_FROM,
    date_to: str = DATE_TO,
) -> DataFrame:
    """The full 26-CTE DAG → one weekly metrics row per (week,
    country): schema identical to the reference output table
    (FIXTURES.md §6)."""
    sample = sample_cte(clients, countries, date_from, date_to).cache()
    last_day = sample.filter(F.col("is_last_day_of_week"))

    mau_wau = last_day.groupBy("week_start", "country_name").agg(
        F.countDistinct(
            F.when(F.col("days_since_seen") < 28, F.col("client_id"))
        ).alias("mau"),
        F.countDistinct(
            F.when(F.col("days_since_seen") < 7, F.col("client_id"))
        ).alias("wau"),
    )

    by_user = (
        sample.filter(F.col("days_since_seen") == 0)
        .groupBy("client_id", "country_name", "week_start")
        .agg(F.avg("subsession_hours_sum").alias("avg_hours_usage_daily_per_user"))
        .filter(F.col("avg_hours_usage_daily_per_user") < 24)
    )
    daily_usage = by_user.groupBy("country_name", "week_start").agg(
        F.avg("avg_hours_usage_daily_per_user").alias("avg_hours_usage_daily")
    )

    intensity = (
        last_day.filter(F.col("days_since_seen") < 7)
        .groupBy("week_start", "country_name")
        .agg(
            safe_div(
                F.sum(bitcount_lowest_7(F.col("days_seen_bits"))),
                F.count("*"),
            ).alias("intensity")
        )
    )

    new_profile_rate = last_day.groupBy("week_start", "country_name").agg(
        safe_div(
            F.count(
                F.when(
                    pos_of_trailing_set_bit(F.col("days_created_profile_bits")) < 7,
                    True,
                )
            ),
            F.count(
                F.when(
                    pos_of_trailing_set_bit(F.col("days_seen_bits")) < 7, True
                )
            ),
        ).alias("new_profile_rate")
    )

    active_weekly = last_day.filter(F.col("days_since_seen") < 7).select(
        "country_name",
        "client_id",
        major_version(F.col("app_version")).alias("major_version"),
        F.date_sub(
            F.col("submission_date"), F.col("days_since_seen").cast("int")
        ).alias("last_day_seen"),
        "week_start",
    )
    latest_releases = (
        buildhub.filter(
            (F.col("build.target.channel") == "release")
            & (F.to_date("build.build.date") >= F.lit("2018-12-01"))
        )
        .groupBy(F.to_date("build.build.date").alias("day"))
        .agg(
            F.max(major_version(F.col("build.target.version"))).alias(
                "latest_major_version"
            )
        )
    )
    with_latest = (
        active_weekly.filter(F.col("client_id").isNotNull())
        .join(
            F.broadcast(latest_releases),
            F.col("day") <= F.col("last_day_seen"),
        )
        .groupBy("client_id", "country_name", "major_version", "week_start")
        .agg(F.max("latest_major_version").alias("latest_major_version"))
    )
    latest_version_ratio = with_latest.groupBy("country_name", "week_start").agg(
        safe_div(
            F.count(
                F.when(
                    F.col("major_version") == F.col("latest_major_version"), True
                )
            ),
            F.count("*"),
        ).alias("latest_version_ratio")
    )

    sample_addons = sample_addons_cte(sample).cache()
    addon_counts = sample_addons.groupBy(
        "week_start", "country_name", "addon_id", "addon_name"
    ).agg(
        F.countDistinct(F.when(_blocklist_ok(), F.col("client_id"))).alias(
            "user_count"
        )
    )
    addon_ratios = addon_counts.join(
        mau_wau, ["week_start", "country_name"]
    ).select(
        "week_start",
        "country_name",
        "addon_name",
        (F.col("user_count") / F.col("wau")).alias("ratio"),
    )
    top_addons = top_k_array(
        addon_ratios,
        ["week_start", "country_name"],
        F.col("ratio"),
        F.struct(F.col("addon_name"), F.col("ratio")),
        k=10,
        out_col="top_addons",
    )

    has_addon = sample_addons.groupBy("week_start", "country_name").agg(
        (
            F.countDistinct(F.when(_blocklist_ok(), F.col("client_id")))
            / F.countDistinct("client_id")
        ).alias("has_addon_ratio")
    )

    locale_counts = (
        last_day.filter(F.col("days_since_seen") < 7)
        .groupBy("week_start", "country_name", "locale")
        .agg(F.countDistinct("client_id").alias("user_count"))
    )
    locale_ratios = locale_counts.join(
        mau_wau, ["week_start", "country_name"]
    ).select(
        "week_start",
        "country_name",
        "locale",
        (F.col("user_count") / F.col("wau")).alias("ratio"),
    )
    top_locales = top_k_array(
        locale_ratios,
        ["week_start", "country_name"],
        F.col("ratio"),
        F.struct(F.col("locale"), F.col("ratio")),
        k=5,
        out_col="top_locales",
    )

    keys = ["week_start", "country_name"]
    out = (
        mau_wau.join(daily_usage, keys)
        .join(intensity, keys)
        .join(new_profile_rate, keys)
        .join(latest_version_ratio, keys)
        .join(top_addons, keys)
        .join(top_locales, keys)
        .join(has_addon, keys)
        .filter(~F.col("week_start").isin(list(ARMAGADDON_WEEKS)))
    )
    return out.select(
        F.col("week_start").alias("submission_date"),
        "country_name",
        "mau",
        "avg_hours_usage_daily",
        "intensity",
        "new_profile_rate",
        "latest_version_ratio",
        "top_addons",
        "has_addon_ratio",
        "top_locales",
    )
