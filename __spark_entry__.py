"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship user-activity query (the reference's
26-CTE analytics SQL re-expressed Spark-first; see
firefox_public_data_report_etl_spark/plans/activity.py) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

try:  # installed package (pip install -e .) wins; fall back to the
    import firefox_public_data_report_etl_spark  # noqa: F401
except ImportError:  # repo-relative layout the round driver uses
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from firefox_public_data_report_etl_spark.plans import QUERIES

    return QUERIES["user_activity_flagship"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from firefox_public_data_report_etl_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from firefox_public_data_report_etl_spark.plans import ORACLES

    return dict(ORACLES)
