from firefox_public_data_report_etl_spark.plans.registry import (
    ORACLES,
    QUERIES,
    SCALE_CLASS,
    SCALE_PATH_FOR,
)

__all__ = ["ORACLES", "QUERIES", "SCALE_CLASS", "SCALE_PATH_FOR"]
