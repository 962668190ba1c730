from firefox_public_data_report_etl_spark.plans.registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
