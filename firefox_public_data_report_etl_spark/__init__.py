"""PySpark-native analytics engine with the query & data-processing
capabilities of mozilla/firefox-public-data-report-etl.

The reference (read-only at /root/reference) is a BigQuery-driven batch
ETL; this package re-expresses its query semantics as idiomatic PySpark
DataFrame programs (Catalyst-optimizable, zero row-at-a-time Python UDFs
in hot paths), plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
deployment needs.

Layout:
  session     - SparkSession factory tuned for scale (AQE, dyn overwrite)
  sources     - parquet loaders (nanos-timestamp handling), date spine,
                static/HTTP JSON edges
  functions   - column-expression library (weeks, bitfields, versions,
                portable hashes shared with the DuckDB oracle dialect)
  operators   - reusable dataflow operators (top-k, bucket-collapse,
                as-of join, fan-out, dedup, similarity, text, multimodal)
  plans       - end-to-end query DAGs bound to the testdata tables plus
                the reference pipelines (hardware_report, user_activity,
                annotations) over their native schemas
  streaming   - Structured Streaming twins of the batch windows
"""

from firefox_public_data_report_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
