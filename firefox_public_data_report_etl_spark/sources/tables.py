"""Source / sink layer (reference operators S1-S12).

The reference submits parameterized SQL to BigQuery and loads JSON
blobs back (hardware_report.py:59-84, user_activity.py:28-45); here the
table universe is partitioned parquet and every "parameterized scan"
is a DataFrame with literal filters, which Catalyst pushes into the
parquet reader (PushedFilters / partition pruning — verified in tests
via .explain).

Scale notes: loaders never infer schemas beyond the parquet footer,
reads stay columnar/vectorized, and timestamp normalization is a pure
column expression (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Testdata parquet stores these as TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they arrive as LongType ns since
# epoch. Converted to TimestampType micros (lossless: data has micro
# precision), matching DuckDB's naive read.
TIMESTAMP_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _ns(date_str: str) -> int:
    """Nanoseconds since epoch for a naive-UTC 'YYYY-MM-DD[ HH:MM:SS]'."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(date_str).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    prune: tuple[str, str | None, str | None] | None = None,
) -> DataFrame:
    """Scan operator (S1/S4): one parquet table, timestamps normalized.

    ``prune=(ts_col, lo, hi)`` applies a CONSERVATIVE [lo, hi) range
    filter on the raw nanos long BEFORE timestamp conversion, so it
    reaches the parquet scan as a row-group filter (the converted
    column is a derived expression Catalyst can't push). Queries still
    apply their exact predicate on the converted column; this is purely
    scan pruning — essential at 100 TB where the conversion otherwise
    forces a full scan.
    """
    # Harness-proofing: callers may pass a session built WITHOUT our
    # factory (session.py). Both confs are runtime-settable and
    # idempotent; without nanosAsLong any read of events.parquet
    # (TIMESTAMP(NANOS)) raises PARQUET_TYPE_ILLEGAL, and without UTC
    # the micros conversion drifts from the DuckDB oracle's naive read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    if prune is not None and dtypes.get(prune[0]) == "bigint":
        c, lo, hi = prune
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(_ns(lo)))
        if hi is not None:
            df = df.filter(F.col(c) < F.lit(_ns(hi)))
    for c in TIMESTAMP_COLUMNS.get(name, ()):
        if dtypes.get(c) == "bigint":
            # integer div, NOT / : float division of ~1e18 ns loses the
            # last microsecond to double rounding.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def date_spine(start_col, stop_col, step_days: int = 7):
    """Generated-sequence source (S12; reference annotations.py:35-45 uses
    ``UNNEST(GENERATE_DATE_ARRAY(...))``): returns an array column of
    dates to ``F.explode``. Runs JVM-side via ``sequence``."""
    return F.sequence(start_col, stop_col, F.expr(f"interval {step_days} days"))


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned sink with idempotent per-partition overwrite (S5/S6;
    reference hardware_report.py:458-465 writes ``table$YYYYMMDD`` with
    WRITE_TRUNCATE). ``partitionOverwriteMode=dynamic`` is set at
    runtime (harness-proof: works on sessions not built by our
    factory), so ``mode="overwrite"`` replaces only touched partitions."""
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
