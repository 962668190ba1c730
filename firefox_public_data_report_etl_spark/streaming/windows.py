"""Structured Streaming twins of the batch windows.

The reference has no streaming (SURVEY.md §2.9) — its incrementality
is weekly-batch partition overwrite. The engine adds the Spark-native
incremental form: the SAME window aggregation function serves batch
DataFrames and ``readStream`` sources, so batch backfill and streaming
tail share one definition (the lambda-architecture collapse Structured
Streaming is for).

Scale notes: tumbling windows + watermark bound state; the aggregation
is partial map-side before the state-store shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.functions import cents


def tumbling_event_value(
    events: DataFrame, window: str = "6 hours", watermark: str | None = None
) -> DataFrame:
    """Tumbling-window per-type counts and exact-cents sums.

    Works on both batch and streaming inputs; pass ``watermark`` (e.g.
    '1 hour') for streaming so late data past the bound is dropped and
    window state is reclaimed.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


def hopping_event_value(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Hopping-window twin of the batch ``hopping_event_counts``
    plan: the SAME sliding F.window aggregation serves batch and
    streaming inputs. State per key is window/slide overlapping
    panes; the watermark reclaims panes older than the bound."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.window("ts", window, slide).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from a
    batch read; the ts column normalized exactly like the batch loader
    — NTZ cast or legacy-nanos conversion — so watermarks and windows
    always see plain TIMESTAMP)."""
    from firefox_public_data_report_etl_spark.sources import (
        load_table,
        normalize_timestamps,
    )

    # load_table harness-proofs the session (nanosAsLong + UTC) and is
    # the schema source of truth; we only need its raw footer schema.
    load_table(spark, sf_dir, "events")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The file source requires a directory; glob-filter the events
    # table out of the shared sf_dir.
    raw = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_timestamps(raw, "events")
