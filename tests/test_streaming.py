"""Structured Streaming: the batch tumbling-window aggregation must
produce identical results when run incrementally through readStream
(availableNow trigger, memory sink)."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.sources import load_table
from firefox_public_data_report_etl_spark.streaming import (
    stream_events,
    tumbling_event_value,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    batch = tumbling_event_value(load_table(spark, sf_dir, "events"))
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in batch.collect()
    }

    stream = tumbling_event_value(
        stream_events(spark, sf_dir), watermark="1 hour"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got == expected


def test_streaming_is_incremental(spark, sf_dir, tmp_path):
    """The stream plan must actually be a streaming plan."""
    s = stream_events(spark, sf_dir)
    assert s.isStreaming
    agg = tumbling_event_value(s, watermark="1 hour")
    assert agg.isStreaming
