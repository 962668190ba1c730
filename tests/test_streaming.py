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


def test_stream_upsert_latest_wins(spark, tmp_path):
    """Two waves of document revisions through the foreachBatch MERGE
    sink: the target must hold exactly the latest revision per key
    after each wave, and a restart (same checkpoint) must not
    double-apply."""
    from firefox_public_data_report_etl_spark.streaming import stream_upsert

    src_dir = tmp_path / "src"
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, rev long, text string"

    def run_wave(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src_dir))
        stream = spark.readStream.schema(schema).parquet(str(src_dir))
        q = stream_upsert(stream, target, ckpt, ["doc_id"], order_col="rev")
        q.awaitTermination(120)

    run_wave([(1, 1, "one.v1"), (2, 1, "two.v1"), (2, 2, "two.v2")])
    got = {
        r["doc_id"]: (r["rev"], r["text"])
        for r in spark.read.parquet(target).collect()
    }
    # in-batch revisions collapse to the latest before merging
    assert got == {1: (1, "one.v1"), 2: (2, "two.v2")}

    run_wave([(2, 3, "two.v3"), (3, 1, "three.v1")])
    got = {
        r["doc_id"]: (r["rev"], r["text"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: (1, "one.v1"), 2: (3, "two.v3"), 3: (1, "three.v1")}
