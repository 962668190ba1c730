"""applyInPandasWithState: the custom stateful operator's streaming
result must equal the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.sources import load_table
from firefox_public_data_report_etl_spark.streaming import stream_events
from firefox_public_data_report_etl_spark.streaming.stateful import (
    running_user_totals,
)


def test_stateful_totals_match_batch(spark, sf_dir, tmp_path):
    expected = {
        r["user_id"]: (r["n"], r["c"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }

    out = running_user_totals(stream_events(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one row per (user, batch); the last row per
    # user is the lifetime total
    rows = spark.sql("SELECT * FROM stateful_test").collect()
    got = {}
    for r in rows:  # memory sink preserves batch order
        got[r["user_id"]] = (r["n_events"], r["sum_cents"])
    assert got == expected


def test_tws_totals_match_classic_api(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 API) must produce the same
    lifetime totals as the applyInPandasWithState operator and the
    batch aggregation. Skipped where the TWS python worker's protobuf
    dependency is absent (this container) — the operator gates on
    tws_available() for exactly that reason."""
    import pytest

    from firefox_public_data_report_etl_spark.streaming.tws import (
        running_user_totals_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf unavailable: TWS worker cannot start")

    expected = {
        r["user_id"]: (r["n"], r["c"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }

    out = running_user_totals_tws(stream_events(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM tws_test").collect()
    got = {}
    for r in rows:  # memory sink preserves batch order; last write wins
        got[r["user_id"]] = (r["n_events"], r["sum_cents"])
    assert got == expected
