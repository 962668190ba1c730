"""Streaming transition counter: summed per-batch deltas must equal
the batch Markov matrix counts, INCLUDING transitions that straddle
micro-batch boundaries (the carried last-event state)."""

from __future__ import annotations

import pytest

# Streaming wiring e2e: full profile.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.sources import load_table


@pytest.mark.full
def test_streaming_transitions_match_batch(spark, sf_dir, tmp_path):
    from firefox_public_data_report_etl_spark.plans.windowsq import (
        event_transition_matrix,
    )
    from firefox_public_data_report_etl_spark.streaming.transitions import (
        streaming_transition_counts,
    )

    expected = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    assert expected

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = sorted(r[0] for r in ev.select(F.unix_micros("ts")).collect())
    c1, c2 = us[len(us) // 3], us[2 * len(us) // 3]
    waves = [
        ev.filter(F.unix_micros("ts") <= c1),
        ev.filter(
            (F.unix_micros("ts") > c1) & (F.unix_micros("ts") <= c2)
        ),
        ev.filter(F.unix_micros("ts") > c2),
    ]
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    # waves land as separate files with increasing mtimes; the file
    # source replays oldest-first and maxFilesPerTrigger=1 forces one
    # micro-batch per wave — boundary transitions must cross batches
    for w in waves:
        w.coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(waves[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_transition_counts(stream)
        .writeStream.format("memory")
        .queryName("trans_stream")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got: dict[tuple[str, str], int] = {}
    for r in spark.sql("SELECT * FROM trans_stream").collect():
        k = (r.from_type, r.to_type)
        got[k] = got.get(k, 0) + r.n

    # time-tertile waves guarantee per-user arrival order across
    # batches (the operator's documented ordering contract), so the
    # summed deltas must reproduce the batch matrix exactly —
    # boundary-straddling transitions included
    assert got == expected
