"""Streaming point-in-time enrichment (round 9, r8 verdict #6):
three time-ordered waves of purchases stream through the gate while
the SCD2 dim-events path is refreshed BETWEEN triggers (the
mid-stream dim update crossing a trigger boundary), and the landed
rows must equal the batch twin over (all purchases, final dim) —
plus exactly-once replay of the last epoch."""

from __future__ import annotations

import pytest

# Streaming wiring e2e: full profile.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.sources import load_table
from firefox_public_data_report_etl_spark.streaming.pitenrich import (
    pit_enrich_rows,
    pit_gate_batch,
    stream_pit_enrich,
)

KEY = ("event_id", "user_id", "us", "state", "week_start", "rev_c")


def _rows(df):
    return {r["event_id"]: tuple(r[k] for k in KEY) for r in df.collect()}


@pytest.mark.full
def test_stream_pit_enrich_three_waves_and_replay(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    # three time-ordered waves: terciles of the event-time range (a
    # dim update that lands between triggers but is in event-time
    # order relative to the purchases streamed after it — the PIT
    # in-order contract documented on the gate)
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).head()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    us = F.unix_micros("ts")
    waves = [
        ev.filter(us <= cut1),
        ev.filter((us > cut1) & (us <= cut2)),
        ev.filter(us > cut2),
    ]

    dim_path = str(tmp_path / "dim")
    src = str(tmp_path / "facts")
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")

    observed_labels = []
    for i, w in enumerate(waves):
        # dim refresh BEFORE the trigger that streams this wave's
        # purchases — the mid-stream update crossing a trigger
        w.filter(F.col("event_type") != "purchase").write.mode(
            "append"
        ).parquet(dim_path)
        w.filter(F.col("event_type") == "purchase").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_pit_enrich(stream, dim_path, out, ckpt)
        q.awaitTermination(180)
        labels = {
            r["batch_label"]
            for r in spark.read.parquet(out)
            .select("batch_label").distinct().collect()
        }
        observed_labels = sorted(labels)
        assert len(observed_labels) == i + 1  # one new epoch per wave

    got = _rows(spark.read.parquet(out))

    # stream == batch: the batch twin over ALL purchases and the
    # FINAL dim must agree row-for-row (same pit_enrich_rows code
    # path — this pins the per-trigger refresh orchestration)
    want = _rows(pit_enrich_rows(ev, spark.read.parquet(dim_path)))
    assert got == want
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert len(got) == n_purch  # every purchase exactly once
    assert len({v[3] for v in got.values()}) > 1  # states really vary

    # exactly-once: crash-retry replay of the last epoch with the
    # same dim state reproduces identical rows
    last = observed_labels[-1]
    last_ids = [
        r["event_id"]
        for r in spark.read.parquet(out)
        .filter(F.col("batch_label") == last)
        .select("event_id")
        .collect()
    ]
    batch = ev.filter(
        F.col("event_id").isin(last_ids)
        & (F.col("event_type") == "purchase")
    )
    pit_gate_batch(spark, batch, dim_path, out, last - 1)
    again = _rows(spark.read.parquet(out))
    assert again == got


def test_pit_gate_matches_weekly_rollup_query(spark, sf_dir, tmp_path):
    """Rolling the gate's row-grain output up to (state, week) must
    reproduce the registry batch query events_pit_enrich exactly —
    the streaming surface and the oracle-checked batch query bind."""
    from firefox_public_data_report_etl_spark.plans.windowsq import (
        events_pit_enrich,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    rows = pit_enrich_rows(ev, ev)
    got = {
        (r["state"], r["week_start"]): (r["n_purchases"], r["revenue_cents"])
        for r in rows.groupBy("state", "week_start")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("rev_c").alias("revenue_cents"),
        )
        .collect()
    }
    want = {
        (r["state"], r["week_start"]): (r["n_purchases"], r["revenue_cents"])
        for r in events_pit_enrich(spark, sf_dir).collect()
    }
    assert got == want
