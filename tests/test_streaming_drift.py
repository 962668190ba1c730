"""Streaming drift gate (streaming/driftgate.py): batch-grain
circuit-breaker semantics — matched batches admitted whole, shifted
batches tripped whole with a durable verdict row, TVD agreement with
the plain-Python formula, replay-identical output, crash-window
recovery, wiring."""

from __future__ import annotations

import pytest

# Streaming wiring e2e: full profile.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.streaming.driftgate import (
    drift_gate_batch,
    read_accepted,
    read_verdicts,
    reference_histogram,
    stream_drift_gate,
    tvd_ppm,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _shifted(spark, n=200):
    # every doc shorter than the first bin edge — maximal shift
    return spark.createDataFrame(
        [(10_000 + i, "x" * 10) for i in range(n)],
        "doc_id long, text string",
    )


def test_matched_batch_admitted_shifted_batch_tripped(
    spark, sf_dir, tmp_path
):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    ref = reference_histogram(docs)
    matched = docs.filter(F.col("doc_id") % 2 == 0)
    drift_gate_batch(spark, matched, store, ref, batch_id=0)
    drift_gate_batch(spark, _shifted(spark), store, ref, batch_id=1)
    acc = read_accepted(spark, store)
    assert acc.count() == matched.count()
    assert acc.filter(F.col("doc_id") >= 10_000).count() == 0
    v = {r["bl"]: r for r in read_verdicts(spark, store).collect()}
    assert v[1]["accepted"] and not v[2]["accepted"]
    assert v[2]["tvd_ppm"] > v[1]["tvd_ppm"]
    # the tripped batch's verdict is durable even though no rows landed
    assert v[2]["n_rows"] == 200


def test_tvd_agrees_with_python_recompute(spark, sf_dir):
    from collections import Counter

    from firefox_public_data_report_etl_spark.plans.quality import (
        DRIFT_BIN_EDGES,
    )

    docs = _docs(spark, sf_dir)
    ref = reference_histogram(docs)
    rows = docs.filter(F.col("doc_id") % 3 == 0).collect()

    def binof(n):
        for i, e in enumerate(DRIFT_BIN_EDGES):
            if n < e:
                return i
        return len(DRIFT_BIN_EDGES)

    counts = Counter(binof(len(r.text)) for r in rows)
    n_b, n_r = sum(counts.values()), sum(ref.values())
    num = sum(
        abs(counts.get(b, 0) * n_r - ref.get(b, 0) * n_b)
        for b in set(counts) | set(ref)
    )
    assert tvd_ppm(dict(counts), ref) == (1_000_000 * num) // (
        2 * n_b * n_r
    )
    # self-comparison is exactly zero; empty batch is max drift
    assert tvd_ppm(ref, ref) == 0
    assert tvd_ppm({}, ref) == 1_000_000


def test_replay_identical(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    ref = reference_histogram(docs)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    drift_gate_batch(spark, batch, store, ref, batch_id=0)
    first = sorted(
        (r["doc_id"], r["text"])
        for r in read_accepted(spark, store).collect()
    )
    v1 = read_verdicts(spark, store).collect()
    drift_gate_batch(spark, batch, store, ref, batch_id=0)  # replay
    second = sorted(
        (r["doc_id"], r["text"])
        for r in read_accepted(spark, store).collect()
    )
    assert first == second
    assert read_verdicts(spark, store).collect() == v1


def test_crash_window_slice_invisible_until_meta(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    ref = reference_histogram(docs)
    drift_gate_batch(spark, docs, store, ref, batch_id=0)
    # simulate a crashed attempt: label-2 slice written, meta missing
    stray = docs.limit(5).select(
        "doc_id", "text", F.lit(2).cast("long").alias("bl")
    )
    stray.write.partitionBy("bl").mode("append").parquet(
        f"{store}/accepted"
    )
    assert read_accepted(spark, store).count() == docs.count()
    # replay heals: the gate rewrites slice 2 and commits its meta
    batch2 = docs.filter(F.col("doc_id") % 2 == 0)
    drift_gate_batch(spark, batch2, store, ref, batch_id=1)
    assert (
        read_accepted(spark, store).count()
        == docs.count() + batch2.count()
    )


def test_all_tripped_store_reads_empty(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    ref = reference_histogram(_docs(spark, sf_dir))
    drift_gate_batch(spark, _shifted(spark), store, ref, batch_id=0)
    assert read_accepted(spark, store).count() == 0
    assert read_verdicts(spark, store).count() == 1


def test_stream_wiring_three_triggers(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    ref = reference_histogram(docs)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_drift_gate(stream, store, str(tmp_path / "ck"), ref)
    q.awaitTermination(180)
    assert read_accepted(spark, store).count() == docs.count()
    assert read_verdicts(spark, store).count() == 3
