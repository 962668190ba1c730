"""Streaming eval-leakage gate (streaming/leakgate.py): planted
leaked passages rejected at ingestion, single-batch agreement with
the shared cross_winnow_pairs join, replay-identical output,
crash-window invisibility + heal, 3-trigger wiring."""

from __future__ import annotations

import pytest

# Streaming wiring e2e (multi-trigger replay): full profile.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.winnow_index import (
    build_winnow_index,
    cross_winnow_pairs,
)
from firefox_public_data_report_etl_spark.streaming.leakgate import (
    leak_gate_batch,
    read_accepted,
    read_decisions,
    stream_leak_gate,
)

LEAK = "the quick brown fox jumps over the lazy dog tonight"


def _eval_docs(spark):
    return spark.createDataFrame(
        [
            (1, "held out benchmark passage " + LEAK + " end"),
            (2, "another eval item entirely different content here"),
        ],
        "doc_id long, text string",
    )


def _batch(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def test_planted_leak_rejected_clean_accepted(spark, tmp_path):
    idx = str(tmp_path / "evalidx")
    store = str(tmp_path / "store")
    build_winnow_index(_eval_docs(spark), idx)
    batch = _batch(
        spark,
        [
            (100, "fresh training content with no overlap whatsoever"),
            (101, "training doc that copies " + LEAK + " verbatim"),
        ],
    )
    leak_gate_batch(spark, batch, idx, store, batch_id=0)
    acc = {r.doc_id for r in read_accepted(spark, store).collect()}
    assert acc == {100}
    dec = {r.doc_id: r for r in read_decisions(spark, store).collect()}
    assert dec[101].leaked and dec[101].n_partners >= 1
    assert not dec[100].leaked and dec[100].n_partners == 0


def test_single_batch_agrees_with_shared_join(spark, sf_dir, tmp_path):
    from firefox_public_data_report_etl_spark.operators.text import (
        winnow_fingerprints,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        WINNOW_MAX_DF,
        WINNOW_SHARED_MIN,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    eval_side = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "evalidx")
    store = str(tmp_path / "store")
    build_winnow_index(eval_side, idx)
    leak_gate_batch(spark, batch, idx, store, batch_id=0)
    got_leaked = {
        r.doc_id
        for r in read_decisions(spark, store).collect()
        if r.leaked
    }
    sel = winnow_fingerprints(docs).select("doc_id", "h").distinct()
    want_pairs = cross_winnow_pairs(
        sel.filter(F.col("doc_id") % 5 == 0),
        sel.filter(F.col("doc_id") % 5 != 0),
        WINNOW_MAX_DF,
        WINNOW_SHARED_MIN,
    )
    want_leaked = {r.batch_id for r in want_pairs.collect()}
    assert got_leaked == want_leaked


@pytest.mark.full
def test_replay_identical_and_crash_heal(spark, tmp_path):
    idx = str(tmp_path / "evalidx")
    store = str(tmp_path / "store")
    build_winnow_index(_eval_docs(spark), idx)
    batch = _batch(
        spark,
        [(100, "clean content one"), (101, "copies " + LEAK + " here")],
    )
    leak_gate_batch(spark, batch, idx, store, batch_id=0)
    first = sorted(
        (r.doc_id, r.text) for r in read_accepted(spark, store).collect()
    )
    # crash window: stray accepted slice for label 2 without decisions
    _batch(spark, [(999, "stray")]).withColumn(
        "bl", F.lit(2).cast("long")
    ).write.partitionBy("bl").mode("append").parquet(f"{store}/accepted")
    assert (
        sorted(
            (r.doc_id, r.text)
            for r in read_accepted(spark, store).collect()
        )
        == first
    )
    # replay batch 0: identical output
    leak_gate_batch(spark, batch, idx, store, batch_id=0)
    assert (
        sorted(
            (r.doc_id, r.text)
            for r in read_accepted(spark, store).collect()
        )
        == first
    )
    # the healed label-2 slice becomes visible once its batch commits
    leak_gate_batch(
        spark, _batch(spark, [(200, "more clean rows")]), idx, store, 1
    )
    ids = {r.doc_id for r in read_accepted(spark, store).collect()}
    assert 200 in ids and 999 not in ids


@pytest.mark.full
def test_stream_wiring_three_triggers(spark, tmp_path):
    idx = str(tmp_path / "evalidx")
    store = str(tmp_path / "store")
    src = str(tmp_path / "src")
    build_winnow_index(_eval_docs(spark), idx)
    waves = [
        [(100 + i, f"unique clean doc number {i} with words")]
        + ([(900 + i, "leak " + LEAK + " again")] if i == 1 else [])
        for i in range(3)
    ]
    for w in waves:
        _batch(spark, w).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_leak_gate(stream, idx, store, str(tmp_path / "ck"))
    q.awaitTermination(180)
    acc = {r.doc_id for r in read_accepted(spark, store).collect()}
    assert acc == {100, 101, 102}
    assert read_decisions(spark, store).filter("leaked").count() == 1


@pytest.mark.full
def test_all_rejected_store_reads_as_empty(spark, tmp_path):
    """The gate-family contract: a store where EVERY row of every
    batch was rejected reads as empty, not as an inference error
    (accepted/ holds only _SUCCESS — the pinned schema types it)."""
    idx = str(tmp_path / "evalidx")
    store = str(tmp_path / "store")
    build_winnow_index(_eval_docs(spark), idx)
    batch = _batch(
        spark,
        [(200, "verbatim leak " + LEAK + " again"),
         (201, "second copy of " + LEAK + " too")],
    )
    leak_gate_batch(spark, batch, idx, store, batch_id=0)
    acc = read_accepted(spark, store)
    assert acc.count() == 0
    assert dict(acc.dtypes) == {"doc_id": "bigint", "text": "string"}
    dec = {r.doc_id: r.leaked for r in read_decisions(spark, store).collect()}
    assert dec == {200: True, 201: True}
    # a later clean batch heals the store back to non-empty
    leak_gate_batch(
        spark, _batch(spark, [(300, "totally clean fresh text")]),
        idx, store, batch_id=1,
    )
    assert {r.doc_id for r in read_accepted(spark, store).collect()} == {300}


def test_first_batch_crash_before_decisions_reads_empty(spark, tmp_path):
    """Crash inside the FIRST batch's commit window: accepted slice +
    pinned schema written, decisions/ not yet created — read_accepted
    must honor the half-written-slice-is-invisible contract instead of
    raising (round-11 ADVICE)."""
    import shutil

    idx = str(tmp_path / "evalidx")
    store = str(tmp_path / "store")
    build_winnow_index(_eval_docs(spark), idx)
    leak_gate_batch(
        spark, _batch(spark, [(400, "totally clean fresh text")]),
        idx, store, batch_id=0,
    )
    shutil.rmtree(f"{store}/decisions")  # simulate the crash window
    acc = read_accepted(spark, store)
    assert acc.count() == 0
    assert dict(acc.dtypes) == {"doc_id": "bigint", "text": "string"}
