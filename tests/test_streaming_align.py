"""Streaming caption-alignment ingestion gate (streaming/aligngate.py,
round-11 verdict #8): stream==batch agreement with
multimodal_caption_align, planted mismatches rejected at ingestion,
replay-identical output, crash-window invisibility + heal,
all-rejected-reads-empty, 3-trigger wiring."""

from __future__ import annotations

import pytest

# Streaming wiring e2e: full profile.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.multimodal import (
    attach_captions,
    attach_neardup_bmp_payload,
)
from firefox_public_data_report_etl_spark.sources import load_table
from firefox_public_data_report_etl_spark.streaming.aligngate import (
    align_gate_batch,
    read_accepted,
    read_verdicts,
    stream_align_gate,
)


def _pairs(spark, sf_dir, pred=None):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    if pred is not None:
        docs = docs.filter(pred)
    media = attach_neardup_bmp_payload(docs)
    caps = attach_captions(docs)
    return media.join(caps, "media_id")


def test_single_batch_agrees_with_batch_audit(spark, sf_dir, tmp_path):
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_caption_align,
    )

    store = str(tmp_path / "store")
    batch = _pairs(spark, sf_dir)
    align_gate_batch(spark, batch, store, batch_id=0)
    got = {
        r.media_id: (r.dot, r.na, r.nb, r.cos2_fp, r.aligned)
        for r in read_verdicts(spark, store).collect()
    }
    want = {
        r.media_id: (r.dot, r.na, r.nb, r.cos2_fp, r.aligned)
        for r in multimodal_caption_align(spark, sf_dir).collect()
    }
    assert got == want
    acc = {r.media_id for r in read_accepted(spark, store).collect()}
    assert acc == {m for m, v in want.items() if v[4]}
    assert acc and len(acc) < len(want), "both verdicts must occur"


def test_replay_identical_and_crash_window(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    batch = _pairs(spark, sf_dir, F.col("doc_id") < 40)
    align_gate_batch(spark, batch, store, batch_id=0)
    first = sorted(
        (r.media_id, bytes(r.payload)[:16])
        for r in read_accepted(spark, store).collect()
    )
    # crash window: stray accepted slice for label 2 without verdicts
    batch.limit(1).withColumn("bl", F.lit(2).cast("long")).write.partitionBy(
        "bl"
    ).mode("append").parquet(f"{store}/accepted")
    assert (
        sorted(
            (r.media_id, bytes(r.payload)[:16])
            for r in read_accepted(spark, store).collect()
        )
        == first
    )
    # replay batch 0: identical output
    align_gate_batch(spark, batch, store, batch_id=0)
    assert (
        sorted(
            (r.media_id, bytes(r.payload)[:16])
            for r in read_accepted(spark, store).collect()
        )
        == first
    )


def test_all_rejected_reads_empty_then_heals(spark, sf_dir, tmp_path):
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        CAP_MIS_MOD,
        CAP_MIS_RES,
    )

    store = str(tmp_path / "store")
    mism = F.col("doc_id") % CAP_MIS_MOD == CAP_MIS_RES
    align_gate_batch(
        spark, _pairs(spark, sf_dir, mism & (F.col("doc_id") < 60)),
        store, batch_id=0,
    )
    acc = read_accepted(spark, store)
    assert acc.count() == 0 and "media_id" in acc.columns
    align_gate_batch(
        spark, _pairs(spark, sf_dir, ~mism & (F.col("doc_id") < 20)),
        store, batch_id=1,
    )
    assert read_accepted(spark, store).count() > 0


def test_stream_wiring_three_triggers(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    src = str(tmp_path / "src")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        _pairs(
            spark, sf_dir,
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi),
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "media_id long, payload binary, media_type string,"
            " n_bytes long, caption string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_align_gate(stream, store, str(tmp_path / "ck"))
    q.awaitTermination(180)
    verd = read_verdicts(spark, store)
    assert verd.select("bl").distinct().count() == 3
    assert verd.count() == 30
    got = {r.media_id for r in read_accepted(spark, store).collect()}
    want = {
        r.media_id
        for r in verd.filter("aligned").collect()
    }
    assert got == want and got


def test_first_batch_crash_before_verdicts_reads_empty(spark, sf_dir, tmp_path):
    """Crash inside the FIRST batch's commit window: accepted slice +
    pinned schema written, verdicts/ not yet created. The documented
    contract — a half-written slice is invisible — must hold (round-11
    ADVICE: read_accepted raised AnalysisException here)."""
    import shutil

    store = str(tmp_path / "store")
    align_gate_batch(spark, _pairs(spark, sf_dir, F.col("doc_id") < 40),
                     store, batch_id=0)
    shutil.rmtree(f"{store}/verdicts")  # simulate the crash window
    acc = read_accepted(spark, store)
    assert acc.count() == 0
    assert "media_id" in acc.columns
