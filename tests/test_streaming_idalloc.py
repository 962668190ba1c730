"""Streaming dense-id allocator (streaming/idalloc.py): stream ==
batch equivalence, replay-identical ids, crash-window recovery, and
the committed-only read contract."""

from __future__ import annotations

import pytest

# Streaming wiring e2e: full profile.
pytestmark = pytest.mark.full

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.ordering import (
    assign_contiguous_ids,
)
from firefox_public_data_report_etl_spark.streaming.idalloc import (
    alloc_ids_batch,
    read_assigned_ids,
    stream_alloc_ids,
)


def _waves(spark):
    # three waves with distinct, interleaved key ranges
    return [
        spark.createDataFrame(
            [(k,) for k in ks], "doc_id long"
        )
        for ks in ([5, 1, 9, 3], [2, 8, 40, 6], [100, 7, 55])
    ]


def _assigned(spark, store):
    return {
        r["doc_id"]: r["sample_id"]
        for r in read_assigned_ids(spark, store).collect()
    }


def test_stream_equals_batch_and_dense(spark, tmp_path):
    store = str(tmp_path / "store")
    waves = _waves(spark)
    for i, w in enumerate(waves):
        alloc_ids_batch(spark, w, store, batch_id=i)
    got = _assigned(spark, store)
    # dense 0..N-1
    assert sorted(got.values()) == list(range(11))
    # batch twin: number wave-by-wave in key order — the same total
    # order the stream commits
    expect = {}
    nxt = 0
    for w in waves:
        for k in sorted(r["doc_id"] for r in w.collect()):
            expect[k] = nxt
            nxt += 1
    assert got == expect


def test_replay_reassigns_identical_ids(spark, tmp_path):
    store = str(tmp_path / "store")
    waves = _waves(spark)
    for i, w in enumerate(waves):
        alloc_ids_batch(spark, w, store, batch_id=i)
    before = _assigned(spark, store)
    # replay the middle batch (checkpoint redelivery)
    alloc_ids_batch(spark, waves[1], store, batch_id=1)
    assert _assigned(spark, store) == before


def test_crash_window_recovery(spark, tmp_path):
    store = str(tmp_path / "store")
    waves = _waves(spark)
    for i, w in enumerate(waves[:2]):
        alloc_ids_batch(spark, w, store, batch_id=i)
    committed = _assigned(spark, store)
    # simulate: batch 2 wrote its ids slice, crashed before meta
    label3 = [
        p
        for p in (Path(store) / "ids").glob("bl=*")
        if p.name == "bl=3"
    ]
    assert not label3
    ids2 = assign_contiguous_ids(
        waves[2].select("doc_id"), ["doc_id"], id_name="sample_id"
    ).select(
        "doc_id",
        (F.col("sample_id") + 8).alias("sample_id"),
        F.lit(3).cast("long").alias("bl"),
    )
    ids2.write.partitionBy("bl").mode("append").parquet(f"{store}/ids")
    # uncommitted slice is invisible
    assert _assigned(spark, store) == committed
    # replay of batch 2 rewrites slice + meta; ids identical to a
    # clean run
    alloc_ids_batch(spark, waves[2], store, batch_id=2)
    got = _assigned(spark, store)
    assert sorted(got.values()) == list(range(11))
    assert got[100] > got[2]  # wave 3 keys numbered after wave 2


def test_within_batch_duplicates_collapse(spark, tmp_path):
    store = str(tmp_path / "store")
    w = spark.createDataFrame([(4,), (4,), (2,)], "doc_id long")
    alloc_ids_batch(spark, w, store, batch_id=0)
    got = _assigned(spark, store)
    assert got == {2: 0, 4: 1}


@pytest.mark.full
def test_stream_wiring_three_triggers(spark, tmp_path):
    src = tmp_path / "src"
    waves = _waves(spark)
    for i, w in enumerate(waves):
        w.coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "store")
    q = stream_alloc_ids(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = _assigned(spark, store)
    assert sorted(got.values()) == list(range(11))
    # three labels committed
    meta = spark.read.parquet(f"{store}/meta")
    assert meta.count() == 3


def test_empty_batch_holds_base(spark, tmp_path):
    store = str(tmp_path / "store")
    w1 = spark.createDataFrame([(5,), (1,)], "doc_id long")
    empty = spark.createDataFrame([], "doc_id long")
    w3 = spark.createDataFrame([(9,)], "doc_id long")
    alloc_ids_batch(spark, w1, store, batch_id=0)
    alloc_ids_batch(spark, empty, store, batch_id=1)
    alloc_ids_batch(spark, w3, store, batch_id=2)
    got = _assigned(spark, store)
    assert got == {1: 0, 5: 1, 9: 2}
    meta = spark.read.parquet(f"{store}/meta")
    assert meta.count() == 3  # the empty batch still commits its meta
