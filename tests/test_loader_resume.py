"""Resumable loader state (round-11 verdict #7): resume_suffix yields
EXACTLY the unseen suffix of the deterministic order (prefix/suffix
partition property), checkpoints follow the gate family's two-phase
commit (a crash between cursor slice and marker is invisible), and
the prefix checksum lets a resumed run verify what it skipped."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.ordering import (
    _MOD,
    epoch_training_order,
    read_loader_checkpoint,
    resume_suffix,
    write_loader_checkpoint,
)
from firefox_public_data_report_etl_spark.sources import load_table


def _order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_training_order(docs, "doc_id", n_epochs=2, n_shards=8)


def _cursors(order, pct):
    from pyspark.sql import Window

    w = Window.partitionBy("epoch", "shard_id")
    term = (
        (F.col("doc_id") % F.lit(_MOD))
        * ((F.col("pos") + F.lit(1)) % F.lit(_MOD))
        % F.lit(_MOD)
    )
    ann = order.withColumn("n_rows", F.count("*").over(w)).withColumn(
        "cursor", F.expr(f"(n_rows * {pct}) DIV 100")
    )
    return ann.groupBy("epoch", "shard_id").agg(
        F.max("cursor").cast("long").alias("cursor"),
        (
            F.coalesce(
                F.sum(F.when(F.col("pos") < F.col("cursor"), term)),
                F.lit(0),
            )
            % F.lit(_MOD)
        )
        .cast("long")
        .alias("prefix_checksum"),
    )


def test_prefix_suffix_partition_property(spark, sf_dir):
    order = _order(spark, sf_dir).cache()
    cps = _cursors(order, 40).cache()
    suffix = resume_suffix(order, cps)
    full = {
        (r.epoch, r.shard_id, r.doc_id, r.pos) for r in order.collect()
    }
    cur = {(r.epoch, r.shard_id): r.cursor for r in cps.collect()}
    suf = {
        (r.epoch, r.shard_id, r.doc_id, r.pos) for r in suffix.collect()
    }
    pre = full - suf
    assert suf | pre == full and not (suf & pre)
    assert all(p >= cur[(e, s)] for e, s, _, p in suf)
    assert all(p < cur[(e, s)] for e, s, _, p in pre)
    assert pre and suf, "both sides must be non-empty at 40%"
    order.unpersist(); cps.unpersist()


def test_checkpoint_commit_marker_and_crash_window(spark, sf_dir, tmp_path):
    store = str(tmp_path / "cp")
    order = _order(spark, sf_dir).cache()
    # empty store -> resume from zero (typed empty checkpoint)
    cp0 = read_loader_checkpoint(spark, store)
    assert cp0.count() == 0
    assert resume_suffix(order, cp0).count() == order.count()
    # committed checkpoint at 40%
    write_loader_checkpoint(spark, store, 1, _cursors(order, 40))
    got1 = resume_suffix(order, read_loader_checkpoint(spark, store))
    n40 = got1.count()
    assert 0 < n40 < order.count()
    # crash window: newer cursor slice WITHOUT its marker is invisible
    _cursors(order, 80).withColumn("bl", F.lit(2).cast("long")).select(
        "epoch", "shard_id", "cursor", "prefix_checksum", "bl"
    ).write.partitionBy("bl").mode("append").parquet(f"{store}/cursors")
    still = resume_suffix(order, read_loader_checkpoint(spark, store))
    assert still.count() == n40
    # replaying the full write heals: label 2 becomes authoritative
    write_loader_checkpoint(spark, store, 2, _cursors(order, 80))
    n80 = resume_suffix(
        order, read_loader_checkpoint(spark, store)
    ).count()
    assert 0 < n80 < n40
    # prefix checksum of the committed checkpoint matches a fresh
    # recompute of the consumed prefix (skip verification on resume)
    cp = read_loader_checkpoint(spark, store)
    want = {
        (r.epoch, r.shard_id): r.prefix_checksum
        for r in _cursors(order, 80).collect()
    }
    got = {
        (r.epoch, r.shard_id): r.prefix_checksum for r in cp.collect()
    }
    assert got == want
    order.unpersist()
