"""Resumable loader state (round-11 verdict #7): resume_suffix yields
EXACTLY the unseen suffix of the deterministic order (prefix/suffix
partition property), checkpoints follow the gate family's two-phase
commit (a crash between cursor slice and marker is invisible), and
the prefix checksum lets a resumed run verify what it skipped."""

from __future__ import annotations

import pytest

# Streaming crash-resume e2e: full profile.
pytestmark = pytest.mark.full

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


@pytest.mark.full
def test_streaming_ingestion_crash_resume_end_to_end(spark, sf_dir, tmp_path):
    """Round-12 verdict #5: a STREAMING ingestion of the epoch order is
    killed mid-epoch and resumed COLD (fresh stream, fresh streaming
    checkpoint — only the loader checkpoint store survives, as for a
    restarted trainer). The resumed run must skip exactly the
    delivered prefix (verified against the checkpoint's prefix
    checksum) and deliver exactly the unseen suffix: crash+resume
    delivery == the deterministic order, no duplicates, no gaps."""
    import shutil

    from pyspark.sql import Window

    src = str(tmp_path / "src")
    store = str(tmp_path / "cp")
    out = str(tmp_path / "delivered")

    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )
    order = epoch_training_order(
        docs, "doc_id", n_epochs=1, n_shards=4
    ).cache()
    keys = sorted(
        {(r.epoch, r.shard_id) for r in order.select("epoch", "shard_id").distinct().collect()}
    )
    assert len(keys) == 4
    # one file per (epoch, shard) slice = one micro-batch per trigger
    for i, (e, s) in enumerate(keys):
        order.filter(
            (F.col("epoch") == e) & (F.col("shard_id") == s)
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/{i:03d}")

    term = (
        (F.col("doc_id") % F.lit(_MOD))
        * ((F.col("pos") + F.lit(1)) % F.lit(_MOD))
        % F.lit(_MOD)
    )

    def _deliver(b, _bid, crash_after):
        # a restarted trainer knows only the loader store: label =
        # newest committed label + 1, never the stream's batch id
        cp = read_loader_checkpoint(spark, store)
        old = {
            (r.epoch, r.shard_id): (r.cursor, r.prefix_checksum)
            for r in cp.collect()
        }
        label = 1 + max([0] + [
            r.bl for r in spark.read.parquet(f"{store}/meta").collect()
        ]) if (tmp_path / "cp" / "meta").exists() else 1
        todo = resume_suffix(b, cp).cache()
        rows = todo.collect()
        if rows:
            todo.write.mode("append").parquet(out)
        # cumulative cursors: batch shards advance, others carry over
        upd = {
            (r.epoch, r.shard_id): (r.c, r.ck)
            for r in todo.groupBy("epoch", "shard_id").agg(
                (F.max("pos") + 1).cast("long").alias("c"),
                (F.sum(term) % F.lit(_MOD)).cast("long").alias("ck"),
            ).collect()
        }
        merged = dict(old)
        for k, (c, ck) in upd.items():
            oc, ock = merged.get(k, (0, 0))
            merged[k] = (max(oc, c), (ock + ck) % _MOD)
        cur = spark.createDataFrame(
            [(e, s, c, ck) for (e, s), (c, ck) in sorted(merged.items())],
            "epoch long, shard_id long, cursor long, prefix_checksum long",
        )
        write_loader_checkpoint(spark, store, label, cur)
        todo.unpersist()
        if crash_after is not None and label >= crash_after:
            raise RuntimeError("simulated trainer crash")

    def _run(ck_dir, crash_after):
        stream = (
            spark.readStream.schema(
                "epoch long, shard_id long, doc_id long, pos long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream.writeStream.foreachBatch(
            lambda b, bid: _deliver(b, bid, crash_after)
        ).option(
            "checkpointLocation", str(tmp_path / ck_dir)
        ).trigger(availableNow=True).start()
        try:
            q.awaitTermination(300)
        except Exception:
            pass  # the simulated crash surfaces here
        finally:
            if q.isActive:
                q.stop()

    _run("ck1", crash_after=2)  # die after the 2nd committed batch
    cp = read_loader_checkpoint(spark, store)
    n_cp = cp.count()
    assert 0 < n_cp < len(keys), "crash must land mid-epoch"
    # the checkpoint's prefix checksums match the DELIVERED rows
    delivered1 = spark.read.parquet(out)
    got_ck = {
        (r.epoch, r.shard_id): r.prefix_checksum
        for r in delivered1.groupBy("epoch", "shard_id").agg(
            (F.sum(term) % F.lit(_MOD)).cast("long").alias("prefix_checksum")
        ).collect()
    }
    want_ck = {
        (r.epoch, r.shard_id): r.prefix_checksum for r in cp.collect()
    }
    assert got_ck == want_ck
    n1 = delivered1.count()

    shutil.rmtree(str(tmp_path / "ck1"))  # cold restart: no stream state
    _run("ck2", crash_after=None)
    delivered = spark.read.parquet(out)
    # exactly-once end to end: crash + resume == the full order
    assert delivered.count() == order.count(), "no duplicate deliveries"
    full = {(r.epoch, r.shard_id, r.doc_id, r.pos) for r in order.collect()}
    got = {
        (r.epoch, r.shard_id, r.doc_id, r.pos) for r in delivered.collect()
    }
    assert got == full, "no gaps"
    assert n1 < len(full), "resume actually had work to do"
    order.unpersist()
