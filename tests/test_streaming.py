"""Structured Streaming: the batch tumbling-window aggregation must
produce identical results when run incrementally through readStream
(availableNow trigger, memory sink)."""

from __future__ import annotations

import pytest

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

    # Out-of-order delivery: an OLDER revision arriving in a LATER
    # micro-batch must not clobber the newer row already in the target
    # (latest-wins is by rev across batches, not last-write-wins).
    run_wave([(2, 2, "two.v2-late"), (3, 2, "three.v2")])
    got = {
        r["doc_id"]: (r["rev"], r["text"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: (1, "one.v1"), 2: (3, "two.v3"), 3: (2, "three.v2")}
    # the swap protocol leaves no staging/old debris behind
    assert not (tmp_path / "target._staging").exists()
    assert not (tmp_path / "target._old").exists()


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    """Duplicated deliveries through the watermarked streaming dedup:
    the appended output must equal batch dropDuplicates on the keys,
    and each key must be emitted exactly once even when its duplicate
    arrives in a later micro-batch."""
    from firefox_public_data_report_etl_spark.streaming import stream_dedup_events

    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, ts string, event_type string, value double"
    wave1 = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "click", 1.0),
            (1, "2024-01-01 10:00:00", "click", 1.0),  # intra-batch dup
            (2, "2024-01-01 10:05:00", "view", 2.0),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    wave2 = spark.createDataFrame(
        [
            (2, "2024-01-01 10:05:00", "view", 2.0),  # cross-batch dup
            (3, "2024-01-01 10:20:00", "click", 3.0),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    wave1.coalesce(1).write.parquet(str(src / "w1"))
    wave2.coalesce(1).write.parquet(str(src / "w2"))

    stream = (
        spark.readStream.schema(wave1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    deduped = stream_dedup_events(stream, delay="2 hours")
    assert deduped.isStreaming
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["event_type"])
        for r in spark.sql("SELECT * FROM dedup_test").collect()
    )
    batch = wave1.unionAll(wave2)
    expected = sorted(
        (r["user_id"], r["event_type"])
        for r in stream_dedup_events(batch).collect()
    )
    assert got == expected == [(1, "click"), (2, "view"), (3, "click")]


@pytest.mark.full
def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """The interval join must yield the same pair set whether run as a
    batch non-equi join or as a watermarked stream-stream join."""
    from firefox_public_data_report_etl_spark.streaming import (
        click_purchase_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = click_purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    expected = sorted(tuple(r) for r in batch.collect())
    assert expected, "fixture has no click->purchase pairs"

    s_clicks = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    s_purch = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = click_purchase_attribution(s_clicks, s_purch, watermark="2 hours")
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ssj_test").collect()
    )
    assert got == expected


@pytest.mark.full
def test_stream_stream_join_buffers_across_batches(spark, tmp_path):
    """A click and its purchase arriving in DIFFERENT micro-batches
    must still pair (join state buffers the click until the other
    side's watermark passes), and a purchase outside the delay window
    must not."""
    from firefox_public_data_report_etl_spark.streaming import (
        click_purchase_attribution,
    )

    src = tmp_path / "ssrc"
    src.mkdir()
    schema = (
        "event_id long, user_id long, ts string, "
        "event_type string, value double"
    )
    clicks = spark.createDataFrame(
        [
            (10, 1, "2024-01-01 10:00:00", "click", 0.0),
            (11, 2, "2024-01-01 10:00:00", "click", 0.0),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    purchases = spark.createDataFrame(
        [
            (20, 1, "2024-01-01 10:30:00", "purchase", 9.99),
            # 90 min after the click: outside the 1 h window
            (21, 2, "2024-01-01 11:30:00", "purchase", 5.0),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    clicks.coalesce(1).write.parquet(str(src / "w1"))
    purchases.coalesce(1).write.parquet(str(src / "w2"))

    def reader():
        return (
            spark.readStream.schema(clicks.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )

    joined = click_purchase_attribution(
        reader().filter(F.col("event_type") == "click"),
        reader().filter(F.col("event_type") == "purchase"),
        watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_xbatch")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_xbatch_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM ssj_xbatch").collect()
    )
    assert got == [(1, 10, 20)]


def test_stream_pii_scrub_matches_batch(spark, sf_dir, tmp_path):
    """pii_scrub is a pure projection, so the SAME operator runs
    unchanged over readStream — the per-row text operators extend to
    the streaming surface with zero reimplementation (append mode, no
    state, no watermark needed)."""
    from firefox_public_data_report_etl_spark.operators.text import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail u"),
            F.col("doc_id").cast("string"),
            F.lit("@x.io ip 10.0.0."),
            (F.col("doc_id") % 250).cast("string"),
        ).alias("text"),
    )
    expected = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["scrubbed"])
        for r in pii_scrub(injected).collect()
    }
    assert expected and all(v[0] == 1 and v[1] == 1 for v in expected.values())

    src = tmp_path / "docs_src"
    injected.write.parquet(str(src))
    stream_docs = spark.readStream.schema(injected.schema).parquet(str(src))
    q = (
        pii_scrub(stream_docs)
        .writeStream.format("memory")
        .queryName("pii_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pii"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["scrubbed"])
        for r in spark.sql("SELECT * FROM pii_stream_test").collect()
    }
    assert got == expected


def test_stream_sketch_union_matches_exact(spark, sf_dir, tmp_path):
    """Incremental HLL sketch rollup: the events table split across 3
    micro-batches, per-batch partial sketches unioned into the target
    by foreachBatch — the stored table's estimates must equal exact
    weekly distinct users (lgK=14 keeps the sketch in exact sparse
    mode at test cardinalities, and union-of-partials is associative,
    so batch boundaries cannot change the registers), and a restart on
    the same checkpoint with no new files must change nothing."""
    from firefox_public_data_report_etl_spark.functions import week_start
    from firefox_public_data_report_etl_spark.sources import load_table
    from firefox_public_data_report_etl_spark.streaming.sketches import (
        stream_sketch_union,
        weekly_estimates,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    src = tmp_path / "src"
    ev.repartition(3).write.parquet(str(src))
    target = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_sketch_union(stream, target, ckpt)
        q.awaitTermination(180)

    run()
    got = {
        str(r["week"]): r["approx_users"]
        for r in weekly_estimates(spark, target).collect()
    }
    exact = {
        str(r["week"]): r["n"]
        for r in ev.select(week_start(F.col("ts")).alias("week"), "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact
    assert len(got) >= 4  # the table really is per-week

    run()  # checkpoint replay, no new files
    again = {
        str(r["week"]): r["approx_users"]
        for r in weekly_estimates(spark, target).collect()
    }
    assert again == got
    # swap protocol leaves no debris
    assert not (tmp_path / "sketches._staging").exists()
    assert not (tmp_path / "sketches._old").exists()


@pytest.mark.full
def test_streaming_neardup_gate_sequential_equivalence_and_replay(
    spark, sf_dir, tmp_path
):
    """Streaming near-dup ingestion gate (streaming/neardup.py): a
    3-file backfill drained with maxFilesPerTrigger=1 must (a) decide
    every streamed doc exactly once, (b) equal a sequential batch-mode
    run of the SAME observed micro-batches against a fresh index, and
    (c) be replay-safe: re-running the last epoch (crash retry with
    its append already applied) reproduces identical decisions — the
    exclude_label guard is what keeps the batch from matching its own
    signatures on replay."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        gram_hash_arrays,
    )
    from firefox_public_data_report_etl_spark.operators.incremental import (
        build_minhash_index,
    )
    from firefox_public_data_report_etl_spark.sources import load_table
    from firefox_public_data_report_etl_spark.streaming.neardup import (
        neardup_gate_batch,
        stream_neardup_gate,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 == 1)
    stream_docs = docs.filter(F.col("doc_id") % 4 != 1).select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    stream_docs.repartition(3).write.parquet(str(src))

    index = str(tmp_path / "index")
    decisions = str(tmp_path / "decisions")
    build_minhash_index(gram_hash_arrays(base).cache(), index)

    stream = (
        spark.readStream.schema(stream_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_neardup_gate(
        stream, index, decisions, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    dec = spark.read.parquet(decisions)
    rows = {
        r["doc_id"]: (r["component"], r["matched_base"], r["keep"],
                      r["batch_label"])
        for r in dec.collect()
    }
    want_ids = {r["doc_id"] for r in stream_docs.select("doc_id").collect()}
    assert set(rows) == want_ids  # every doc decided exactly once
    labels = sorted({v[3] for v in rows.values()})
    assert len(labels) == 3  # one epoch per file

    # (b) sequential batch-mode run of the same observed batches
    index2 = str(tmp_path / "index2")
    decisions2 = str(tmp_path / "decisions2")
    build_minhash_index(gram_hash_arrays(base).cache(), index2)
    for lb in labels:
        ids = [d for d, v in rows.items() if v[3] == lb]
        batch = docs.filter(F.col("doc_id").isin(ids)).select(
            "doc_id", "text"
        )
        neardup_gate_batch(spark, batch, index2, decisions2, lb - 1)
    rows2 = {
        r["doc_id"]: (r["component"], r["matched_base"], r["keep"],
                      r["batch_label"])
        for r in spark.read.parquet(decisions2).collect()
    }
    assert rows2 == rows

    # (c) crash-retry replay of the last epoch: identical output
    last = labels[-1]
    ids = [d for d, v in rows.items() if v[3] == last]
    batch = docs.filter(F.col("doc_id").isin(ids)).select("doc_id", "text")
    neardup_gate_batch(spark, batch, index, decisions, last - 1)
    rows3 = {
        r["doc_id"]: (r["component"], r["matched_base"], r["keep"],
                      r["batch_label"])
        for r in spark.read.parquet(decisions).collect()
    }
    assert rows3 == rows


def test_streaming_quality_gate_matches_batch_and_replays(
    spark, sf_dir, tmp_path
):
    """Streaming quality gate (streaming/quality_gate.py): a 3-file
    backfill drained with maxFilesPerTrigger=1 must decide every doc
    exactly once with verdicts equal to the BATCH computation over the
    full corpus (the gate is stateless, so stream == batch exactly),
    and replaying an epoch reproduces identical rows."""
    from firefox_public_data_report_etl_spark.operators.text import (
        gopher_rules,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        LM_GATE_MUNATS,
        LM_REF_KEEP,
        LM_REF_MOD,
    )
    from firefox_public_data_report_etl_spark.sources import load_table
    from firefox_public_data_report_etl_spark.streaming.quality_gate import (
        freeze_lm_table,
        quality_gate_batch,
        stream_quality_gate,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lm_rows, lm_oov = freeze_lm_table(
        docs, F.col("doc_id") % LM_REF_MOD < LM_REF_KEEP
    )
    src = tmp_path / "src"
    docs.repartition(3).write.parquet(str(src))

    decisions = str(tmp_path / "decisions")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_quality_gate(
        stream, lm_rows, lm_oov, decisions, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    dec = spark.read.parquet(decisions)
    rows = {
        r["doc_id"]: (r["rules_ok"], r["lm_ok"], r["keep"], r["batch_label"])
        for r in dec.collect()
    }
    want = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(rows) == want  # every doc decided exactly once
    assert len({v[3] for v in rows.values()}) == 3  # one epoch per file

    # stream verdicts == batch-mode verdicts over the whole corpus
    from pyspark.sql import functions as SF

    lp = spark.createDataFrame(lm_rows, "token string, lp long")
    batch_rules = {
        r["doc_id"]: r["keep"] for r in gopher_rules(docs).collect()
    }
    batch_lm = {
        r["doc_id"]: r["ok"]
        for r in docs.select(
            "doc_id", SF.explode(SF.split("text", " ")).alias("token")
        )
        .join(lp, "token", "left")
        .groupBy("doc_id")
        .agg(SF.sum(SF.coalesce(SF.col("lp"), SF.lit(lm_oov))).alias("s"),
             SF.count("*").alias("n"))
        .select(
            "doc_id",
            (SF.col("s") >= SF.col("n") * SF.lit(LM_GATE_MUNATS)).alias("ok"),
        )
        .collect()
    }
    for d, (rules_ok, lm_ok, keep, _) in rows.items():
        assert rules_ok == batch_rules[d], d
        assert lm_ok == batch_lm[d], d
        assert keep == (rules_ok and lm_ok), d

    # replaying the last epoch is a pure overwrite: identical rows
    last = max(v[3] for v in rows.values())
    ids = [d for d, v in rows.items() if v[3] == last]
    batch = docs.filter(F.col("doc_id").isin(ids))
    quality_gate_batch(spark, batch, lm_rows, lm_oov, decisions, last - 1)
    rows2 = {
        r["doc_id"]: (r["rules_ok"], r["lm_ok"], r["keep"], r["batch_label"])
        for r in spark.read.parquet(decisions).collect()
    }
    assert rows2 == rows


@pytest.mark.full
def test_streaming_quality_gate_with_frozen_nb(spark, sf_dir, tmp_path):
    """NB-enabled gate: the frozen classifier margin per streamed doc
    must equal the batch recomputation with the same frozen model,
    keep must be the three-way conjunction, and replaying an epoch
    with the model still frozen reproduces identical rows."""
    from firefox_public_data_report_etl_spark.operators.text import (
        NB_BUCKETS,
    )
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        LM_REF_KEEP,
        LM_REF_MOD,
        NB_HQ_SOURCES,
    )
    from firefox_public_data_report_etl_spark.sources import load_table
    from firefox_public_data_report_etl_spark.streaming.quality_gate import (
        freeze_lm_table,
        freeze_nb_model,
        quality_gate_batch,
        stream_quality_gate,
    )

    full = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    docs = full.select("doc_id", "text")
    lm_rows, lm_oov = freeze_lm_table(
        docs, F.col("doc_id") % LM_REF_MOD < LM_REF_KEEP
    )
    nb_rows, nb_prior = freeze_nb_model(
        full, F.col("source").isin(*NB_HQ_SOURCES)
    )
    src = tmp_path / "src"
    docs.repartition(2).write.parquet(str(src))

    decisions = str(tmp_path / "dec_nb")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_quality_gate(
        stream, lm_rows, lm_oov, decisions, str(tmp_path / "ckpt_nb"),
        nb_rows=nb_rows, nb_prior=nb_prior,
    )
    q.awaitTermination(180)

    dec = spark.read.parquet(decisions)
    rows = {
        r["doc_id"]: (
            r["rules_ok"], r["lm_ok"], r["nb_ok"], r["nb_margin"],
            r["keep"], r["batch_label"],
        )
        for r in dec.collect()
    }
    assert len(rows) == docs.count()

    # batch recomputation of the frozen margin
    nbw = spark.createDataFrame(nb_rows, "b long, w long")
    batch_margin = {
        r["doc_id"]: r["m"]
        for r in docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w_tok")
        )
        .select(
            "doc_id",
            (F.expr(md5_int_spark_sql("w_tok")) % NB_BUCKETS).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("cnt"))
        .join(nbw, "b")
        .groupBy("doc_id")
        .agg(
            (F.lit(nb_prior) + F.sum(F.col("w") * F.col("cnt")))
            .cast("long")
            .alias("m")
        )
        .collect()
    }
    both = set()
    for d, (rules_ok, lm_ok, nb_ok, nb_margin, keep, _) in rows.items():
        assert nb_margin == batch_margin[d], d
        assert nb_ok == (nb_margin >= 0), d
        assert keep == (rules_ok and lm_ok and nb_ok), d
        both.add(nb_ok)
    assert both == {True, False}  # the model actually discriminates

    # replay with the frozen model: identical rows
    last = max(v[5] for v in rows.values())
    ids = [d for d, v in rows.items() if v[5] == last]
    batch = docs.filter(F.col("doc_id").isin(ids))
    quality_gate_batch(
        spark, batch, lm_rows, lm_oov, decisions, last - 1,
        nb_rows=nb_rows, nb_prior=nb_prior,
    )
    rows2 = {
        r["doc_id"]: (
            r["rules_ok"], r["lm_ok"], r["nb_ok"], r["nb_margin"],
            r["keep"], r["batch_label"],
        )
        for r in spark.read.parquet(decisions).collect()
    }
    assert rows2 == rows


def test_hopping_stream_matches_batch(spark, sf_dir, tmp_path):
    """Sliding-window streaming form == the same function on the
    batch read: every overlapping pane, type, count, and cents sum."""
    from firefox_public_data_report_etl_spark.streaming.windows import (
        hopping_event_value,
    )

    batch = hopping_event_value(load_table(spark, sf_dir, "events"))
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in batch.collect()
    }

    stream = hopping_event_value(
        stream_events(spark, sf_dir), watermark="1 hour"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hopping_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in spark.sql("SELECT * FROM hopping_test").collect()
    }
    assert got == expected and expected
