"""Streaming token-budget gate (streaming/budgetgate.py): single-batch
equivalence with the batch filler, cross-batch budget conservation,
replay-identical acceptance, crash-window recovery, wiring."""

from __future__ import annotations

import pytest

# Streaming wiring e2e: full profile.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.plans.loader import (
    TOKEN_BUDGETS,
    corpus_mixture_token_budget,
)
from firefox_public_data_report_etl_spark.streaming.budgetgate import (
    budget_gate_batch,
    read_accepted,
    stream_budget_gate,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        (F.length("text") / 4).cast("long").alias("tokens"),
    )


def test_single_batch_equals_batch_filler(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    budget_gate_batch(
        spark, _docs(spark, sf_dir), store, TOKEN_BUDGETS, batch_id=0
    )
    got = {
        (r["doc_id"], r["lang"], r["tokens"])
        for r in read_accepted(spark, store).collect()
    }
    want = {
        (r["doc_id"], r["lang"], r["tokens"])
        for r in corpus_mixture_token_budget(spark, sf_dir).collect()
    }
    assert got == want and got


def test_cross_batch_conservation_and_exhaustion(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    waves = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, w in enumerate(waves):
        budget_gate_batch(spark, w, store, TOKEN_BUDGETS, batch_id=i)
    acc = read_accepted(spark, store).collect()
    by_lang: dict[str, int] = {}
    max_tok: dict[str, int] = {}
    for r in acc:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["tokens"]
        max_tok[r["lang"]] = max(max_tok.get(r["lang"], 0), r["tokens"])
    for s, b in TOKEN_BUDGETS.items():
        if s in by_lang:
            # start-inside rule: overrun bounded by one document per
            # WAVE boundary at most (each wave overruns its remaining
            # budget by at most its own last-taken doc)
            assert by_lang[s] < b + 3 * max_tok[s]
    # exhausted strata accept nothing in a later wave
    corpus_tokens = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang").agg(F.sum("tokens").alias("t")).collect()
    }
    for s, b in TOKEN_BUDGETS.items():
        if corpus_tokens.get(s, 0) > 2 * b:
            # budget genuinely binding: a 4th wave of fresh docs for
            # this stratum must be rejected entirely
            extra = spark.createDataFrame(
                [(10_000_000, s, 100)], "doc_id long, lang string, tokens long"
            )
            budget_gate_batch(spark, extra, store, TOKEN_BUDGETS, batch_id=3)
            after = read_accepted(spark, store).filter(
                F.col("doc_id") == 10_000_000
            )
            assert after.count() == 0
            break


def test_replay_identical(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    waves = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, w in enumerate(waves):
        budget_gate_batch(spark, w, store, TOKEN_BUDGETS, batch_id=i)
    before = sorted(
        (r["doc_id"], r["lang"]) for r in read_accepted(spark, store).collect()
    )
    budget_gate_batch(spark, waves[1], store, TOKEN_BUDGETS, batch_id=1)
    after = sorted(
        (r["doc_id"], r["lang"]) for r in read_accepted(spark, store).collect()
    )
    assert before == after


def test_crash_slice_invisible_until_replay(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_dir)
    w0 = docs.filter(F.col("doc_id") % 3 == 0)
    w1 = docs.filter(F.col("doc_id") % 3 == 1)
    budget_gate_batch(spark, w0, store, TOKEN_BUDGETS, batch_id=0)
    committed = read_accepted(spark, store).count()
    # simulate: batch 1 wrote accepted rows, crashed before meta
    crash = w1.limit(5).select(
        "doc_id", "lang", "tokens", F.lit(2).cast("long").alias("bl")
    )
    crash.write.partitionBy("bl").mode("append").parquet(f"{store}/accepted")
    assert read_accepted(spark, store).count() == committed
    budget_gate_batch(spark, w1, store, TOKEN_BUDGETS, batch_id=1)
    # healed: slice fully replaced by the deterministic recompute
    assert read_accepted(spark, store).count() >= committed


def test_stream_wiring(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    src = tmp_path / "src"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long, lang string, tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "store")
    q = stream_budget_gate(
        stream, store, str(tmp_path / "ckpt"), TOKEN_BUDGETS
    )
    q.awaitTermination(180)
    meta = spark.read.parquet(f"{store}/meta")
    assert meta.select("bl").distinct().count() == 3
    assert read_accepted(spark, store).count() > 0
