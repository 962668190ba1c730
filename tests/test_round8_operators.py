"""Unit tests for round-8 additions: DSIR weights, Gopher rules,
snapshot diff, source overlap, curriculum ordering.

Each test pins a semantic invariant the sf0.01 oracle hash can't
express on its own (edge cases absent from the testdata, or
properties that must hold at ANY input)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


def test_dsir_weights_separate_target_from_background(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        dsir_weights,
    )

    # target docs share a vocabulary disjoint from background docs —
    # the importance weight must rank every target doc above every
    # background doc, and the threshold must select exactly the
    # target-like ones.
    rows = [
        Row(doc_id=i, text="alpha beta gamma delta epsilon zeta", grp="t")
        for i in range(6)
    ] + [
        Row(doc_id=100 + i, text="uno dos tres cuatro cinco seis", grp="b")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows)
    out = dsir_weights(docs, F.col("grp") == "t").join(
        docs.select("doc_id", "grp"), "doc_id"
    )
    pdf = out.toPandas().set_index("doc_id")
    t_scores = pdf[pdf.grp == "t"].lw_per_feat
    b_scores = pdf[pdf.grp == "b"].lw_per_feat
    assert t_scores.min() > b_scores.max()
    assert bool(pdf[pdf.grp == "t"].selected.all())
    assert not bool(pdf[pdf.grp == "b"].selected.any())


def test_dsir_weights_empty_target_raises(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        dsir_weights,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError, match="target predicate"):
        dsir_weights(docs, F.lit(False)).collect()


def test_gopher_rules_flag_degenerate_docs(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        GOPHER_MIN_WORDS,
        gopher_rules,
    )

    good = " ".join(
        ["the quick brown fox jumps over a lazy dog tonight"] * 3
    )  # 30 words, stopwords present, varied
    short = "the a dog"  # under the word-count floor
    repetitive = " ".join(["spam"] * 40)  # modal dominance 1.0, no stopwords
    symbols = " ".join(["@#$%"] * 30)  # symbol ratio >> cap
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=short),
            Row(doc_id=3, text=repetitive),
            Row(doc_id=4, text=symbols),
        ]
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_word_count"] and not out[2]["keep"]
    assert out[2]["n_tokens"] < GOPHER_MIN_WORDS
    assert not out[3]["ok_dominance"] and not out[3]["ok_distinct_ratio"]
    assert not out[3]["ok_stopwords"] and not out[3]["keep"]
    assert not out[4]["ok_symbol_ratio"] and not out[4]["keep"]


def test_snapshot_diff_statuses(spark):
    from firefox_public_data_report_etl_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="before"),
         Row(doc_id=3, text="gone")]
    )
    new = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="after"),
         Row(doc_id=4, text="fresh")]
    )
    st = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert st == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_source_overlap_is_symmetric_in_content(spark, sf_dir):
    # overlap(src_a, src_b) must not depend on row order / partitioning:
    # recompute on a repartitioned shuffle of the input and compare.
    from firefox_public_data_report_etl_spark.plans.dedup import (
        source_overlap_matrix,
    )

    a = source_overlap_matrix(spark, sf_dir).toPandas()
    assert (a.source_a < a.source_b).all()
    assert ((a.overlap > 0) & (a.overlap <= 1.0)).all()
    assert (a.n_shared <= a[["n_grams_a", "n_grams_b"]].min(axis=1)).all()


def test_curriculum_positions_are_dense_per_shard(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.text import (
        CURRICULUM_SHARDS,
        curriculum_shards,
    )

    pdf = curriculum_shards(spark, sf_dir).toPandas()
    assert set(pdf.shard.unique()) <= set(range(CURRICULUM_SHARDS))
    for _, g in pdf.groupby("shard"):
        # positions are 1..n dense, and the ordering key is honored
        assert sorted(g.curriculum_pos) == list(range(1, len(g) + 1))
        ordered = g.sort_values("curriculum_pos")
        assert (ordered.lm_per_token.diff().dropna() <= 1e-12).all()


def test_training_shard_export_roundtrip(spark, sf_dir, tmp_path):
    """write_training_shards lands partition-pruned shards whose
    read-back manifest equals the one computed from the source frame
    (and re-running the writer is idempotent)."""
    from firefox_public_data_report_etl_spark.sources import load_table
    from firefox_public_data_report_etl_spark.sources.export import (
        training_manifest,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    m1 = {r["shard"]: r for r in write_training_shards(docs, path).collect()}
    back = spark.read.parquet(path)
    m2 = {
        r["shard"]: r
        for r in training_manifest(back.drop("shard")).collect()
    }
    assert m1.keys() == m2.keys()
    for s in m1:
        for c in ("n_docs", "n_tokens", "content_fp"):
            assert m1[s][c] == m2[s][c], (s, c)
    # shard column is a physical partition (prunable directory)
    import os

    assert any(d.startswith("shard=") for d in os.listdir(path))
    # idempotent re-run: same manifest
    m3 = {r["shard"]: r for r in write_training_shards(docs, path).collect()}
    assert {s: m3[s]["content_fp"] for s in m3} == {
        s: m1[s]["content_fp"] for s in m1
    }


def test_training_manifest_partition_invariant(spark, sf_dir):
    """The manifest fingerprint is an order-independent integer sum:
    any repartitioning of the input must reproduce it exactly."""
    from firefox_public_data_report_etl_spark.sources import load_table
    from firefox_public_data_report_etl_spark.sources.export import (
        training_manifest,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = {r["shard"]: r for r in training_manifest(docs).collect()}
    b = {
        r["shard"]: r
        for r in training_manifest(docs.repartition(7)).collect()
    }
    assert a.keys() == b.keys()
    for s in a:
        for c in ("n_docs", "n_tokens", "content_fp"):
            assert a[s][c] == b[s][c]


def test_datasheet_shares_sum_to_one(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.text import (
        corpus_datasheet,
    )

    rows = {r["metric"]: r["value"] for r in corpus_datasheet(spark, sf_dir).collect()}
    shares = [v for m, v in rows.items() if m.startswith("lang_share:")]
    assert abs(sum(shares) - 1.0) < 1e-9
    assert rows["n_docs"] > 0 and 0 <= rows["exact_dup_rate"] <= 1
    assert 0 <= rows["gopher_keep_rate"] <= 1


def test_nb_classifier_separates_planted_classes(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        nb_quality_classifier,
    )

    # hq docs share a vocabulary disjoint from lq docs, ids spread so
    # the hash split puts some of each class in train AND held-out —
    # every held-out doc must be classified correctly.
    rows = [
        Row(doc_id=i, text="alpha beta gamma delta epsilon zeta", src="hq")
        for i in range(40)
    ] + [
        Row(doc_id=1000 + i, text="uno dos tres cuatro cinco seis", src="lq")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows)
    out = nb_quality_classifier(docs, F.col("src") == "hq").toPandas()
    assert len(out) > 0
    assert set(out.split) <= {"val", "test"}  # train never scored
    assert bool(out.correct.all())
    # margins are strictly signed by class
    assert out[out.is_hq].margin_fp.min() > 0
    assert out[~out.is_hq].margin_fp.max() < 0


def test_nb_classifier_single_class_raises(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        nb_quality_classifier,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="a b c", src="x") for i in range(20)]
    )
    with pytest.raises(ValueError, match="single class"):
        nb_quality_classifier(docs, F.col("src") == "x").collect()


def test_hashproj_embeddings_shape_and_norm(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        HASHPROJ_DIM,
        hashproj_embeddings,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="red green blue"),
            Row(doc_id=2, text="red green blue"),
            Row(doc_id=3, text="one two three four"),
        ]
    )
    out = hashproj_embeddings(docs).toPandas().set_index("doc_id")
    assert all(len(q) == HASHPROJ_DIM for q in out.q)
    for _, r in out.iterrows():
        assert r["norm"] == sum(int(x) * int(x) for x in r["q"])
    # identical text -> identical embedding (pure function of content)
    assert list(out.loc[1, "q"]) == list(out.loc[2, "q"])
    # different text -> different embedding (collision would need all
    # 16 signed sums to coincide)
    assert list(out.loc[1, "q"]) != list(out.loc[3, "q"])


def test_hashproj_retrieval_finds_planted_near_copy(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        hashproj_embeddings,
    )
    from firefox_public_data_report_etl_spark.operators.vectorized import (
        cosine_topk_matmul,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [Row(doc_id=0, text=base), Row(doc_id=1, text=base + " today")]
    rows += [
        Row(doc_id=10 + i, text=f"totally unrelated words number{i} filler{i}")
        for i in range(8)
    ]
    emb = hashproj_embeddings(spark.createDataFrame(rows)).cache()
    queries = emb.filter(F.col("doc_id") == 0)
    top = (
        cosine_topk_matmul(queries, emb, 1, id_col="doc_id")
        .toPandas()
        .iloc[0]
    )
    assert top.n_id == 1  # the near-copy wins rank 1
    assert top.cos > 0.9


def test_key_skew_audit_measures_planted_hot_key(spark):
    from firefox_public_data_report_etl_spark.operators.skew import (
        key_skew_audit,
    )

    # one key with 60 rows, 20 keys with 2 rows: mean = 100/21,
    # suggested_salt = 60*21 // 100 = 12
    rows = [Row(k="hot")] * 60 + [Row(k=f"c{i}") for i in range(20) for _ in range(2)]
    out = key_skew_audit(spark.createDataFrame(rows), "k", k=3).toPandas()
    assert len(out) == 3
    top = out[out["rank"] == 1].iloc[0]
    assert top.key == "hot" and top.cnt == 60
    assert top.n_rows == 100 and top.n_keys == 21 and top.max_cnt == 60
    assert top.suggested_salt == 12
    # uniform data suggests no salting
    uni = key_skew_audit(
        spark.createDataFrame([Row(k=f"c{i}") for i in range(10) for _ in range(5)]),
        "k",
        k=2,
    ).toPandas()
    assert (uni.suggested_salt == 1).all()


def test_key_skew_audit_topk_is_take_ordered(spark):
    """The top-K must compile to TakeOrderedAndProject (per-partition
    partial top-K), not a global sort."""
    from firefox_public_data_report_etl_spark.plans.quality import (
        key_skew_audit_events,
    )

    df = key_skew_audit_events(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rag_chunks_overlap_neighbor_wins(spark, tmp_path):
    """A long document's chunk 0 shares CHUNK_TOKENS-CHUNK_STRIDE
    overlap tokens with its own chunk 1 — in the shared chunk vector
    space that sibling must out-rank chunks of unrelated documents."""
    import shutil

    from firefox_public_data_report_etl_spark.plans.text import (
        CHUNK_TOKENS,
        CHUNK_STRIDE,
        RAG_CID_BASE,
        retrieval_rag_chunks,
    )

    # build a tiny corpus parquet: doc 0 long (2 chunks) with a
    # 16-token periodic vocabulary, so its two chunks carry IDENTICAL
    # bags (cosine ~1 — well above the D=16 projection noise floor
    # of ~1/sqrt(16) that a mere stride-overlap signal sits inside)
    long_text = " ".join(
        f"tok{i % 16}" for i in range(CHUNK_TOKENS + CHUNK_STRIDE)
    )
    rows = [Row(doc_id=0, text=long_text, lang="en", source="src0",
                n_chars=len(long_text))]
    for i in range(1, 8):
        t = " ".join(f"other{i}w{j}" for j in range(30))
        rows.append(Row(doc_id=i, text=t, lang="en", source="src1",
                        n_chars=len(t)))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows).coalesce(1).write.parquet(
        str(sf / "documents.parquet")
    )
    out = retrieval_rag_chunks(spark, str(sf)).toPandas()
    q0 = out[out.q_id == 0].sort_values("rank")
    assert len(q0) > 0
    # rank 1 for doc 0 chunk 0 is doc 0 chunk 1 (cid = 0*BASE + 1)
    assert q0.iloc[0].n_id == 1
    assert q0.iloc[0].cos > 0.99


def test_repeated_substring_spans_exact_boundaries(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        SUBSTR_GRAM,
        repeated_substring_spans,
    )

    k = SUBSTR_GRAM
    shared = [f"s{i}" for i in range(15)]  # 15-token shared phrase
    a = [f"a{i}" for i in range(5)] + shared + [f"a{i}" for i in range(5, 17)]
    b = [f"b{i}" for i in range(9)] + shared + [f"b{i}" for i in range(9, 14)]
    c = [f"c{i}" for i in range(30)]  # all-unique
    # d repeats ITS OWN 12-token run twice (self-repetition counts)
    run = [f"d{i}" for i in range(12)]
    d = run + ["mid1", "mid2", "mid3"] + run
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(a)),
            Row(doc_id=2, text=" ".join(b)),
            Row(doc_id=3, text=" ".join(c)),
            Row(doc_id=4, text=" ".join(d)),
        ]
    )
    out = repeated_substring_spans(docs, k=k).toPandas()
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in out.itertuples()
    }
    # the shared phrase: doc 1 at tokens 6..20, doc 2 at 10..24
    assert (1, 6, 20, 15) in spans
    assert (2, 10, 24, 15) in spans
    # doc 4's self-repeated 12-token run at both occurrences
    assert (4, 1, 12, 12) in spans
    assert (4, 16, 27, 12) in spans
    # nothing else — in particular no spans for the all-unique doc
    assert len(spans) == 4


def test_substring_scrub_keep_first_policy(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        SUBSTR_GRAM,
        substring_scrub,
    )

    k = SUBSTR_GRAM
    shared = [f"s{i}" for i in range(k)]  # exactly one k-gram
    a = [f"a{i}" for i in range(3)] + shared + ["a_tail"]
    b = [f"b{i}" for i in range(5)] + shared + ["b_tail"]
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(a)), Row(doc_id=2, text=" ".join(b))]
    )
    out = substring_scrub(docs, k=k).toPandas().set_index("doc_id")
    # doc 1 holds the first occurrence: untouched
    assert out.loc[1, "n_dropped"] == 0
    assert out.loc[1, "scrubbed_text"] == " ".join(a)
    # doc 2's copy is foreign: exactly the k covered tokens drop,
    # surrounding text survives byte-exactly
    assert out.loc[2, "n_dropped"] == k
    assert out.loc[2, "scrubbed_text"] == " ".join(
        [f"b{i}" for i in range(5)] + ["b_tail"]
    )


def test_substring_scrub_second_pass_is_clean(spark, sf_dir):
    """After one scrub pass the corpus contains no foreign k-grams:
    re-running detection on the scrubbed text finds no spans that
    cross documents (the keep-first copy remains, so self-contained
    repeats inside one surviving span may legally remain)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        repeated_substring_spans,
        substring_scrub,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    scrubbed = substring_scrub(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", F.col("scrubbed_text").alias("text"))
    # grams appearing in >1 distinct doc after the scrub = leakage
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.text import (
        SUBSTR_GRAM as K,
    )

    d = scrubbed.select(
        "doc_id", F.split("text", " ").alias("t")
    ).withColumn("n", F.size("t"))
    grams = (
        d.filter(F.col("n") >= K)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, n - {K} + 1)")).alias("pos"),
            "t",
        )
        .select(
            "doc_id",
            F.expr(md5_int_spark_sql(f"concat_ws(' ', slice(t, pos, {K}))")).alias("h"),
        )
    )
    cross_doc = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .count()
    )
    assert cross_doc == 0


def test_multimodal_caption_retrieval_truth(spark, sf_dir):
    # matched captions must retrieve their OWN image at rank 1;
    # planted-mismatch captions must retrieve the image they actually
    # DESCRIBE (media_id + CAP_MIS_OFFSET) at rank 1 whenever that
    # image exists — truth_rank 0 is legal only at the corpus edge
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        CAP_MIS_MOD,
        CAP_MIS_RES,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_caption_retrieval,
    )

    ids = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    rows = multimodal_caption_retrieval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.cap_id % CAP_MIS_MOD != CAP_MIS_RES:
            assert r.truth_media == r.cap_id
            assert r.truth_rank == 1 and r.top1_is_truth
        elif r.truth_media in ids:
            assert r.truth_rank == 1, (r.cap_id, r.truth_rank)
        else:
            assert r.truth_rank == 0
