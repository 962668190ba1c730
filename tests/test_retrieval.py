"""Unit tests for the retrieval operators (BM25 + hybrid RRF).

The sf0.01 oracle hash pins cross-engine equality; these pin the
retrieval SEMANTICS on planted inputs: relevance ordering, stop-term
pruning, rank-fusion arithmetic, and partition invariance.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_bm25_ranks_shared_phrases_first(spark):
    from firefox_public_data_report_etl_spark.operators.text import bm25_topk

    # query doc 0 shares every bigram with doc 1, one bigram with
    # doc 2, none with doc 3 — BM25 must rank 1 over 2 and omit 3.
    docs = _docs(
        spark,
        [
            (0, "red fox jumps high today"),
            (1, "red fox jumps high today"),
            (2, "red fox sleeps low tonight"),
            (3, "uno dos tres cuatro cinco"),
        ],
    )
    out = bm25_topk(docs, query_mod=50, k=3).toPandas()
    assert list(out.q_id.unique()) == [0]
    ranked = out.sort_values("rank").doc_id.tolist()
    assert ranked[0] == 1
    assert 2 in ranked
    assert 3 not in ranked
    # the query doc never retrieves itself
    assert 0 not in ranked


def test_bm25_df_cap_drops_head_terms(spark):
    from firefox_public_data_report_etl_spark.operators.text import bm25_topk

    # "the cat" appears in every doc (head term); "rare gem" only in
    # the query doc and doc 1. With df capped at half the corpus the
    # head bigram contributes nothing, so doc 2 (head-term-only
    # overlap) retrieves nothing.
    docs = _docs(
        spark,
        [
            (0, "the cat rare gem"),
            (1, "the cat rare gem"),
            (2, "the cat zz yy"),
            (3, "the cat ww vv"),
        ],
    )
    out = bm25_topk(
        docs, query_mod=50, k=4, df_cap_num=1, df_cap_den=2
    ).toPandas()
    assert out.doc_id.tolist() == [1]


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    from firefox_public_data_report_etl_spark.operators.text import bm25_topk

    # same single matching bigram, one doc padded much longer: the
    # b=0.75 length normalization must rank the short doc first.
    pad = " ".join(f"w{i} w{i}x" for i in range(40))
    docs = _docs(
        spark,
        [
            (0, "rare gem alpha beta"),
            (1, "rare gem topic one"),
            (2, "rare gem " + pad),
        ],
    )
    out = bm25_topk(docs, query_mod=50, k=2).toPandas()
    first = out[out["rank"] == 1].doc_id.iloc[0]
    assert first == 1


def test_bm25_partition_invariance(spark, sf_dir):
    from firefox_public_data_report_etl_spark.operators.text import bm25_topk
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = bm25_topk(docs, query_mod=50, k=5).toPandas()
    b = bm25_topk(docs.repartition(7), query_mod=50, k=5).toPandas()
    key = ["q_id", "doc_id"]
    assert (
        a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True)
        )
    )


def test_rrf_fusion_arithmetic(spark, sf_dir):
    """rrf_fp must equal the sum of floor(1e6/(60+rank)) over the
    lists the doc appears in, recomputed from the output's own rank
    columns; docs in both lists must outrank equal-rank docs in one."""
    from firefox_public_data_report_etl_spark.plans.similarity import (
        retrieval_hybrid_rrf,
    )

    out = retrieval_hybrid_rrf(spark, sf_dir).toPandas()
    assert len(out)

    def contrib(r):
        return 0 if r != r else 1_000_000 // (60 + int(r))  # NaN-safe

    recomputed = out.apply(
        lambda row: contrib(row.bm25_rank) + contrib(row.cos_rank), axis=1
    )
    assert (recomputed == out.rrf_fp).all()
    # within a query, ranks are 1..k dense and ordered by rrf desc
    for _, g in out.groupby("q_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert g.rrf_fp.is_monotonic_decreasing


def test_bm25_idf_is_table_grain(spark):
    """Two docs with the same matching term must see the same idf:
    score ratio reduces to the tf-saturation ratio (here equal tf and
    dl → identical integer scores), pinning that idf is quantized
    once at the df table, not per posting."""
    from firefox_public_data_report_etl_spark.operators.text import bm25_topk

    docs = _docs(
        spark,
        [
            (0, "rare gem alpha beta"),
            (1, "rare gem one two"),
            (2, "rare gem six ten"),
        ],
    )
    out = bm25_topk(docs, query_mod=50, k=3).toPandas()
    scores = out[out.doc_id.isin([1, 2])].score_fp.unique()
    assert len(scores) == 1


def test_retrieval_eval_ann_invariants(spark, sf_dir):
    # metric ranges, hit consistency, and the perfect-retrieval bound:
    # rr_milli = 1000 requires the true NN to be hit at approx rank 1
    from firefox_public_data_report_etl_spark.plans.similarity import (
        TOP_K,
        retrieval_eval_ann,
    )

    rows = retrieval_eval_ann(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_truth <= TOP_K
        assert 0 <= r.n_hits <= r.n_truth
        assert r.recall_ppm == (1_000_000 * r.n_hits) // r.n_truth
        assert r.rr_milli in (0,) or 1000 // TOP_K <= r.rr_milli <= 1000
        if r.rr_milli == 1000:
            assert r.n_hits >= 1
        if r.n_hits == 0:
            assert r.rr_milli == 0


def test_retrieval_eval_ann_perfect_on_degenerate_codebook(spark):
    # one coarse cell (every vector assigned to the single centroid)
    # makes IVF == brute force, so the harness must report perfect
    # recall and rr for every query — the self-consistency anchor
    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark.operators.similarity import (
        cosine_topk,
    )
    from firefox_public_data_report_etl_spark.operators.vectorized import (
        cosine_topk_ivf,
    )

    rows = [
        (i, [((i * 13 + d * 7) % 19) + 1 for d in range(8)])
        for i in range(1, 40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, q array<bigint>"
    ).withColumn(
        "norm",
        F.expr("aggregate(transform(q, x -> x * x), 0L, (s, v) -> s + v)"),
    )
    k = 3
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    truth = cosine_topk(queries, emb, k).select(
        "q_id", "n_id", F.col("rank").alias("t_rank")
    )
    # centroid_mod chosen so exactly one vector (vec_id=1) seeds a cell
    approx = cosine_topk_ivf(emb, k, 10, 1_000_000).select(
        "q_id", "n_id", F.col("rank").alias("a_rank")
    )
    j = truth.join(approx, ["q_id", "n_id"], "left").collect()
    assert j
    assert all(r.a_rank == r.t_rank for r in j)
