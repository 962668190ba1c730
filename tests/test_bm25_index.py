"""Persisted BM25 postings index (operators/bm25_index.py — the fifth
index lifecycle): probe == the in-query `bm25_topk` bit-exactly,
appends recombine to a from-scratch rebuild (df / N / S all
recompose), replayed appends are idempotent, and the probe reads only
the partitions the query terms touch."""

from __future__ import annotations

import pytest

# Index-lifecycle e2e: full profile (corpus_bm25_probe's parity row exercises build+probe in the fast profile).
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.bm25_index import (
    append_to_bm25_index,
    bm25_topk_against_index,
    build_bm25_index,
)
from firefox_public_data_report_etl_spark.operators.text import bm25_topk
from firefox_public_data_report_etl_spark.sources import load_table

QUERY_MOD = 50
K = 5


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(
        (r.q_id, r.doc_id, r.score_fp, r.rank) for r in df.collect()
    )


@pytest.mark.full
def test_probe_equals_in_query_form(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "bm25idx")
    build_bm25_index(docs, path)
    queries = docs.filter(F.col("doc_id") % QUERY_MOD == 0)
    got = bm25_topk_against_index(spark, path, queries, k=K)
    want = bm25_topk(docs, query_mod=QUERY_MOD, k=K)
    assert _rows(got) == _rows(want)
    assert _rows(got), "fixture must retrieve something"


@pytest.mark.full
def test_append_recombines_to_rebuild(spark, sf_dir, tmp_path):
    """base-built index + appended batch scores EXACTLY like an index
    built from scratch over the union: df comes from the touched
    partitions of all labels, N and S from summing the per-label
    stats slices — the module's exactness contract."""
    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    inc = str(tmp_path / "inc")
    build_bm25_index(base, inc)
    append_to_bm25_index(spark, inc, batch, 1)
    # replayed append (crash retry) must be idempotent
    append_to_bm25_index(spark, inc, batch, 1)
    queries = docs.filter(F.col("doc_id") % QUERY_MOD == 0)
    got = bm25_topk_against_index(spark, inc, queries, k=K)
    want = bm25_topk(docs, query_mod=QUERY_MOD, k=K)
    assert _rows(got) == _rows(want)


def test_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The posting scan must carry a pb partition filter (the probe
    reads touched buckets, not the index)."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "prune")
    build_bm25_index(docs, path)
    one_query = docs.filter(F.col("doc_id") == 0)
    out = bm25_topk_against_index(spark, path, one_query, k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pb" in plan
    assert out.count() > 0
    # empty query set -> typed empty frame, no scan at all
    empty = bm25_topk_against_index(
        spark, path, docs.filter(F.col("doc_id") < 0), k=K
    )
    assert empty.count() == 0
    assert dict(empty.dtypes) == {
        "q_id": "bigint", "doc_id": "bigint",
        "score_fp": "bigint", "rank": "bigint",
    }
