"""Fused single-stage tokenizer trainers (round 12): the Arrow-task
merge/EM loop must produce artifacts BIT-EQUAL to the distributed
per-round loop — same merge choices, tie-breaks, weighted counts, and
piece lists — and must refuse loudly past the word-type cap.

The replace-semantics property both BPE paths rely on (consecutive
occurrences merge in one pass: "aaaa" -> (aa)(aa)) is pinned here for
the fused path too; corpus-level parity with the DuckDB unrolled
oracles is covered by the registry gate (bpe_merge_table,
bpe_encode_corpus, unigram_vocab_table, ...)."""

from __future__ import annotations

import pytest

from firefox_public_data_report_etl_spark.operators.text import (
    bpe_train,
    unigram_train,
)
from firefox_public_data_report_etl_spark.sources import load_table


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _merges(df):
    return sorted(map(tuple, df.collect()))


def test_bpe_fused_equals_distributed_smoke(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert _merges(bpe_train(docs, fused=True)) == _merges(
        bpe_train(docs, fused=False)
    )


def test_bpe_fused_consecutive_runs_merge_in_one_pass(spark):
    # "aaaa" must count/merge as (aa)(aa), never skip alternate pairs
    docs = _mk_docs(spark, ["aaaa aaaa b", "aaaa"])
    f = _merges(bpe_train(docs, n_merges=3, fused=True))
    d = _merges(bpe_train(docs, n_merges=3, fused=False))
    assert f == d
    # first merge is (a, a): counting sees ALL adjacent pairs (3 per
    # "aaaa", x3 occurrences = 9); only the APPLICATION is
    # non-overlapping, which the second-round merges then exercise
    assert f[0][1:] == ("a", "a", 9)


def test_bpe_fused_tie_break_lexicographic(spark):
    # "ba" and "ab" pairs tie on count; (a, b) must win on (l, r) asc
    docs = _mk_docs(spark, ["ab ba"])
    f = _merges(bpe_train(docs, n_merges=1, fused=True))
    d = _merges(bpe_train(docs, n_merges=1, fused=False))
    assert f == d
    assert f[0][1:3] == ("a", "b")


def test_unigram_fused_equals_distributed_smoke(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert unigram_train(docs, fused=True) == unigram_train(
        docs, fused=False
    )


def test_unigram_fused_equals_distributed_synthetic(spark):
    texts = ["the the cat cat cat", "concatenate the cats", "a ab abc"]
    docs = _mk_docs(spark, texts)
    for rounds in (1, 3):
        assert unigram_train(docs, rounds=rounds, fused=True) == (
            unigram_train(docs, rounds=rounds, fused=False)
        )


def test_emit_alphabet_matches_apply_recompute(spark, sf_dir):
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_apply,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = bpe_train(docs, emit_alphabet=True).collect()
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(
            (r for r in rows if r["step"] >= 0), key=lambda r: r["step"]
        )
    ]
    alphabet = [r["left_sym"] for r in rows if r["step"] < 0]
    # the merge rows are the default output, unchanged
    assert [tuple(r) for r in rows if r["step"] >= 0] == [
        tuple(r) for r in bpe_train(docs).collect()
    ]
    # encode with the riding alphabet == encode that recomputes it
    with_a = sorted(
        map(tuple, bpe_apply(docs, merges, alphabet=alphabet).collect())
    )
    without = sorted(map(tuple, bpe_apply(docs, merges).collect()))
    assert with_a == without


def test_fused_cap_raises_loudly(spark, monkeypatch):
    import firefox_public_data_report_etl_spark.operators.text as T

    monkeypatch.setattr(T, "_FUSED_VOCAB_CAP", 2)
    docs = _mk_docs(spark, ["one two three four"])
    with pytest.raises(Exception, match="_FUSED_VOCAB_CAP"):
        bpe_train(docs, fused=True).collect()
    with pytest.raises(Exception, match="_FUSED_VOCAB_CAP"):
        unigram_train(docs, fused=True)


def test_token_counts_equal_full_encode_rollup(spark, sf_dir):
    """The counts-only reductions (round 12, guide §2.3) must count
    exactly the rows the full encoders emit — per document, for both
    tokenizer families. This is the invariant the fertility/packing
    rewires stand on."""
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_apply,
        bpe_token_counts,
        unigram_apply,
        unigram_token_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs).orderBy("step").collect()
    ]
    full_b = {
        r["doc_id"]: r["n"]
        for r in bpe_apply(docs, merges)
        .groupBy("doc_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    cnt_b = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert cnt_b == full_b

    pieces = unigram_train(docs)
    full_u = {
        r["doc_id"]: r["n"]
        for r in unigram_apply(docs, pieces)
        .groupBy("doc_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    cnt_u = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_token_counts(docs, pieces).collect()
    }
    assert cnt_u == full_u


def test_empty_words_agree_across_encode_paths(spark):
    """Round-13 advisor fix: documents with consecutive / leading /
    trailing spaces produce EMPTY words, which must encode to zero
    tokens on every path — the counts-only reduction, the plain
    encode, and the encode with a trainer-supplied alphabet (the
    plans' fused path). Before the fix, the counts path charged 2
    separator artifacts per empty word while the alphabet-joined
    encode dropped them (and the auto-derived alphabet picked up ''
    as a phantom character)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_apply,
        bpe_token_counts,
        unigram_apply,
        unigram_token_counts,
    )

    docs = _mk_docs(spark, ["ab ab  ba ", " ab", "  "])
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs).orderBy("step").collect()
    ]
    alphabet = sorted({c for t in ["ab", "ba"] for c in t})
    rollup = lambda df: {
        r["doc_id"]: r["count"]
        for r in df.groupBy("doc_id").count().collect()
    }
    full = rollup(bpe_apply(docs, merges))
    full_alpha = rollup(bpe_apply(docs, merges, alphabet=alphabet))
    cnt = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert full == full_alpha
    # the all-spaces doc encodes to zero tokens => absent from every
    # rollup; docs with real words agree row-for-row
    assert cnt == full
    assert set(full) == {0, 1}  # doc 2 ("  ") emits nothing

    pieces = unigram_train(docs)
    full_u = rollup(unigram_apply(docs, pieces))
    cnt_u = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_token_counts(docs, pieces).collect()
    }
    assert cnt_u == full_u
