"""Unigram-LM tokenizer (round 9, r8 verdict #4): greedy-segmenter
semantics, the measured training fixed point, and vocabulary
contracts. Corpus-level training/encoding parity is oracle-checked
by `unigram_vocab_table` / `unigram_encode_corpus` /
`tokenizer_fertility_ab`; these pin the pieces SQL cannot."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.text import (
    UNIGRAM_MAX_PIECE,
    _greedy_pieces,
    unigram_apply,
    unigram_train,
)
from firefox_public_data_report_etl_spark.sources import load_table


def test_greedy_longest_match_first():
    pieces = {"ab", "abc", "cd", "d"}
    # longest match wins at each position; single chars always cover
    assert _greedy_pieces("abcd", pieces, 4) == ["abc", "d"]
    assert _greedy_pieces("abd", pieces, 4) == ["ab", "d"]
    # max_piece caps the lookahead even when a longer piece exists
    assert _greedy_pieces("abcd", pieces, 2) == ["ab", "cd"]
    # chars outside the piece set still segment (coverage fallback)
    assert _greedy_pieces("xyz", pieces, 4) == ["x", "y", "z"]
    assert _greedy_pieces("", pieces, 4) == []


def test_training_reaches_fixed_point(spark, sf_dir):
    """On the smoke corpus the vocabulary stops changing after round
    1 (226 -> 59 pieces, measured); later rounds must be no-ops —
    the fixed point the docstrings claim."""
    docs = load_table(spark, sf_dir, "documents")
    p1 = unigram_train(docs, rounds=1)
    p3 = unigram_train(docs, rounds=3)
    assert p1 == p3
    assert len(p3) > 26  # multi-char pieces actually survive
    # every corpus character is retained (coverage invariant)
    chars = {
        r["ch"]
        for r in docs.select(
            F.explode(F.split("text", "")).alias("ch")
        )
        .filter(F.col("ch") != " ")
        .distinct()
        .collect()
    }
    assert chars <= set(p3)
    assert all(len(p) <= UNIGRAM_MAX_PIECE for p in p3)


def test_apply_round_trips_words(spark, sf_dir):
    """Concatenating each word's pieces in sub_pos order must
    reconstruct the word exactly — segmentation is a partition, not
    an approximation."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    pieces = unigram_train(load_table(spark, sf_dir, "documents"))
    enc = unigram_apply(docs, pieces)
    # sub_pos order enforced by array_sort over (sub_pos, piece)
    # structs — collect_list order is not otherwise guaranteed
    rebuilt = (
        enc.groupBy("doc_id", "word_pos")
        .agg(F.collect_list(F.struct("sub_pos", "piece")).alias("ps"))
        .select(
            "doc_id",
            "word_pos",
            F.expr(
                "array_join(transform(array_sort(ps), s -> s.piece), '')"
            ).alias("w"),
        )
    )
    words = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("word_pos", "w0"),
    )
    joined = rebuilt.join(words, ["doc_id", "word_pos"])
    assert joined.filter(F.col("w") != F.col("w0")).count() == 0
    assert joined.count() == words.count()
