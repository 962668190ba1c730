"""Round-7 operators: C4 span-grain dedup and CCNet-style LM scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.text import (
    dedup_line_spans,
    lm_unigram_scores,
)


def test_dedup_line_spans_drops_late_exact_duplicate(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "a b c d e f g h i j k l"),  # exact dup: loses all spans
            (3, "x y z a b c d e f g h i j q r s"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_line_spans(docs).collect()}
    assert rows[1]["text_dedup"] == "a b c d e f g h i j k l"
    assert rows[1]["n_spans"] == 2 and rows[1]["n_kept"] == 2
    # the late exact duplicate survives as a row but keeps nothing
    assert rows[2]["n_kept"] == 0 and rows[2]["text_dedup"] == ""
    # doc 3's spans differ from doc 1's (different 10-token windows),
    # so it keeps everything, reassembled in order
    assert rows[3]["text_dedup"] == "x y z a b c d e f g h i j q r s"


def test_dedup_line_spans_mid_doc_span_removed_in_order(spark) -> None:
    # doc 20's SECOND span equals doc 10's first span exactly;
    # reassembly must keep doc 20's other spans in original order
    first = "p q r s t u v w x y"
    docs = spark.createDataFrame(
        [
            (10, first + " aa bb cc dd ee ff gg hh ii jj"),
            (20, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 " + first + " z1 z2 z3"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_line_spans(docs).collect()}
    assert rows[20]["n_spans"] == 3 and rows[20]["n_kept"] == 2
    assert rows[20]["text_dedup"] == "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 z1 z2 z3"


def test_lm_scores_partition_order_invariant(spark) -> None:
    """The fixed-point contract's point: integer munat sums must be
    bit-identical regardless of how the token stream is partitioned
    (a double sum-of-ln would drift with partition order)."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} common common w{i % 11}") for i in range(200)],
        "doc_id long, text string",
    )
    ref = F.col("doc_id") % 10 < 8
    a = {
        r["doc_id"]: (r["score_munats"], r["oov"])
        for r in lm_unigram_scores(docs.repartition(1), ref).collect()
    }
    b = {
        r["doc_id"]: (r["score_munats"], r["oov"])
        for r in lm_unigram_scores(
            docs.repartition(16, "doc_id"), ref
        ).collect()
    }
    assert a == b and len(a) == 200


def test_lm_scores_fluency_ordering_and_oov_floor(spark) -> None:
    docs = spark.createDataFrame(
        [
            (0, "common common common common"),   # high-frequency tokens
            (1, "common rare1 common common"),
            (2, "zz1 zz2 zz3 zz4"),               # OOV-only (not in ref)
        ]
        + [(i, "common common common rare1") for i in range(10, 90)],
        "doc_id long, text string",
    )
    # ref slice excludes doc 2's tokens entirely
    out = {
        r["doc_id"]: r
        for r in lm_unigram_scores(
            docs, F.col("doc_id") != 2
        ).collect()
    }
    assert out[2]["oov"] == 4
    # every score is a negative integer; fluency orders 0 > 1 > 2
    per = {k: v["score_munats"] / v["n_tokens"] for k, v in out.items()}
    assert per[0] > per[1] > per[2]
    assert all(v["score_munats"] < 0 for v in out.values())


def test_bigram_separates_word_order_where_unigram_ties(spark) -> None:
    """The bigram model's reason to exist: a document with reference
    word ORDER must outscore its shuffled permutation, while the
    unigram model (bag of words) ties them exactly."""
    from firefox_public_data_report_etl_spark.operators.text import (
        lm_bigram_scores,
    )

    ref_rows = [(i, "the cat sat on the mat") for i in range(100)]
    docs = spark.createDataFrame(
        ref_rows
        + [
            (1000, "the cat sat on the mat"),   # reference order
            (1001, "mat the on sat cat the"),   # same bag, shuffled
        ],
        "doc_id long, text string",
    )
    ref = F.col("doc_id") < 100
    uni = {
        r["doc_id"]: r["score_munats"]
        for r in lm_unigram_scores(docs, ref).collect()
    }
    bi = {
        r["doc_id"]: r["score_munats"]
        for r in lm_bigram_scores(docs, ref).collect()
    }
    assert uni[1000] == uni[1001]   # unigram cannot see order
    assert bi[1000] > bi[1001]      # bigram can


def test_bpe_greedy_application_and_chaining(spark) -> None:
    """'aaaa': greedy left-to-right application must fuse (a,a) into
    (aa)(aa) — 3 adjacent pairs counted per word pre-merge, and the
    MERGED symbol participates in the next round as a unit."""
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(i, "aaaa") for i in range(3)], "doc_id long, text string"
    )
    merges = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2).collect()
    ]
    assert merges == [(0, "a", "a", 9), (1, "aa", "aa", 3)]


def test_bpe_boundary_separators_prevent_suffix_matches(spark) -> None:
    """After merging (a,b), the word 'cab' must hold symbols (c, ab) —
    a replace without boundary separators would have matched the 'a␟b'
    inside 'c␟a␟b' correctly but, in later rounds, a pattern like
    'b␟x' could match inside a multi-char symbol ending in b; the
    boundary-separator representation makes that structurally
    impossible, observable here as round 1 finding (c, ab)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_train,
    )

    rows = [(i, "ab") for i in range(10)] + [(100 + i, "cab") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2).collect()
    ]
    assert merges == [(0, "a", "b", 15), (1, "c", "ab", 5)]


def test_bpe_stops_when_no_pairs_remain(spark) -> None:
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(0, "ab ab")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=10).collect()
    # round 0 fuses (a,b); afterwards every word is a single symbol —
    # no pairs exist and the loop stops instead of emitting junk
    assert len(merges) == 1
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "b")


def test_bpe_apply_tokens_and_ids(spark) -> None:
    """bpe_apply must segment exactly as the trainer's replace chain
    (shared _bpe_sym_expr) and number the vocabulary base-chars-
    sorted-first then merges-by-step: corpus 'abab ab cd' with
    merges [(a,b), (ab,ab)] → chars a,b,c,d = 0..3, 'ab' = 4,
    'abab' = 5; 'cd' stays two base tokens."""
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_apply,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(0, "abab ab cd"), (1, "abab")], "doc_id long, text string"
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=2).orderBy("step").collect()
    ]
    assert merges == [("a", "b"), ("ab", "ab")]
    rows = {
        (r["doc_id"], r["word_pos"], r["sub_pos"]): (
            r["token"],
            r["token_id"],
        )
        for r in bpe_apply(docs, merges).collect()
    }
    assert rows == {
        (0, 0, 0): ("abab", 5),
        (0, 1, 0): ("ab", 4),
        (0, 2, 0): ("c", 2),
        (0, 2, 1): ("d", 3),
        (1, 0, 0): ("abab", 5),
    }


def test_bpe_apply_consecutive_merge_parity(spark) -> None:
    """'aaaa' with merge (a,a): greedy left-to-right gives (aa)(aa) —
    the double-separator replace must fuse BOTH pairs in one pass
    (the single-separator bug the trainer test pins, now pinned on
    the apply side too)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        bpe_apply,
    )

    docs = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    toks = [
        r["token"]
        for r in bpe_apply(docs, [("a", "a")])
        .orderBy("sub_pos")
        .collect()
    ]
    assert toks == ["aa", "aa"]


def test_pack_sequences_tokens_col_override(spark) -> None:
    """tokens_col replaces the chars/4 estimate verbatim."""
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(0, "xxxx", 300), (8, "y", 300)], "doc_id long, text string, n long"
    )
    rows = {
        r["doc_id"]: (r["tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(
            docs, capacity=512, n_shards=8, tokens_col="n"
        ).collect()
    }
    # both docs share shard 0; second doc starts at offset 300
    assert rows == {0: (300, 0, 0), 8: (300, 0, 300)}
