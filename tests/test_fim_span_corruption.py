"""Training-transform invariants (round 10): FIM reordering is
token-conserving and invertible, span corruption satisfies the T5
conservation law (input ∪ target non-sentinel tokens == original
stream, sentinels agree between streams), and preference pairs are
strictly quality-ordered within their cluster. Values are pinned by
the DuckDB oracles; these tests pin the ALGEBRA the value hash can't
name."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.text import (
    FIM_SENT_MID,
    FIM_SENT_PRE,
    FIM_SENT_SUF,
)
from firefox_public_data_report_etl_spark.sources import load_table


@pytest.fixture(scope="module")
def originals(spark, sf_dir):
    return {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }


def test_fim_conserves_and_inverts(spark, sf_dir, originals):
    from firefox_public_data_report_etl_spark.plans import QUERIES

    rows = QUERIES["corpus_fim_transform"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(originals)
    n_fim = 0
    for doc_id, items in by_doc.items():
        items.sort(key=lambda r: r.out_idx)
        idxs = [r.out_idx for r in items]
        assert idxs == list(
            range(idxs[0], idxs[0] + len(items))
        ), f"non-contiguous stream for {doc_id}"
        toks = [r for r in items if r.segment != "sentinel"]
        assert Counter(t.tok for t in toks) == Counter(originals[doc_id])
        sent = [r.tok for r in items if r.segment == "sentinel"]
        if sent:
            n_fim += 1
            assert sent == [FIM_SENT_PRE, FIM_SENT_SUF, FIM_SENT_MID]
            # PSM inversion: prefix ++ middle ++ suffix == original
            rebuilt = (
                [r.tok for r in toks if r.segment == "prefix"]
                + [r.tok for r in toks if r.segment == "middle"]
                + [r.tok for r in toks if r.segment == "suffix"]
            )
            assert rebuilt == originals[doc_id]
        else:
            assert [r.tok for r in toks] == originals[doc_id]
    # the 50% coin actually splits the corpus
    assert 0 < n_fim < len(by_doc)


def test_span_corruption_conservation(spark, sf_dir, originals):
    from firefox_public_data_report_etl_spark.plans import QUERIES

    rows = QUERIES["corpus_span_corruption"](spark, sf_dir).collect()
    docs: dict[int, dict[str, list]] = {}
    for r in rows:
        docs.setdefault(r.doc_id, {"input": [], "target": []})[
            r.stream
        ].append(r)
    assert set(docs) == set(originals)
    any_corrupted = 0
    for doc_id, streams in docs.items():
        inp = sorted(streams["input"], key=lambda r: r.idx)
        tgt = sorted(streams["target"], key=lambda r: r.idx)
        assert [r.idx for r in inp] == list(range(len(inp)))
        assert [r.idx for r in tgt] == list(range(len(tgt)))
        is_sent = lambda t: t.startswith("<X") and t.endswith(">")
        inp_sent = [r.tok for r in inp if is_sent(r.tok)]
        tgt_sent = [r.tok for r in tgt if is_sent(r.tok)]
        # sentinel sequences agree and are densely numbered
        assert inp_sent == tgt_sent
        assert inp_sent == [f"<X{i}>" for i in range(len(inp_sent))]
        # conservation: non-sentinel mass of input + target == original
        kept = [r.tok for r in inp if not is_sent(r.tok)]
        hidden = [r.tok for r in tgt if not is_sent(r.tok)]
        assert Counter(kept) + Counter(hidden) == Counter(
            originals[doc_id]
        )
        # target layout: sentinel then >=1 tokens each
        if tgt:
            any_corrupted += 1
            assert is_sent(tgt[0].tok)
            run = 0
            for r in tgt:
                if is_sent(r.tok):
                    if run == 0 and r.idx > 0:
                        pytest.fail("empty span in target")
                    run = 0
                else:
                    run += 1
    assert any_corrupted > 0


def test_span_corruption_roundtrip_order(spark, sf_dir, originals):
    """Substituting each input sentinel <Xk> with the target tokens it
    hides reconstructs the original document EXACTLY — order included,
    which the conservation Counter cannot pin. Added with the round-12
    array-native rewrite (in-row stream construction instead of
    row_number windows): this is the invariant that would break if the
    per-block concat emitted any token out of place."""
    from firefox_public_data_report_etl_spark.plans import QUERIES

    rows = QUERIES["corpus_span_corruption"](spark, sf_dir).collect()
    docs: dict[int, dict[str, list]] = {}
    for r in rows:
        docs.setdefault(r.doc_id, {"input": [], "target": []})[
            r.stream
        ].append(r)
    is_sent = lambda t: t.startswith("<X") and t.endswith(">")
    for doc_id, streams in docs.items():
        inp = [
            r.tok for r in sorted(streams["input"], key=lambda r: r.idx)
        ]
        tgt = [
            r.tok for r in sorted(streams["target"], key=lambda r: r.idx)
        ]
        # hidden tokens per sentinel, in target order
        hidden: dict[str, list[str]] = {}
        cur = None
        for t in tgt:
            if is_sent(t):
                cur = t
                hidden[cur] = []
            else:
                hidden[cur].append(t)
        rebuilt: list[str] = []
        for t in inp:
            rebuilt.extend(hidden[t] if is_sent(t) else [t])
        assert rebuilt == originals[doc_id], f"roundtrip broke {doc_id}"


def test_preference_pairs_quality_ordered(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans import QUERIES

    pairs = QUERIES["preference_pairs"](spark, sf_dir).collect()
    assert pairs, "fixture corpus should yield at least one pair"
    keep = {
        r.component: r.doc_id
        for r in QUERIES["dedup_keep_best_lm"](spark, sf_dir).collect()
    }
    for p in pairs:
        assert p.chosen_id != p.rejected_id
        assert p.n_members >= 2
        assert p.margin_x > 0
        # exact cross-multiplied inequality == the per-token ordering
        assert (
            p.chosen_score_munats * p.rejected_n_tokens
            > p.rejected_score_munats * p.chosen_n_tokens
        )
        # chosen agrees with the survivorship query's winner
        assert keep[p.component] == p.chosen_id
