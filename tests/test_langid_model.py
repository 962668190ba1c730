"""Trained multilingual langid (operators/text.py:nb_langid_classifier,
round 10) — the trained scale path beside the marker-vote heuristic.

The registry corpus' lang column carries (by construction) almost no
lexical signal — every language shares the same 31-word vocabulary
with near-identical frequencies — so the corpus-level queries are
pinned by their DuckDB oracles (bit-exact fixed-point margins), while
THESE tests plant corpora where language signal genuinely exists and
assert the classifier finds it: perfect held-out separation on
disjoint vocabularies, and >= heuristic accuracy on a marker-word
corpus (the agreement test the round-9 verdict asked for).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from firefox_public_data_report_etl_spark.operators.text import (
    NB_LANGID_CLASSES,
    langid_heuristic,
    nb_langid_classifier,
)

SF = "/root/testdata/sf0.01"


def _planted(spark, n_per_lang=60, shared=2, own=8):
    """Docs whose vocabulary is language-specific (plus a few shared
    function words) — real-language structure in miniature."""
    rows = []
    doc_id = 0
    for li, lang in enumerate(NB_LANGID_CLASSES):
        for d in range(n_per_lang):
            words = [
                f"{lang}w{(d * 7 + j) % 13}" for j in range(own)
            ] + [f"shared{j}" for j in range(shared)]
            # vary length/order deterministically
            words = words[(d % 3):] + words[: (d % 3)]
            rows.append((doc_id, " ".join(words), lang))
            doc_id += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_perfect_separation_on_disjoint_vocab(spark):
    docs = _planted(spark)
    out = nb_langid_classifier(docs).collect()
    assert out  # held-out split is non-empty
    assert all(r["correct"] for r in out)
    # margins are strictly positive: the winner is never tied
    assert all(r["margin_fp"] > 0 for r in out)
    # every held-out doc scored exactly once
    assert len({r["doc_id"] for r in out}) == len(out)


def test_trained_model_matches_or_beats_heuristic(spark):
    """Agreement test on a corpus where the heuristic's marker words
    are present: markers only exist for en/de/es, so the trained
    model (which learns fr/zh vocabularies too) must reach at least
    the heuristic's accuracy on the same held-out docs."""
    from firefox_public_data_report_etl_spark.operators.text import (
        LANG_MARKERS,
    )

    rows = []
    doc_id = 0
    for lang in NB_LANGID_CLASSES:
        markers = LANG_MARKERS.get(lang, ())
        for d in range(60):
            words = [f"{lang}w{(d + j) % 11}" for j in range(6)]
            if markers:  # sprinkle the heuristic's own signal
                words.append(markers[d % len(markers)])
            rows.append((doc_id, " ".join(words), lang))
            doc_id += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    scored = nb_langid_classifier(docs)
    heur = langid_heuristic(docs).join(
        scored.select("doc_id"), "doc_id"
    )
    model_acc = scored.agg(
        F.avg(F.col("correct").cast("double"))
    ).head()[0]
    heur_acc = heur.agg(
        F.avg(F.col("is_match").cast("double"))
    ).head()[0]
    assert model_acc >= heur_acc
    assert model_acc == 1.0  # per-lang vocab is fully separable


def test_confusion_rollup_consistent_with_doc_grain(spark):
    from firefox_public_data_report_etl_spark.plans.text import (
        corpus_langid_eval,
        corpus_langid_model,
    )

    doc = corpus_langid_model(spark, SF)
    ev = corpus_langid_eval(spark, SF)
    n_doc = doc.count()
    cells = ev.collect()
    assert sum(r["n_docs"] for r in cells) == n_doc
    # diagonal cells are exactly the correct docs
    diag = sum(
        r["n_docs"] for r in cells if r["labeled_lang"] == r["pred_lang"]
    )
    assert diag == doc.filter("correct").count()
    # predictions stay within the class list
    assert {r["pred_lang"] for r in cells} <= set(NB_LANGID_CLASSES)
