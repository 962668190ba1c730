"""Dataset version lineage (round-10 verdict #7): the manifest's
parent ⊕ diff audit equation, its tamper-evidence (a mutated parent
breaks the recorded chain), and the order-independence of the modular
corpus fingerprint. The full 3-version value recompute is
oracle-checked by `corpus_version_lineage`; these tests pin the
security property the oracle alone cannot express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.maintenance import (
    VL_MOD,
    corpus_fingerprint,
    version_lineage_manifest,
)


def _frames(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.quality import (
        corpus_version_lineage,  # noqa: F401 — rule source
        VL_RULES,
    )
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            F.expr(md5_int_spark_sql("cast(doc_id as string)")) % 100
        ).alias("bkt"),
    )
    return [
        docs.filter(F.expr(m)).select("doc_id", F.expr(r).alias("text"))
        for m, r in VL_RULES
    ]


def test_chain_holds_on_untampered_versions(spark, sf_dir):
    man = {
        r.version: r
        for r in version_lineage_manifest(_frames(spark, sf_dir)).collect()
    }
    assert len(man) == 3
    assert all(man[v].chain_ok for v in man)
    assert man[0].parent_fp is None
    for v in (1, 2):
        assert man[v].parent_fp == man[v - 1].fp
        assert (man[v].parent_fp + man[v].delta_fp) % VL_MOD == man[v].fp
        # the chain is built from real churn, not empty diffs
        assert man[v].n_added + man[v].n_removed + man[v].n_changed > 0
        assert man[v].n_unchanged > 0


def test_tampered_parent_breaks_chain(spark, sf_dir):
    frames = _frames(spark, sf_dir)
    man = {
        r.version: r
        for r in version_lineage_manifest(frames).collect()
    }
    some_id = frames[0].select(F.min("doc_id")).first()[0]
    tampered_v0 = frames[0].select(
        "doc_id",
        F.when(
            F.col("doc_id") == some_id,
            F.concat(F.col("text"), F.lit(" TAMPERED")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fp0t = corpus_fingerprint(tampered_v0).first()["fp"]
    # the recomputed parent fingerprint no longer matches the stored
    # manifest, and rolling the RECORDED delta forward from it no
    # longer reproduces the child — the audit detects the mutation
    assert fp0t != man[0].fp
    assert (fp0t + man[1].delta_fp) % VL_MOD != man[1].fp


def test_fingerprint_is_order_and_partitioning_independent(
    spark, sf_dir
):
    v0 = _frames(spark, sf_dir)[0]
    base = corpus_fingerprint(v0).first()
    shuffled = corpus_fingerprint(
        v0.orderBy(F.reverse(F.col("text"))).repartition(13)
    ).first()
    assert (base["n_docs"], base["fp"]) == (
        shuffled["n_docs"],
        shuffled["fp"],
    )


def test_fingerprint_binds_id_to_payload(spark, sf_dir):
    # swapping two documents' payloads keeps a payload-only multiset
    # identical; the lineage hash must still change
    v0 = _frames(spark, sf_dir)[0]
    ids = [r.doc_id for r in v0.select("doc_id").orderBy("doc_id").limit(2).collect()]
    a, b = ids
    texts = {
        r.doc_id: r.text
        for r in v0.filter(F.col("doc_id").isin(a, b)).collect()
    }
    assert texts[a] != texts[b], "fixture degenerate: equal texts"
    swapped = v0.select(
        "doc_id",
        F.when(F.col("doc_id") == a, F.lit(texts[b]))
        .when(F.col("doc_id") == b, F.lit(texts[a]))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    assert (
        corpus_fingerprint(swapped).first()["fp"]
        != corpus_fingerprint(v0).first()["fp"]
    )


def test_aligned_matches_generic(spark, sf_dir):
    """The fused one-scan aligned manifest (round 12) is row-for-row
    identical to the generic frame-list manifest on the registry's
    rule chain — the equivalence corpus_version_lineage's rewrite
    rests on."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.maintenance import (
        version_lineage_manifest_aligned,
    )
    from firefox_public_data_report_etl_spark.plans.quality import VL_RULES
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            F.expr(md5_int_spark_sql("cast(doc_id as string)")) % 100
        ).alias("bkt"),
    )
    generic = sorted(
        map(tuple, version_lineage_manifest(_frames(spark, sf_dir)).collect())
    )
    aligned = sorted(
        map(
            tuple,
            version_lineage_manifest_aligned(docs, VL_RULES).collect(),
        )
    )
    assert aligned == generic
