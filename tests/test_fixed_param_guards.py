"""Round-7 guards (from the round-6 verdict, "What's wrong" #1): the
fixed-mod registry defaults (ann_ivf, ann_ivf_trained,
kmeans_lloyd_refine, dedup_semantic) must REFUSE corpora past the
shared-oracle bound n = mod^2 instead of silently running the
O(N^2/mod) plan the static mod degenerates into there. The bound is
the exact inequality test_shared_oracle_bounds pins statically;
these tests exercise it at runtime with an oversized synthetic
corpus (the error must fire before any quadratic job runs — the
corpora here are small-dim so a missed guard would still finish,
but the assertion is on the raised error, not wall-clock).
"""

from __future__ import annotations

import pytest

from firefox_public_data_report_etl_spark.plans.similarity import (
    CENTROID_MOD,
    KM_INIT_MOD,
    _guard_fixed_param,
    ann_ivf,
    ann_ivf_trained,
    dedup_semantic,
    embedding_diversity_sample,
    kmeans_lloyd_refine,
)


def test_guard_inequality_is_exact() -> None:
    # at the bound: allowed (sqrt-N sizing still floors at the mod)
    _guard_fixed_param(KM_INIT_MOD**2, KM_INIT_MOD, "q", "t")
    # one past the bound: refused, error names the scale twin
    with pytest.raises(ValueError, match="twin_name"):
        _guard_fixed_param(
            KM_INIT_MOD**2 + 1, KM_INIT_MOD, "query_name", "twin_name"
        )


def _write_oversized(spark, tmp_path, n: int) -> str:
    """n small-dim embeddings rows shaped like the testdata contract."""
    sf_dir = str(tmp_path)
    spark.range(n).selectExpr(
        "id AS vec_id",
        "array(CAST(id % 7 AS FLOAT), CAST(id % 11 AS FLOAT)) AS embedding",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    return sf_dir


@pytest.mark.parametrize(
    "plan, mod, twin",
    [
        (ann_ivf, CENTROID_MOD, "ann_ivf_multiprobe"),
        (ann_ivf_trained, KM_INIT_MOD, "ann_ivf_multiprobe"),
        (kmeans_lloyd_refine, KM_INIT_MOD, "kmeans_refine_scaled"),
        (dedup_semantic, KM_INIT_MOD, "dedup_semantic_scaled"),
        (
            embedding_diversity_sample,
            KM_INIT_MOD,
            "embedding_diversity_sample_scaled",
        ),
    ],
)
def test_fixed_param_plans_refuse_oversized_corpus(
    spark, tmp_path, plan, mod, twin
) -> None:
    sf_dir = _write_oversized(spark, tmp_path, mod * mod + 1)
    with pytest.raises(ValueError, match=twin):
        plan(spark, sf_dir)


def test_er_record_grain_guard_and_twin_agreement(
    spark, sf_dir, monkeypatch
):
    """The record-grain ER form must refuse once the largest blocking
    key exceeds ER_MAX_BLOCK, naming the cell-grain twin — and the two
    forms must produce the identical golden-record set when both run."""
    from firefox_public_data_report_etl_spark.plans import linkage

    a = {
        tuple(r)
        for r in linkage.part_entity_resolution(spark, sf_dir).collect()
    }
    b = {
        tuple(r)
        for r in linkage.part_entity_resolution_scaled(
            spark, sf_dir
        ).collect()
    }
    assert a == b and a

    monkeypatch.setattr(linkage, "ER_MAX_BLOCK", 1)
    with pytest.raises(ValueError, match="part_entity_resolution_scaled"):
        linkage.part_entity_resolution(spark, sf_dir)
