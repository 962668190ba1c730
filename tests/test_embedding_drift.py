"""Embedding centroid drift (operators/similarity.py:centroid_drift):
planted-truth separation at controlled n (the registry query pins the
arithmetic; sampling noise at toy per-label counts swamps any planted
shift there, so the detection claim is proven here), plus the
zero-self and one-sided-label contracts."""

from __future__ import annotations

from firefox_public_data_report_etl_spark.operators.similarity import (
    EMB_DRIFT_PPM,
    centroid_drift,
)


def _emb(spark, label, n, shift=0, id0=0):
    # deterministic "embeddings": dim-8 integer vectors with small
    # id-dependent jitter around a per-label base; `shift` moves
    # dim 0 of every vector (the planted drift)
    rows = []
    for i in range(n):
        base = [100 + 10 * label + (i * 7 + d * 13) % 5 for d in range(8)]
        base[0] += shift
        rows.append((id0 + i, label, base))
    return spark.createDataFrame(
        rows, "vec_id long, label int, q array<bigint>"
    )


def test_planted_shift_flags_only_that_label(spark):
    a = _emb(spark, 0, 200).union(_emb(spark, 1, 200, id0=1000))
    # side B: label 1 drifts by 100 milli-units in dim 0; label 0
    # is a fresh same-distribution sample
    b = _emb(spark, 0, 200, id0=5000).union(
        _emb(spark, 1, 200, shift=100, id0=6000)
    )
    out = {r.label: r for r in centroid_drift(a, b).collect()}
    assert not out[0].drifted and out[0].drift_ppm < EMB_DRIFT_PPM // 4
    assert out[1].drifted and out[1].drift_ppm >= EMB_DRIFT_PPM
    assert out[1].dist2 >= 100 * 100 - 8  # the planted dim dominates


def test_self_comparison_is_zero(spark):
    a = _emb(spark, 0, 50)
    out = centroid_drift(a, a).collect()
    assert len(out) == 1
    r = out[0]
    assert r.dist2 == 0 and r.drift_ppm == 0 and not r.drifted


def test_one_sided_labels_dropped(spark):
    a = _emb(spark, 0, 20).union(_emb(spark, 2, 20, id0=100))
    b = _emb(spark, 0, 20, id0=200)
    labels = {r.label for r in centroid_drift(a, b).collect()}
    assert labels == {0}


def test_registry_query_green_shape(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.similarity import (
        embedding_drift_audit,
    )

    rows = embedding_drift_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.drift_ppm >= 0
        assert r.na2 >= 0 and r.nb2 >= 0
