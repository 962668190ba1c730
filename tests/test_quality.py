"""The data-quality audit must DETECT violations, not just bless the
clean testdata: corrupt copies of two tables and assert the exact
checks flip to ok=False with the right violation counts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.plans.quality import (
    data_quality_audit,
)


def test_data_quality_audit_detects_violations(spark, sf_dir, tmp_path):
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "lineitem", "embeddings",
    ]:
        os.symlink(f"{sf_dir}/{t}.parquet", tmp_path / f"{t}.parquet")

    # events: one NULL event_type — NULL must count as a domain
    # violation (x NOT IN (...) is NULL, which a naive SUM drops)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    null_ev = events.limit(1).withColumn(
        "event_type", F.lit(None).cast("string")
    )
    events.unionByName(null_ev).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )

    # documents: one duplicated doc_id whose n_chars also lies
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad_doc = docs.limit(1).withColumn("n_chars", F.lit(-1).cast("long"))
    docs.unionByName(bad_doc).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    # orders: one orphan o_custkey breaking referential integrity
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orphan = orders.limit(1).withColumn(
        "o_custkey", F.lit(-999).cast("long")
    )
    orders.unionByName(orphan).coalesce(1).write.parquet(
        str(tmp_path / "orders.parquet")
    )

    audit = data_quality_audit(spark, str(tmp_path))
    m = {
        (r["table_name"], r["check"]): (r["violations"], r["ok"])
        for r in audit.collect()
    }
    assert m[("documents", "doc_id_unique")] == (1, False)
    assert m[("documents", "n_chars_matches_text")] == (1, False)
    assert m[("orders", "custkey_fk_into_customer")] == (1, False)
    assert m[("events", "event_type_in_domain")] == (1, False)
    # untouched tables stay green
    assert m[("lineitem", "quantity_in_1_50")] == (0, True)
    assert m[("events", "value_non_negative")] == (0, True)


def test_data_quality_audit_all_green_on_testdata(spark, sf_dir):
    rows = data_quality_audit(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["ok"] for r in rows)


def test_corpus_drift_audit_python_recompute(spark, sf_dir):
    # recompute per-source TVD in plain Python from the same snapshot
    # rule and pin the integer formula (incl. the ppm floor-division)
    from collections import Counter

    import pandas as pd  # noqa: F401 — via toPandas

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.plans.quality import (
        DRIFT_BIN_EDGES,
        DRIFT_PPM_THRESHOLD,
        SNAP_EDIT_HI,
        SNAP_EDIT_LO,
        SNAP_EDIT_SUFFIX,
        SNAP_NEW_MIN,
        SNAP_OLD_MAX,
        corpus_drift_audit,
    )
    from firefox_public_data_report_etl_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            "text",
            (
                F.expr(md5_int_spark_sql("cast(doc_id as string)")) % 100
            ).alias("bkt"),
        )
        .collect()
    )

    def binof(n):
        for i, e in enumerate(DRIFT_BIN_EDGES):
            if n < e:
                return i
        return len(DRIFT_BIN_EDGES)

    ca, cb = Counter(), Counter()
    for r in docs:
        if r.bkt < SNAP_OLD_MAX:
            ca[(r.source, binof(len(r.text)))] += 1
        if r.bkt >= SNAP_NEW_MIN:
            t = (
                r.text + SNAP_EDIT_SUFFIX
                if SNAP_EDIT_LO <= r.bkt < SNAP_EDIT_HI
                else r.text
            )
            cb[(r.source, binof(len(t)))] += 1
    out = {r.source: r for r in corpus_drift_audit(spark, sf_dir).collect()}
    sources = {s for s, _ in ca} | {s for s, _ in cb}
    assert set(out) == sources
    for s in sources:
        n_a = sum(v for (src, _), v in ca.items() if src == s)
        n_b = sum(v for (src, _), v in cb.items() if src == s)
        bins = {b for (src, b) in list(ca) + list(cb) if src == s}
        tvd_num = sum(
            abs(ca.get((s, b), 0) * n_b - cb.get((s, b), 0) * n_a)
            for b in bins
        )
        ppm = (
            1_000_000
            if n_a == 0 or n_b == 0
            else (1_000_000 * tvd_num) // (2 * n_a * n_b)
        )
        r = out[s]
        assert (r.n_a, r.n_b, r.tvd_num, r.tvd_ppm) == (
            n_a,
            n_b,
            tvd_num,
            ppm,
        )
        assert r.drifted == (ppm >= DRIFT_PPM_THRESHOLD)
        assert 0 <= r.tvd_ppm <= 1_000_000


def test_corpus_bootstrap_ci_properties(spark, sf_dir):
    # band is ordered, brackets the point estimate, and the Poisson(1)
    # weights average to ~1 (the property making the bootstrap
    # unbiased); weight draws agree with a plain-Python replay
    import hashlib

    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark.plans.quality import (
        BOOT_B,
        BOOT_CDF_PPM,
        corpus_bootstrap_ci,
    )

    rows = corpus_bootstrap_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo_milli <= r.ci_hi_milli
        # a 94% band from 32 replicates almost surely brackets the
        # full-sample mean; allow slack of one ranked step
        assert r.ci_lo_milli <= r.point_milli <= r.ci_hi_milli

    def weight(doc_id: int, b: int) -> int:
        h = int(
            hashlib.md5(f"boot{b}|{doc_id}".encode()).hexdigest()[:7], 16
        )
        u = h % 1_000_000
        for k, c in enumerate(BOOT_CDF_PPM):
            if u < c:
                return k
        return len(BOOT_CDF_PPM)

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    ws = [weight(i, b) for i in ids for b in range(BOOT_B)]
    mean_w = sum(ws) / len(ws)
    assert 0.93 < mean_w < 1.07
    assert any(w == 0 for w in ws) and any(w >= 2 for w in ws)
