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
