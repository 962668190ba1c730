"""Bounded-lag Q21 variant (round 9, r8 verdict #8): on data that
respects a ship-lag horizon (0 <= l_shipdate - o_orderdate <= H),
the lag-pruned form must equal the full-lineitem form exactly, and
the bound must reach the lineitem SCAN as a pushed filter — so the
registry's full-scan default is a documented choice with a tested
escape hatch, not the only form."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.plans.tpch2 import waiting_suppliers
from firefox_public_data_report_etl_spark.sources import load_table

H = 120  # ship-lag horizon (days) for the constructed corpus


def _horizon_dir(spark, sf_dir, tmp_path) -> str:
    """Copy orders/supplier and the lag-horizon-respecting slice of
    lineitem into a scratch sf_dir (the premise the bounded form
    requires; the real testdata violates it with lags of -2383..2478
    days — measured, which is WHY the registry default reads full
    lineitem)."""
    out = str(tmp_path / "sf_horizon")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ok = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                <= F.col("o_orderdate") + F.expr(f"INTERVAL {H} DAYS")
            )
        )
        .drop("o_orderkey", "o_orderdate")
    )
    ok.write.parquet(f"{out}/lineitem.parquet")
    orders.write.parquet(f"{out}/orders.parquet")
    load_table(spark, sf_dir, "supplier").write.parquet(
        f"{out}/supplier.parquet"
    )
    return out


def test_bounded_lag_agrees_on_horizon_respecting_data(
    spark, sf_dir, tmp_path
):
    hdir = _horizon_dir(spark, sf_dir, tmp_path)
    full = {
        (r["s_suppkey"], r["s_name"], r["numwait"])
        for r in waiting_suppliers(spark, hdir).collect()
    }
    bounded = {
        (r["s_suppkey"], r["s_name"], r["numwait"])
        for r in waiting_suppliers(spark, hdir, max_lag_days=H).collect()
    }
    assert full and bounded == full
    # a horizon TIGHTER than the data's true lag may legitimately
    # differ; a LOOSER one may not
    loose = {
        (r["s_suppkey"], r["s_name"], r["numwait"])
        for r in waiting_suppliers(
            spark, hdir, max_lag_days=H + 500
        ).collect()
    }
    assert loose == full


def test_bounded_lag_pushes_shipdate_to_scan(spark, sf_dir):
    plan = waiting_suppliers(
        spark, sf_dir, max_lag_days=H
    )._jdf.queryExecution().executedPlan().toString()
    # the l_shipdate bound must appear in the lineitem scan's pushed
    # filters, not only as a post-scan Filter
    scan = [
        seg for seg in plan.split("PushedFilters")
        if "l_shipdate" in seg[:400]
    ]
    assert len(plan.split("PushedFilters")) > 1
    assert scan, "l_shipdate bound did not reach PushedFilters"
