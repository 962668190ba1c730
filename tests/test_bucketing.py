"""Bucketed layout: the co-located join must run with zero Exchange
operators on the bucketed sides."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.sources import load_table
from firefox_public_data_report_etl_spark.sources.bucketing import (
    cobucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # tables land in the session's default warehouse dir
    # (./spark-warehouse, gitignored); dropped on teardown.
    # disable auto-broadcast so the test observes the bucketed SMJ path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_cobucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    joined = cobucketed_join(spark, "li_b", "ord_b", ["l_orderkey"])
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join still shuffles"
    assert "SortMergeJoin" in plan
    # correctness: same row count as the plain join
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expected


def test_bucketed_window_and_agg_elide_exchange(spark, sf_dir):
    """User-grain windows and aggregates over a user_id-bucketed table
    must plan with ZERO Exchange: the layout satisfies the operators'
    ClusteredDistribution, so the flagship's shuffle-1 and the
    sessionization window become shuffle-free on a bucketed warehouse
    — the 100 TB argument for paying the bucketing shuffle once."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    write_bucketed(ev, "ev_b", ["user_id"], 8)
    try:
        b = spark.table("ev_b")

        agg = b.groupBy("user_id").agg(F.count("*").alias("n"))
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed groupBy still shuffles"

        w = Window.partitionBy("user_id").orderBy("ts")
        win = b.withColumn("rn", F.row_number().over(w))
        win.collect()
        plan = win._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed window still shuffles"

        # correctness spot-check vs the unbucketed path
        expected = sorted(
            (r.user_id, r.n)
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        )
        got = sorted((r.user_id, r.n) for r in agg.collect())
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b")
