"""Row-level MERGE (upsert) semantics, the custom Python data source,
and the grouped-agg pandas UDAF."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.merge import (
    merge_rows,
    merge_stats,
)


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["doc_id", "text", "score"],
    )
    source = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)],
        ["doc_id", "text", "score"],
    )
    return target, source


def test_merge_rows_latest_wins(spark, frames):
    target, source = frames
    got = {
        r["doc_id"]: (r["text"], r["score"])
        for r in merge_rows(target, source, ["doc_id"]).collect()
    }
    assert got == {
        1: ("a", 10.0),    # untouched target row passes through
        2: ("b2", 21.0),   # matched key: source wins
        3: ("c", 30.0),
        4: ("d", 40.0),    # new key inserted
    }


def test_merge_rows_idempotent(spark, frames):
    target, source = frames
    once = merge_rows(target, source, ["doc_id"])
    twice = merge_rows(once, source, ["doc_id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_stats(spark, frames):
    target, source = frames
    assert merge_stats(target, source, ["doc_id"]) == {
        "updated": 1,
        "inserted": 1,
        "untouched": 2,
    }


def test_merge_schema_mismatch_raises(spark, frames):
    target, _ = frames
    bad = target.select("doc_id", "text")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_rows(target, bad, ["doc_id"])


def test_date_spine_source_partitions_and_rows(spark):
    from firefox_public_data_report_etl_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("date_spine")
        .option("start", "2024-01-01")
        .option("stop", "2024-12-30")
        .option("step_days", "7")
        .option("numPartitions", "6")
        .load()
    )
    rows = df.orderBy("step_index").collect()
    assert len(rows) == 53
    assert rows[0]["day"].isoformat() == "2024-01-01"
    assert rows[-1]["day"].isoformat() == "2024-12-30"
    assert df.rdd.getNumPartitions() == 6
    # single-row range still plans exactly one partition
    one = (
        spark.read.format("date_spine")
        .option("start", "2024-01-01")
        .option("stop", "2024-01-01")
        .load()
    )
    assert one.count() == 1


def test_geometric_mean_udaf_matches_expression(spark):
    from firefox_public_data_report_etl_spark.operators.vectorized import (
        geometric_mean_udaf,
    )

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 27.0), ("b", 1.0)],
        ["g", "x"],
    )
    gmean = geometric_mean_udaf()
    got = {
        r["g"]: r["gm"]
        for r in df.groupBy("g").agg(gmean(F.col("x")).alias("gm")).collect()
    }
    expr = {
        r["g"]: r["gm"]
        for r in df.groupBy("g")
        .agg(F.exp(F.avg(F.log("x"))).alias("gm"))
        .collect()
    }
    for g in got:
        assert math.isclose(got[g], expr[g], rel_tol=1e-12)
    assert math.isclose(got["a"], 4.0, rel_tol=1e-12)


def test_date_spine_filter_pushdown(spark):
    """Comparison filters on day/step_index narrow the generated index
    range inside the connector (consumed by pushFilters), and results
    match the unpushed semantics exactly."""
    from datetime import date

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan
    from firefox_public_data_report_etl_spark.sources.pydatasource import (
        DateSpineReader,
        register,
    )

    # unit: the reader consumes range filters and shrinks its plan
    r = DateSpineReader(
        {"start": "2024-01-01", "stop": "2024-12-30", "step_days": "7"}
    )
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("day",), date(2024, 3, 1)),
                LessThan(("day",), date(2024, 6, 1)),
            ]
        )
    )
    assert leftover == []  # fully consumed
    parts = r.partitions()
    rows = [row for p in parts for row in r.read(p)]
    assert all(date(2024, 3, 1) <= d < date(2024, 6, 1) for d, _ in rows)
    assert len(rows) == sum(
        1
        for i in range(53)
        if date(2024, 3, 1) <= date(2024, 1, 1) + __import__("datetime").timedelta(days=7 * i) < date(2024, 6, 1)
    )

    # end-to-end: pushed plan returns the same rows as Spark-side filter
    register(spark)
    df = (
        spark.read.format("date_spine")
        .option("start", "2024-01-01")
        .option("stop", "2024-12-30")
        .option("step_days", "7")
        .load()
    )
    got = sorted(
        r["day"].isoformat()
        for r in df.filter(
            (F.col("day") >= "2024-03-01") & (F.col("day") < "2024-06-01")
        ).collect()
    )
    assert got[0] >= "2024-03-01" and got[-1] < "2024-06-01"
    assert len(got) == len(rows)


def test_scd2_apply_two_waves(spark):
    """Two observation waves through the SCD2 writer: changed keys
    close + reopen, equal-attr updates are no-ops, new keys open, and
    exactly one current row per key survives every wave."""
    from firefox_public_data_report_etl_spark.operators.merge import (
        scd2_apply,
    )

    cols = ["user_id", "state", "valid_from_us", "valid_to_us", "is_current"]
    target = spark.createDataFrame(
        [
            (1, "view", 100, None, True),
            (2, "click", 50, None, True),
            (2, "view", 10, 50, False),
        ],
        "user_id long, state string, valid_from_us long, "
        "valid_to_us long, is_current boolean",
    )
    w1 = spark.createDataFrame(
        [(1, "click", 200), (2, "click", 210), (3, "view", 220)],
        "user_id long, state string, ts_us long",
    )
    t1 = scd2_apply(target, w1, "user_id", "state")
    rows = {(r.user_id, r.state, r.valid_from_us): r for r in t1.collect()}
    # user 1 changed: closed at 200, reopened
    assert rows[(1, "view", 100)].valid_to_us == 200
    assert rows[(1, "click", 200)].is_current
    # user 2 equal attr: untouched open row
    assert rows[(2, "click", 50)].valid_to_us is None
    # user 3 new key
    assert rows[(3, "view", 220)].is_current
    cur = [r for r in t1.collect() if r.is_current]
    assert sorted(r.user_id for r in cur) == [1, 2, 3]

    w2 = spark.createDataFrame(
        [(3, "purchase", 300)], "user_id long, state string, ts_us long"
    )
    t2 = scd2_apply(t1, w2, "user_id", "state")
    out = {(r.user_id, r.state, r.valid_from_us): r for r in t2.collect()}
    assert out[(3, "view", 220)].valid_to_us == 300
    assert out[(3, "purchase", 300)].is_current
    assert len([r for r in t2.collect() if r.is_current]) == 3
    assert t2.columns == cols
