"""Property-based tests (hypothesis) for the data-dependent operators —
the test style the reference lacks entirely (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators import collapse_buckets
from firefox_public_data_report_etl_spark.operators.skew import (
    salted_count_distinct,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

counts_strategy = st.lists(
    st.tuples(
        st.sampled_from([f"k{i}" for i in range(12)]),
        st.integers(min_value=1, max_value=500),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(rows=counts_strategy)
@_settings
def test_collapse_preserves_total_and_threshold(spark, rows):
    df = spark.createDataFrame(rows, ["key", "cnt"])
    out = collapse_buckets(
        df, scope_cols=[], key_col="key", count_col="cnt", threshold=(1, 10)
    ).collect()
    total = sum(c for _, c in rows)
    thr = total // 10
    got_total = sum(r["cnt"] for r in out)
    assert got_total == total                       # counts conserved
    assert abs(sum(r["ratio"] for r in out) - 1.0) < 1e-9
    for r in out:
        if r["key"] != "Other":
            # every surviving bucket meets the threshold
            assert r["cnt"] >= thr
    keys = [r["key"] for r in out]
    assert len(keys) == len(set(keys))              # re-keying merged


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["hot", "g1", "g2"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.sampled_from([1, 3, 16]),
)
@_settings
def test_salted_distinct_is_exact(spark, rows, n_salts):
    df = spark.createDataFrame(rows, ["g", "k"])
    got = {
        r["g"]: r["d"]
        for r in salted_count_distinct(df, ["g"], "k", "d", n_salts).collect()
    }
    expected = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("d")).collect()
    }
    assert got == expected
