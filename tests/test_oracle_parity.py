"""Self-check of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB exactly (row count, columns,
order-insensitive values) at sf0.001."""

from __future__ import annotations

import pytest

from firefox_public_data_report_etl_spark.testing import check_query


def _names():
    from firefox_public_data_report_etl_spark.plans import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 11
