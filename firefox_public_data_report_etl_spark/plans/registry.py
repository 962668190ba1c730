"""Assembles the engine's public query registry.

Each plans module contributes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB-runnable ANSI SQL). The
driver's correctness gate runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value hash; names present in
QUERIES but absent from ORACLES get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from firefox_public_data_report_etl_spark.plans import (
    activity,
    annotations,
    dedup,
    hardware,
    scalars,
    shapes,
    similarity,
    streamingq,
    text,
    tpch,
    windowsq,
)

_MODULES = [
    activity,
    annotations,
    dedup,
    hardware,
    scalars,
    shapes,
    similarity,
    streamingq,
    text,
    tpch,
    windowsq,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        assert _name not in QUERIES, f"duplicate query name {_name}"
        QUERIES[_name] = _fn
    ORACLES.update(getattr(_m, "ORACLES", {}))
