"""Spark-4-native stateful operator via ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (stateful.py keeps the
classic form): a ``StatefulProcessor`` owns named state variables
through a handle instead of one opaque state tuple, so multi-variable
operators (counters + reservoirs + timers) compose without packing
everything into a single struct. This operator is the same per-user
lifetime totals contract as ``running_user_totals`` — the test asserts
the two APIs agree — exercising the new API's ValueState.

Scale notes: transformWithState requires the RocksDB state store
provider (set here at runtime; bundled with Spark 4), which keeps
state off-heap and spills to disk — the right provider for
billion-key state at 100 TB regardless of API choice. State is
partitioned by the grouping key; Arrow batches rows per key group.

Environment gate: the TransformWithStateInPySpark driver worker talks
protobuf to the JVM, so the API needs a working ``google.protobuf``
install (not present in every container — check ``tws_available()``
before planning a query on this operator; the classic
``applyInPandasWithState`` form in stateful.py has no such
dependency and covers the same contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from firefox_public_data_report_etl_spark.functions import cents
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

TOTALS_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

TOTALS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the transformWithState Python worker can start (its
    JVM handshake imports google.protobuf.descriptor)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState-backed lifetime (n_events, sum_cents) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", TOTALS_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._totals.get() if self._totals.exists() else (0, 0)
        n, c = int(prev[0]), int(prev[1])
        for pdf in rows:
            n += len(pdf)
            c += int(pdf["cents"].sum())
        self._totals.update((n, c))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [c]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """``transformWithStateInPandas`` form of the lifetime totals
    operator. The RocksDB provider conf is runtime-set (idempotent)
    because the API requires it and harness sessions won't have it."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    prepared = events.select("user_id", cents(F.col("value")).alias("cents"))
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
