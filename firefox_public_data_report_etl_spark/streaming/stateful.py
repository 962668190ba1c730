"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windows cover the reference's needs; this is the escape hatch
for operators Structured Streaming lacks natively — here a running
per-user lifetime counter (events + exact cents) that survives across
micro-batches in the state store.

Scale notes: state is one small row per user key, partitioned by the
grouping key across executors; GroupStateTimeout can evict idle users
(NoTimeout here — lifetime totals). Arrow moves each group's batch
rows to Python in one hop.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from firefox_public_data_report_etl_spark.functions import cents
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        c += int(pdf["cents"].sum())
    state.update((n, c))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_cents": [c]})


def running_user_totals(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-user lifetime (n_events, sum_cents), updated every
    micro-batch from the state store. Works on batch input too (one
    'batch' of state)."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    prepared = events.select(
        "user_id", cents(F.col("value")).alias("cents")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
