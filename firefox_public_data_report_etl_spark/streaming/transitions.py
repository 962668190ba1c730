"""Streaming twin of the Markov transition matrix
(plans/windowsq.py:event_transition_matrix): per-user transition
counting via ``applyInPandasWithState``, carrying each user's LAST
event (timestamp + type) across micro-batches in the state store so a
transition that straddles a batch boundary is still counted — the
thing a per-batch window recompute structurally cannot do.

Each micro-batch emits the user's NEW transition counts (delta rows);
the consumer sums deltas per (from_type, to_type) — summation is the
mergeable aggregate, so the streaming counts equal the batch query's
counts exactly (pinned by the stream==batch test).

Ordering contract: rows within a micro-batch are sorted per user
before counting, but ACROSS batches the operator trusts arrival
order (the carried last-event state is not re-sorted). That is the
standard contract for ingestion-time-ordered replay (same as the
near-dup gate); for event-time disorder across batches, buffer with
a watermark upstream and emit on timeout instead.

Scale: state is ONE (long, string) row per user, partitioned by the
grouping key across executors; Arrow moves each user's batch slice
to Python in one hop. Session gap shares the 30-minute contract with
``user_sessions``/``event_transition_matrix``.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

SESSION_GAP_US = 30 * 60 * 1_000_000  # = plans.windowsq.SESSION_GAP_MIN

TRANS_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_type", StringType()),
    ]
)

TRANS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)


def _trans_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    last_us, last_type = state.get if state.exists else (None, None)
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["us", "event_id"])
    counts: dict[tuple[str, str], int] = {}
    for us, et in zip(rows["us"], rows["event_type"]):
        us = int(us)
        if last_type is not None and us - last_us <= SESSION_GAP_US:
            k = (last_type, et)
            counts[k] = counts.get(k, 0) + 1
        last_us, last_type = us, et
    state.update((last_us, last_type))
    if counts:
        yield pd.DataFrame(
            [(key[0], f, t, n) for (f, t), n in counts.items()],
            columns=["user_id", "from_type", "to_type", "n"],
        )


def streaming_transition_counts(
    events: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Per-user transition-count DELTAS per micro-batch; sum the `n`
    column per (from_type, to_type) downstream for the matrix.
    STREAMING-ONLY: applyInPandasWithState rejects batch queries in
    this Spark version — the batch form is the registry's
    ``event_transition_matrix`` window plan, and the stream==batch
    test pins their agreement."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _trans_update,
        outputStructType=TRANS_OUTPUT_SCHEMA,
        stateStructType=TRANS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
