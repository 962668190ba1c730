"""Streaming exact-dedup: drop re-delivered rows inside a watermark.

The ingestion-side twin of the batch ``dedup_exact`` plan
(plans/dedup.py): a training-data pipeline tailing a feed sees the
same document delivered more than once (at-least-once sources,
retries); this stage emits each key's first arrival and drops the
rest, with ``dropDuplicatesWithinWatermark`` so the dedup state is
reclaimed once the watermark passes — bounded state at any scale,
unlike a plain streaming ``dropDuplicates`` whose key set grows
forever.

Scale notes: state is keyed by the dedup columns and partitioned by
the state-store shuffle; the watermark delay bounds both state size
and how late a duplicate can arrive and still be caught. Duplicates
farther apart than the delay are the batch compaction job's problem
(run ``dedup_exact`` over the landed partitions), which is the
standard streaming/batch split for exactly-once ingestion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup_events(
    events: DataFrame,
    keys: Sequence[str] = ("user_id", "ts", "event_type"),
    delay: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins dedup of an event stream on ``keys``.

    Works on batch DataFrames too (falls back to ``dropDuplicates`` —
    same result set, no state), so backfill and tail share the
    definition like the window aggregations do.
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(list(keys))
