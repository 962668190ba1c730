"""Incremental MERGE (upsert) — the row-level complement to the
partition-level incrementality the reference uses.

The reference's incremental story is coarse: per-week WRITE_TRUNCATE
partition overwrite (hardware_report.py:458-465; engine analog
``sources.tables.write_partitioned`` + ``run_pipeline(only_weeks=…)``).
A training-data pipeline also needs ROW-level upsert — refresh a
document corpus where re-crawled docs replace stale rows and new docs
append — without rewriting untouched data's logical content.

``merge_rows`` is the engine-side MERGE semantics (latest-wins by
key), expressed Spark-first as ONE shuffle:

    union(source tagged 1, target tagged 0)
      → window row_number over key ordered by tag desc
      → keep rank 1

versus the textbook full-outer-join formulation (two shuffled inputs
plus join). Both sides shuffle once either way, but the union-window
form needs no join and no column reconciliation logic, and AQE handles
skewed keys the same way.

Scale notes: at 100 TB the physical write should target partition
overwrite (pair with ``write_partitioned`` on a date/bucket column so
only partitions containing touched keys rewrite) or a format with
MERGE support; the logical operator here is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_rows(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE semantics: source rows update matching target keys and
    insert new keys; unmatched target rows pass through. BOTH sides
    must be unique per key: duplicate source keys would be
    nondeterministic in any MERGE (enforced upstream, e.g.
    ``upsert_batch``'s pre-collapse), and key-unique target is the
    invariant this operator itself maintains — every output is unique
    per key, so it holds inductively from an empty or deduplicated
    initial target. A target that violates it (row_number ties among
    _src=0 rows) would keep an arbitrary duplicate; dedupe it once
    with ``dropDuplicates(keys)`` before adopting this operator."""
    if target.columns != source.columns:
        raise ValueError(
            f"schema mismatch: target={target.columns} source={source.columns}"
        )
    tagged = target.withColumn("_src", F.lit(0)).unionByName(
        source.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("_src"))
    return (
        tagged.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .drop("_src", "_rank")
    )


def merge_stats(target: DataFrame, source: DataFrame, keys: list[str]) -> dict:
    """(updated, inserted, untouched) counts — the MERGE report line.
    Computed with semi/anti joins on the key columns only (8-byte key
    shuffles, never full rows)."""
    t = target.select(*keys)
    s = source.select(*keys)
    updated = s.join(t, keys, "left_semi").count()
    inserted = s.join(t, keys, "left_anti").count()
    untouched = t.join(s, keys, "left_anti").count()
    return {"updated": updated, "inserted": inserted, "untouched": untouched}
