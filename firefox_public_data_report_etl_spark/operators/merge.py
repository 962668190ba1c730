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


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Apply one batch of observations to an SCD Type-2 dimension —
    the WRITER side of the history the batch rebuild
    (plans/windowsq.py:user_state_scd2) derives from a full log.

    Target contract: (key, attr, valid_from_us, valid_to_us NULL for
    the open row, is_current), exactly one is_current row per key.
    Updates: (key, attr, ts_us), unique per key (pre-collapse a batch
    with multiple observations per key to the LATEST first —
    ``merge_rows``'s precondition, same reason).

    Semantics per update row: attr equal to the key's current attr →
    no-op; attr changed → close the current row (valid_to = ts,
    is_current = false) and open a new one; unseen key → open its
    first row. Historical rows pass through untouched.

    Spark-first shape: ONE full-outer join of the current slice with
    the update batch on the key classifies every case; the output is
    the union of pass-through, closed, and opened rows — no window,
    no iteration. At 100 TB pair it with a partitioned/current-flag
    table layout so only the current partition rewrites (the same
    pairing note as ``merge_rows``).

    The one-current-row-per-key invariant holds inductively: each
    key contributes exactly one is_current output row (kept, or the
    newly opened one).
    """
    cur = target.filter(F.col("is_current"))
    hist = target.filter(~F.col("is_current"))
    upd = updates.select(
        F.col(key).alias("_k"),
        F.col(attr).alias("_new_attr"),
        F.col(ts_col).alias("_ts"),
    )
    j = cur.join(upd, cur[key] == upd["_k"], "full")
    changed = F.col("_k").isNotNull() & (
        F.col(key).isNull() | (F.col(attr) != F.col("_new_attr"))
    )
    # pass-through: current rows with no update, or an equal-attr update
    keep = j.filter(F.col(key).isNotNull() & ~changed).select(
        target.columns
    )
    closed = (
        j.filter(F.col(key).isNotNull() & changed)
        .select(
            key,
            attr,
            "valid_from_us",
            F.col("_ts").alias("valid_to_us"),
            F.lit(False).alias("is_current"),
        )
    )
    opened = j.filter(changed).select(
        F.col("_k").alias(key),
        F.col("_new_attr").alias(attr),
        F.col("_ts").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.select(target.columns)
        .unionByName(keep)
        .unionByName(closed.select(target.columns))
        .unionByName(opened.select(target.columns))
    )
