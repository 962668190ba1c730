"""Table-maintenance planning operators.

At 100 TB the write side degrades without maintenance: streaming
ingestion and per-partition overwrites leave small files, and scan
throughput collapses when a table is a million 2 MB files. The
compaction PLAN — which files coalesce into which output — is itself
a dataframe computation over the file listing (path, bytes), which is
always tiny relative to the data (one row per file), so the planner
runs as a single-window query and the rewrite jobs it emits do the
heavy lifting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compaction_bins(
    files: DataFrame,
    size_col: str = "bytes",
    order_col: str = "path",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Assign each input file to a compaction bin by deterministic
    cumulative-sum binning: files in ``order_col`` order fill bins of
    ``target_bytes``; bin = floor(bytes-before-this-file / target).
    Every bin's total lands in [target, target + max_file) except the
    last — good enough for scan-size equalization, fully deterministic
    (no greedy data-dependent ordering), and expressible as ONE window
    over the file listing.

    Scale note: the single-partition ordered window is fine because
    the input is a FILE LISTING (≤ millions of rows, bytes-sized). For
    a billion-file lake, partition the window by table-partition key
    so each partition's listing bins independently."""
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn(
        "bin", F.floor(before / F.lit(target_bytes)).cast("long")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Corpus-version diff — the audit a dataset release runs between
    two snapshots before publishing a changelog: one row per id ever
    seen, with status ``added`` (new only), ``removed`` (old only),
    ``changed`` (both sides, payload hash differs) or ``unchanged``.

    Payload equality is md5-over-concat of ``payload_cols`` (hashes
    computed BEFORE the join, so the shuffle moves 32-byte digests,
    not documents — the dedup_exact rule). The join is a
    hash-partitioned full outer on the id — doc-grain, no window, no
    skew beyond the id distribution itself.
    """
    payload = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in payload_cols])
    )
    o = old.select(F.col(id_col), payload.alias("old_hash"))
    n = new.select(F.col(id_col), payload.alias("new_hash"))
    joined = o.join(n, id_col, "full_outer")
    return joined.select(
        id_col,
        "old_hash",
        "new_hash",
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
