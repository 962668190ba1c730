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


# ---------------------------------------------------------------------------
# Dataset version lineage (round-10 verdict #7). A dataset release
# chain is auditable when every version carries an order-independent
# content fingerprint AND the recorded diff to its parent composes:
# child_fp == (parent_fp + delta_fp) mod M. The fingerprint is a
# MODULAR SUM of per-doc hashes h(id, payload) — associative and
# commutative, so it aggregates map-side in any grouping, merges
# across partitions/shards without order, and the diff's delta is
# exactly (sum of added+changed new hashes) − (sum of removed+changed
# old hashes): a version is verifiable as parent ⊕ diff WITHOUT
# rescanning the parent corpus.

VL_MOD = (1 << 61) - 1  # Mersenne prime: modular-sum fingerprint field
VL_FP_BUCKETS = 1024  # two-level mod-sum: partials stay far below 2^63


def _doc_fp_expr(id_col: str, hash_col: str):
    """Per-doc lineage hash h(id, payload-digest) — binds the id to
    the content digest so moving a payload between ids changes the
    fingerprint (a payload-only sum would not)."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )

    return F.expr(
        md5_int_spark_sql(
            f"concat(cast({id_col} as string), '#', {hash_col})"
        )
    )


def _two_level_agg(df: DataFrame, partials: dict, finals: dict) -> DataFrame:
    """Two-level aggregate: ``partials`` per execution-partition
    bucket (each modular sum reduced mod VL_MOD so partials stay far
    below int64 overflow at corpus scale), then ``finals`` over the
    buckets — ONE row out, no singleton joins (literal-keyed
    singleton equi-joins constant-fold to cartesians). Modular
    addition is associative/commutative, so any bucketing yields the
    same value and the oracle's single-level sum matches."""
    part = df.groupBy(
        (F.spark_partition_id() % VL_FP_BUCKETS).alias("_b")
    ).agg(*[e.alias(n) for n, e in partials.items()])
    return part.groupBy().agg(*[e.alias(n) for n, e in finals.items()])


def corpus_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """One-row (n_docs, fp): the order-independent modular content
    fingerprint of a corpus version. Doc-grain scan + two-level
    mod-sum — no window, no sort, merges at any parallelism."""
    payload = F.md5(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in payload_cols]
        )
    )
    h = df.select(
        F.col(id_col).alias("_id"), payload.alias("_ph")
    ).select(_doc_fp_expr("_id", "_ph").alias("_h"))
    return _two_level_agg(
        h,
        partials={
            "_n": F.count("*"),
            "_p": F.sum("_h") % VL_MOD,
        },
        finals={
            "n_docs": F.sum("_n").cast("long"),
            "fp": F.sum("_p") % VL_MOD,
        },
    )


def version_lineage_manifest(
    frames: list,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """The release-chain manifest over an ordered list of corpus
    versions: one row per version with (version, n_docs, fp,
    parent_fp, n_added, n_removed, n_changed, n_unchanged, delta_fp,
    chain_ok). delta_fp derives from ``snapshot_diff``'s digest
    columns alone — the diff output is sufficient to roll the parent
    fingerprint forward, which is what makes a stored (parent_fp,
    delta_fp, fp) triple tamper-evident: recompute any version's fp
    and the recorded chain must reproduce it exactly
    (tests/test_version_lineage.py mutates a parent and watches the
    chain break).

    Scale: per-version fingerprints are doc-grain mod-sums; each
    parent→child diff is snapshot_diff's digest-only full-outer join;
    the manifest assembly joins VERSION-grain singletons. Nothing
    rescans a parent corpus to verify a child."""
    spark = frames[0].sparkSession
    fps = None
    for v, df in enumerate(frames):
        row = corpus_fingerprint(df, id_col, payload_cols).select(
            F.lit(v).cast("long").alias("version"), "n_docs", "fp"
        )
        fps = row if fps is None else fps.unionByName(row)
    diffs = None
    for v in range(1, len(frames)):
        d = snapshot_diff(
            frames[v - 1], frames[v], id_col, payload_cols
        )
        hold = _doc_fp_expr(id_col, "old_hash")
        hnew = _doc_fp_expr(id_col, "new_hash")
        scored = d.select(
            F.lit(v).cast("long").alias("version"),
            "status",
            F.when(F.col("status").isin("added", "changed"), hnew)
            .otherwise(F.lit(0))
            .alias("_plus"),
            F.when(F.col("status").isin("removed", "changed"), hold)
            .otherwise(F.lit(0))
            .alias("_minus"),
        )
        def n_of(st):
            return F.sum(
                F.when(F.col("status") == st, 1).otherwise(0)
            )

        delta = _two_level_agg(
            scored,
            partials={
                "_a": n_of("added"),
                "_r": n_of("removed"),
                "_c": n_of("changed"),
                "_u": n_of("unchanged"),
                "_sp": F.sum("_plus") % VL_MOD,
                "_sm": F.sum("_minus") % VL_MOD,
            },
            finals={
                "n_added": F.sum("_a").cast("long"),
                "n_removed": F.sum("_r").cast("long"),
                "n_changed": F.sum("_c").cast("long"),
                "n_unchanged": F.sum("_u").cast("long"),
                "delta_fp": (
                    (F.sum("_sp") - F.sum("_sm")) % VL_MOD + VL_MOD
                )
                % VL_MOD,
            },
        ).select(F.lit(v).cast("long").alias("version"), "*")
        diffs = delta if diffs is None else diffs.unionByName(delta)
    parent = fps.select(
        (F.col("version") + 1).alias("version"),
        F.col("fp").alias("parent_fp"),
    )
    out = fps.join(parent, "version", "left")
    if diffs is not None:
        out = out.join(diffs, "version", "left")
    else:
        for c in (
            "n_added",
            "n_removed",
            "n_changed",
            "n_unchanged",
            "delta_fp",
        ):
            out = out.withColumn(c, F.lit(None).cast("long"))
    return out.select(
        "version",
        "n_docs",
        "fp",
        "parent_fp",
        F.coalesce("n_added", F.lit(0)).alias("n_added"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.coalesce("n_changed", F.lit(0)).alias("n_changed"),
        F.coalesce("n_unchanged", F.lit(0)).alias("n_unchanged"),
        F.coalesce("delta_fp", F.lit(0)).alias("delta_fp"),
        F.when(F.col("parent_fp").isNull(), F.lit(True))
        .otherwise(
            (F.col("parent_fp") + F.col("delta_fp")) % VL_MOD
            == F.col("fp")
        )
        .alias("chain_ok"),
    )


def version_lineage_manifest_aligned(
    docs: DataFrame,
    versions: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """``version_lineage_manifest`` for the ROW-ALIGNED case: every
    version is a (membership predicate, payload expression) pair over
    ONE base relation, so version v's frame is
    ``docs.filter(member_v).select(id, payload_v)``. The generic
    manifest treats the frames as opaque — V fingerprint scans plus
    V−1 digest full-outer self-joins, each rescanning the base. But a
    full outer join of two row-aligned slices on the shared id is a
    per-ROW comparison: (in_{v-1}, ph_{v-1}) vs (in_v, ph_v) decides
    added/removed/changed/unchanged and the delta hashes without any
    join. So the whole manifest — every version's (n_docs, fp) AND
    every consecutive diff's counts + delta_fp — collapses to ONE
    scan computing per-row membership flags and payload digests for
    all versions, ONE two-level modular aggregate (same
    ``VL_FP_BUCKETS`` partials as the generic form, so the sums are
    identical), and a V-row literal reshape of the single result row.

    ``versions`` is a list of (member_sql, payload_sql) pairs —
    SQL fragments over ``docs``'s columns (the VL_RULES convention).
    Output is row-for-row identical to
    ``version_lineage_manifest([docs.filter(m).select(id, F.expr(p)
    .alias('text')) for m, p in versions])`` — pinned by
    tests/test_version_lineage.py::test_aligned_matches_generic."""
    nv = len(versions)
    row = docs.select(
        F.col(id_col).alias("_id"),
        *[
            F.expr(member).alias(f"_in{v}")
            for v, (member, _) in enumerate(versions)
        ],
        *[
            # exactly the generic manifest's payload digest
            # (concat_ws skips NULLs, so a NULL payload hashes as
            # md5('') there — match it bit-for-bit)
            F.md5(F.concat_ws("\x1f", F.expr(payload).cast("string")))
            .alias(f"_ph{v}")
            for v, (_, payload) in enumerate(versions)
        ],
    )
    # per-version fingerprint terms + per-pair diff terms, all from
    # the one row
    partials: dict = {}
    finals: dict = {}
    for v in range(nv):
        inv = F.col(f"_in{v}")
        hv = _doc_fp_expr("_id", f"_ph{v}")
        partials[f"_n{v}"] = F.sum(inv.cast("long"))
        partials[f"_p{v}"] = (
            F.sum(F.when(inv, hv).otherwise(F.lit(0))) % VL_MOD
        )
        finals[f"n{v}"] = F.sum(f"_n{v}").cast("long")
        finals[f"fp{v}"] = F.sum(f"_p{v}") % VL_MOD
    for v in range(1, nv):
        po, pn = F.col(f"_in{v-1}"), F.col(f"_in{v}")
        ho = _doc_fp_expr("_id", f"_ph{v-1}")
        hn = _doc_fp_expr("_id", f"_ph{v}")
        changed = po & pn & (F.col(f"_ph{v-1}") != F.col(f"_ph{v}"))
        added = ~po & pn
        removed = po & ~pn
        unchanged = po & pn & (F.col(f"_ph{v-1}") == F.col(f"_ph{v}"))
        partials[f"_a{v}"] = F.sum(added.cast("long"))
        partials[f"_r{v}"] = F.sum(removed.cast("long"))
        partials[f"_c{v}"] = F.sum(changed.cast("long"))
        partials[f"_u{v}"] = F.sum(unchanged.cast("long"))
        partials[f"_sp{v}"] = (
            F.sum(F.when(added | changed, hn).otherwise(F.lit(0)))
            % VL_MOD
        )
        partials[f"_sm{v}"] = (
            F.sum(F.when(removed | changed, ho).otherwise(F.lit(0)))
            % VL_MOD
        )
        for c in ("a", "r", "c", "u"):
            finals[f"{c}{v}"] = F.sum(f"_{c}{v}").cast("long")
        finals[f"d{v}"] = (
            (F.sum(f"_sp{v}") - F.sum(f"_sm{v}")) % VL_MOD + VL_MOD
        ) % VL_MOD
    one = _two_level_agg(row, partials, finals)
    # V-row reshape of the single aggregate row — version grain, the
    # same manifest columns/verdict as the generic assembly
    manifest_rows = F.array(
        *[
            F.struct(
                F.lit(v).cast("long").alias("version"),
                F.col(f"n{v}").alias("n_docs"),
                F.col(f"fp{v}").alias("fp"),
                (
                    F.col(f"fp{v-1}")
                    if v > 0
                    else F.lit(None).cast("long")
                ).alias("parent_fp"),
                (
                    F.col(f"a{v}") if v > 0 else F.lit(0).cast("long")
                ).alias("n_added"),
                (
                    F.col(f"r{v}") if v > 0 else F.lit(0).cast("long")
                ).alias("n_removed"),
                (
                    F.col(f"c{v}") if v > 0 else F.lit(0).cast("long")
                ).alias("n_changed"),
                (
                    F.col(f"u{v}") if v > 0 else F.lit(0).cast("long")
                ).alias("n_unchanged"),
                (
                    F.col(f"d{v}") if v > 0 else F.lit(0).cast("long")
                ).alias("delta_fp"),
                (
                    ((F.col(f"fp{v-1}") + F.col(f"d{v}")) % VL_MOD
                     == F.col(f"fp{v}"))
                    if v > 0
                    else F.lit(True)
                ).alias("chain_ok"),
            )
            for v in range(nv)
        ]
    )
    return one.select(
        F.explode(manifest_rows).alias("_m")
    ).select("_m.*")
