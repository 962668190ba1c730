"""Data-quality constraint audit — the Deequ-style verification layer
a 100 TB ingest needs in front of every pipeline in this package:
declarative checks (completeness, uniqueness, domain, range,
referential integrity, derived-column consistency) evaluated as
ordinary aggregates so Catalyst fuses them into per-table scans.

Reference has no audit surface (its BigQuery SQL assumes clean
tables); this is an engine extension in the spirit of
spark-deequ/great-expectations, built from public technique only.

Scale: every check is a scan-local aggregate (map-side partial, one
tiny shuffle) except referential integrity, which is the canonical
shuffle anti-join on the key; the result set is #checks rows. At
production scale the per-table checks fuse into ONE pass per table
(they already share their aggregate here) and the audit runs as a
gate before downstream plans consume the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.contracts import (
    EMBEDDING_DIM,
    EVENT_TYPES,
)
from firefox_public_data_report_etl_spark.functions import cents
from firefox_public_data_report_etl_spark.sources import load_table


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, check, observed, violations, ok) — one row per
    constraint. `observed` is a data-dependent magnitude (row count,
    distinct count, …) so the oracle hash pins the check computation
    itself, not just the happy-path zeros."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")
    embeddings = load_table(spark, sf_dir, "embeddings")

    def row(table, check, observed, violations):
        return F.struct(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check"),
            observed.cast("long").alias("observed"),
            violations.cast("long").alias("violations"),
        )

    # one fused aggregate per table; each produces several check rows
    o = orders.agg(
        F.explode(
            F.array(
                row(
                    "orders", "row_count_positive",
                    F.count("*"), (F.count("*") == 0).cast("long"),
                ),
                row(
                    "orders", "orderdate_complete",
                    F.count("o_orderdate"),
                    F.count("*") - F.count("o_orderdate"),
                ),
            )
        ).alias("r")
    )
    li = lineitem.agg(
        F.explode(
            F.array(
                row(
                    "lineitem", "quantity_in_1_50",
                    F.count("*"),
                    F.sum(
                        (
                            F.col("l_quantity").isNull()
                            | ~F.col("l_quantity").between(1, 50)
                        ).cast("long")
                    ),
                ),
                row(
                    "lineitem", "discount_in_0_0.1",
                    F.count("*"),
                    F.sum(
                        (
                            F.col("l_discount").isNull()
                            | ~F.col("l_discount").between(0.0, 0.1)
                        ).cast("long")
                    ),
                ),
            )
        ).alias("r")
    )
    ev = events.agg(
        F.explode(
            F.array(
                # NULL-safe: a NULL event_type/value is a violation,
                # not a skipped row — `x NOT IN (...)` and `x < 0` are
                # NULL for NULL x, which SUM would silently drop, so
                # every predicate ORs an explicit isNull term (the
                # Deequ completeness+domain composition).
                row(
                    "events", "event_type_in_domain",
                    F.count_distinct("event_type"),
                    F.sum(
                        (
                            F.col("event_type").isNull()
                            | ~F.col("event_type").isin(*EVENT_TYPES)
                        ).cast("long")
                    ),
                ),
                row(
                    "events", "value_non_negative",
                    F.count("value"),
                    F.sum(
                        (
                            F.col("value").isNull() | (F.col("value") < 0)
                        ).cast("long")
                    ),
                ),
            )
        ).alias("r")
    )
    doc = documents.agg(
        F.explode(
            F.array(
                row(
                    "documents", "doc_id_unique",
                    F.count_distinct("doc_id"),
                    F.count("*") - F.count_distinct("doc_id"),
                ),
                row(
                    "documents", "n_chars_matches_text",
                    F.count("*"),
                    F.sum(
                        (
                            F.col("n_chars").isNull()
                            | F.col("text").isNull()
                            | (F.col("n_chars") != F.length("text"))
                        ).cast("long")
                    ),
                ),
            )
        ).alias("r")
    )
    emb = embeddings.agg(
        F.explode(
            F.array(
                row(
                    "embeddings", f"dim_is_{EMBEDDING_DIM}",
                    F.count("*"),
                    F.sum(
                        (
                            F.col("embedding").isNull()
                            | (F.size("embedding") != EMBEDDING_DIM)
                        ).cast("long")
                    ),
                ),
            )
        ).alias("r")
    )
    # referential integrity: the one check that is inherently a join
    fk = (
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(
            F.explode(
                F.array(
                    row(
                        "orders", "custkey_fk_into_customer",
                        F.count("*"), F.count("*"),
                    )
                )
            ).alias("r")
        )
    )
    stacked = o.unionAll(li).unionAll(ev).unionAll(doc).unionAll(emb)
    stacked = stacked.unionAll(fk)
    return stacked.select("r.*").withColumn(
        "ok", F.col("violations") == 0
    )


_EVENT_TYPE_LIST = ", ".join(f"'{t}'" for t in EVENT_TYPES)

DATA_QUALITY_ORACLE = f"""
SELECT 'orders' AS table_name, 'row_count_positive' AS check,
       CAST(count(*) AS BIGINT) AS observed,
       CAST(count(*) = 0 AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'orders', 'orderdate_complete',
       CAST(count(o_orderdate) AS BIGINT),
       CAST(count(*) - count(o_orderdate) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem', 'quantity_in_1_50', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_quantity IS NULL
                       OR l_quantity NOT BETWEEN 1 AND 50
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem', 'discount_in_0_0.1', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_discount IS NULL
                       OR l_discount NOT BETWEEN 0.0 AND 0.1
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events', 'event_type_in_domain',
       CAST(count(DISTINCT event_type) AS BIGINT),
       CAST(sum(CASE WHEN event_type IS NULL
                       OR event_type NOT IN ({_EVENT_TYPE_LIST})
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'events', 'value_non_negative', CAST(count(value) AS BIGINT),
       CAST(sum(CASE WHEN value IS NULL OR value < 0
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'documents', 'doc_id_unique',
       CAST(count(DISTINCT doc_id) AS BIGINT),
       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
FROM documents
UNION ALL
SELECT 'documents', 'n_chars_matches_text', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_chars IS NULL OR text IS NULL
                       OR n_chars != length(text)
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'embeddings', 'dim_is_{EMBEDDING_DIM}', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN embedding IS NULL
                       OR len(embedding) != {EMBEDDING_DIM}
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM embeddings
UNION ALL
SELECT 'orders', 'custkey_fk_into_customer',
       CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
"""

_ORACLE_WRAP = f"""
SELECT table_name, "check", observed, violations, violations = 0 AS ok
FROM ({DATA_QUALITY_ORACLE.strip()}) t
"""

# Snapshot derivation for the version-diff audit: both corpus
# versions are pure functions of the one documents table (portable
# md5 bucket of doc_id), so the query needs no second physical
# snapshot and the oracle recomputes both sides bit-identically.
#   old = buckets [0,90)       new = buckets [10,100)
#   buckets [40,60) carry an edited payload in the new version
SNAP_OLD_MAX = 90
SNAP_NEW_MIN = 10
SNAP_EDIT_LO, SNAP_EDIT_HI = 40, 60
SNAP_EDIT_SUFFIX = " [rev2]"


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-release changelog (operators/maintenance.py:
    snapshot_diff): full-outer content-hash diff of two corpus
    versions — added / removed / changed / unchanged per doc_id. The
    two versions here are deterministic hash-bucket slices of the
    documents table (10% retired, 10% new, 20% edited), so the
    DuckDB twin pins the whole diff including both hash columns.

    Scale: hashes are computed under the scan BEFORE the join, so
    the full-outer shuffle moves (id, 32-byte digest) rows — the diff
    of two 100 TB snapshots is a join of two fingerprint tables."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.maintenance import (
        snapshot_diff,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            F.expr(md5_int_spark_sql("cast(doc_id as string)")) % 100
        ).alias("bkt"),
    )
    old = docs.filter(F.col("bkt") < SNAP_OLD_MAX).select("doc_id", "text")
    new = docs.filter(F.col("bkt") >= SNAP_NEW_MIN).select(
        "doc_id",
        F.when(
            (F.col("bkt") >= SNAP_EDIT_LO) & (F.col("bkt") < SNAP_EDIT_HI),
            F.concat(F.col("text"), F.lit(SNAP_EDIT_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new)


def _snapshot_diff_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    return f"""
WITH b AS (SELECT doc_id, text,
             {md5_int_sql("cast(doc_id as varchar)")} % 100 AS bkt
           FROM documents),
o AS (SELECT doc_id, md5(text) AS old_hash FROM b WHERE bkt < {SNAP_OLD_MAX}),
n AS (SELECT doc_id,
        md5(CASE WHEN bkt >= {SNAP_EDIT_LO} AND bkt < {SNAP_EDIT_HI}
                 THEN text || '{SNAP_EDIT_SUFFIX}' ELSE text END) AS new_hash
      FROM b WHERE bkt >= {SNAP_NEW_MIN}),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id, old_hash, new_hash,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash <> new_hash THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j
"""


# --- snapshot drift audit ---------------------------------------------
#
# Fixed literal bin edges over doc length + an integer-exact total
# variation distance. TVD instead of PSI/KL deliberately: the
# transcendental log puts the two engines' float summation order in
# the hash, while TVD's numerator sum(|c_i*n_b - d_i*n_a|) and the
# ppm quotient are pure int64 — drift is hash-pinnable bit-for-bit.
DRIFT_BIN_EDGES = [100, 200, 300, 400, 500]
DRIFT_PPM_THRESHOLD = 150_000  # 15% TVD → "drifted"


def corpus_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift between two corpus releases —
    the monitoring gate every production training pipeline runs
    before promoting a snapshot: bin doc lengths with literal edges,
    count per (source, bin, side), and score each source's shift as
    integer-exact total variation distance in ppm (``tvd_ppm =
    10^6 * 1/2 * Σ|p_i - q_i|`` computed as
    ``(10^6 * Σ|c_i*n_b - d_i*n_a|) // (2*n_a*n_b)`` — no floats, no
    log, so the DuckDB oracle matches bit-for-bit; an empty side
    scores max drift). The releases are the `corpus_snapshot_diff`
    pair, so the changelog and its drift verdict describe the same
    promotion.

    Scale: two column-pruned scans → map-side partial counts into a
    (sources × bins × 2)-row aggregate; the TVD window runs on that
    report-sized relation. 100 TB costs the two scans, nothing else.
    (int64 bound: the ppm quotient needs 10^6·tvd_num < 2^63, i.e.
    n_a·n_b < ~4.6e12 per source — beyond that a production caller
    pre-buckets counts down by a power of ten before the quotient.)"""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        (
            F.expr(md5_int_spark_sql("cast(doc_id as string)")) % 100
        ).alias("bkt"),
    )
    old = docs.filter(F.col("bkt") < SNAP_OLD_MAX).select(
        "source", F.length("text").alias("len"), F.lit("a").alias("side")
    )
    new = docs.filter(F.col("bkt") >= SNAP_NEW_MIN).select(
        "source",
        F.length(
            F.when(
                (F.col("bkt") >= SNAP_EDIT_LO)
                & (F.col("bkt") < SNAP_EDIT_HI),
                F.concat(F.col("text"), F.lit(SNAP_EDIT_SUFFIX)),
            ).otherwise(F.col("text"))
        ).alias("len"),
        F.lit("b").alias("side"),
    )
    edges = DRIFT_BIN_EDGES
    bin_expr = F.when(F.col("len") < edges[0], 0)
    for i in range(1, len(edges)):
        bin_expr = bin_expr.when(F.col("len") < edges[i], i)
    bin_expr = bin_expr.otherwise(len(edges))
    counted = (
        old.unionByName(new)
        .select("source", bin_expr.alias("bin"), "side")
        .groupBy("source", "bin")
        .agg(
            F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias(
                "c_a"
            ),
            F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias(
                "c_b"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    withn = counted.select(
        "source",
        "c_a",
        "c_b",
        F.sum("c_a").over(w).alias("n_a"),
        F.sum("c_b").over(w).alias("n_b"),
    )
    out = withn.groupBy("source").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.sum(
            F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
        ).alias("tvd_num"),
    )
    tvd_ppm = F.when(
        (F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(1_000_000)
    ).otherwise(
        F.expr("(1000000 * tvd_num) div (2 * n_a * n_b)")
    )
    return out.select(
        "source",
        "n_a",
        "n_b",
        "tvd_num",
        tvd_ppm.cast("long").alias("tvd_ppm"),
        (tvd_ppm >= DRIFT_PPM_THRESHOLD).alias("drifted"),
    )


def _drift_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    edges = DRIFT_BIN_EDGES
    bin_sql = "CASE " + " ".join(
        f"WHEN len < {e} THEN {i}" for i, e in enumerate(edges)
    ) + f" ELSE {len(edges)} END"
    bucket = f"{md5_int_sql('cast(doc_id as string)')} % 100"
    return f"""
WITH b AS (SELECT doc_id, source, text, {bucket} AS bkt FROM documents),
sides AS (
  SELECT source, length(text) AS len, 'a' AS side
  FROM b WHERE bkt < {SNAP_OLD_MAX}
  UNION ALL
  SELECT source,
         length(CASE WHEN bkt >= {SNAP_EDIT_LO} AND bkt < {SNAP_EDIT_HI}
                     THEN text || '{SNAP_EDIT_SUFFIX}' ELSE text END),
         'b'
  FROM b WHERE bkt >= {SNAP_NEW_MIN}
),
counted AS (
  SELECT source, {bin_sql} AS bin,
         CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM sides GROUP BY source, {bin_sql}
),
withn AS (
  SELECT source, c_a, c_b,
         SUM(c_a) OVER (PARTITION BY source) AS n_a,
         SUM(c_b) OVER (PARTITION BY source) AS n_b
  FROM counted
),
agg AS (
  SELECT source,
         CAST(MIN(n_a) AS BIGINT) AS n_a,
         CAST(MIN(n_b) AS BIGINT) AS n_b,
         CAST(SUM(abs(c_a * n_b - c_b * n_a)) AS BIGINT) AS tvd_num
  FROM withn GROUP BY source
)
SELECT source, n_a, n_b, tvd_num,
       CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 1000000
                 ELSE (1000000 * tvd_num) // (2 * n_a * n_b) END
            AS BIGINT) AS tvd_ppm,
       (CASE WHEN n_a = 0 OR n_b = 0 THEN 1000000
             ELSE (1000000 * tvd_num) // (2 * n_a * n_b) END)
         >= {DRIFT_PPM_THRESHOLD} AS drifted
FROM agg
"""


# --- Poisson bootstrap ------------------------------------------------
#
# The scalable bootstrap: classical resampling needs B shuffles of
# the corpus; the Poisson bootstrap replaces each resample with an
# independent Poisson(1) weight per (row, replicate) — one pass, no
# resample materialization, B weights computed map-side. Weights are
# drawn deterministically from the portable md5 fragment against the
# Poisson(1) CDF as integer ppm literals, so the DuckDB oracle
# replays every replicate bit-for-bit. (The md5 uniform is 28-bit
# reduced mod 10^6 — a ~0.16% non-uniformity on low residues, shared
# exactly by both engines and far below bootstrap noise.)
BOOT_B = 32
# cumulative Poisson(1) CDF in ppm: P(X <= k), k = 0..7; X capped at 8
BOOT_CDF_PPM = [367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990]


def _poisson_weight_case(u_sql: str) -> str:
    """CASE fragment (valid in both dialects): uniform-ppm → weight."""
    whens = " ".join(
        f"WHEN {u_sql} < {c} THEN {k}" for k, c in enumerate(BOOT_CDF_PPM)
    )
    return f"(CASE {whens} ELSE {len(BOOT_CDF_PPM)} END)"


def corpus_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mean document length with a 32-replicate Poisson
    bootstrap confidence band — the uncertainty every corpus datasheet
    should carry but almost none computes, because classical
    bootstrap resampling is unaffordable at corpus scale. Emits the
    full-sample point estimate (integer milli-chars) and the
    [2nd, 31st] order statistics of the replicate means (~94% band),
    rank ties broken by replicate id so the band is total-ordered and
    hash-stable.

    Scale: ONE corpus pass — the replicate explode is map-side
    (B rows per doc feeding a partial agg), the shuffle carries
    languages × B aggregate rows, and the order statistics run on
    B-row partitions. No resample is ever materialized."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").cast("long").alias("len")
    )
    u = md5_int_spark_sql("concat('boot', cast(b as string), '|', cast(doc_id as string))")
    rep = (
        docs.select(
            "lang",
            "len",
            F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("b"),
            "doc_id",
        )
        .withColumn("w", F.expr(_poisson_weight_case(f"({u} % 1000000)")))
    )
    means = rep.groupBy("lang", "b").agg(
        F.when(
            F.sum("w") > 0,
            F.expr("(1000 * sum(w * len)) div sum(w)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mean_milli")
    )
    w_rank = Window.partitionBy("lang").orderBy("mean_milli", "b")
    ranked = means.withColumn("rk", F.row_number().over(w_rank))
    band = ranked.groupBy("lang").agg(
        F.max(F.when(F.col("rk") == 2, F.col("mean_milli"))).alias(
            "ci_lo_milli"
        ),
        F.max(
            F.when(F.col("rk") == BOOT_B - 1, F.col("mean_milli"))
        ).alias("ci_hi_milli"),
    )
    point = docs.groupBy("lang").agg(
        F.expr("(1000 * sum(len)) div count(*)").alias("point_milli"),
        F.count("*").alias("n_docs"),
    )
    return point.join(band, "lang").select(
        "lang", "n_docs", "point_milli", "ci_lo_milli", "ci_hi_milli"
    )


def _bootstrap_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    u = md5_int_sql(
        "('boot' || CAST(b AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))"
    )
    w = _poisson_weight_case(f"({u} % 1000000)")
    return f"""
WITH d AS (SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS len
           FROM documents),
rep AS (SELECT lang, len, CAST(t.b AS BIGINT) AS b,
               CAST({w} AS BIGINT) AS w
        FROM d, UNNEST(generate_series(0, {BOOT_B - 1})) AS t(b)),
means AS (
  SELECT lang, b,
         CAST(CASE WHEN sum(w) > 0
                   THEN (1000 * sum(w * len)) // sum(w)
                   ELSE 0 END AS BIGINT) AS mean_milli
  FROM rep GROUP BY lang, b),
ranked AS (
  SELECT lang, mean_milli,
         row_number() OVER (PARTITION BY lang
                            ORDER BY mean_milli, b) AS rk
  FROM means),
band AS (
  SELECT lang,
         MAX(CASE WHEN rk = 2 THEN mean_milli END) AS ci_lo_milli,
         MAX(CASE WHEN rk = {BOOT_B - 1} THEN mean_milli END)
           AS ci_hi_milli
  FROM ranked GROUP BY lang),
pt AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST((1000 * sum(len)) // count(*) AS BIGINT) AS point_milli
  FROM d GROUP BY lang)
SELECT pt.lang, n_docs, point_milli, ci_lo_milli, ci_hi_milli
FROM pt JOIN band ON pt.lang = band.lang
"""


# 3-version release chain (round-10 verdict #7): deterministic
# hash-bucket membership + edit rules per version, written as SQL
# fragments valid in BOTH dialects (|| concat, CASE) so the Spark
# frames (via F.expr) and the DuckDB oracle share one rule source.
VL_RULES = [
    ("bkt < 90", "text"),
    (
        "bkt >= 10",
        "CASE WHEN bkt >= 40 AND bkt < 60"
        " THEN text || ' [rev2]' ELSE text END",
    ),
    (
        "(bkt >= 10 AND NOT (bkt >= 80 AND bkt < 90)) OR bkt < 5",
        "CASE WHEN bkt >= 40 AND bkt < 60 THEN text || ' [rev2]'"
        " WHEN bkt >= 20 AND bkt < 30 THEN text || ' [rev3]'"
        " ELSE text END",
    ),
]


def corpus_version_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset version lineage chain (round-10 verdict #7): three
    rule-defined corpus versions (drops, re-adds, and two edit waves)
    roll through operators/maintenance.py:version_lineage_manifest —
    per version an order-independent modular content fingerprint,
    the parent's fingerprint, snapshot_diff's changelog counts, and
    the diff-derived delta_fp with the audit verdict
    chain_ok = (parent_fp + delta_fp) % M == fp. A stored manifest
    row makes any version verifiable as parent ⊕ diff without
    rescanning the parent; tampering with either side breaks the
    equation (tests/test_version_lineage.py).

    Scale: fingerprints are doc-grain two-level mod-sums (map-side
    combined, no window/sort); diffs are digest-only full-outer
    joins; the assembly joins version-grain singletons."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.maintenance import (
        version_lineage_manifest_aligned,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            F.expr(md5_int_spark_sql("cast(doc_id as string)")) % 100
        ).alias("bkt"),
    )
    # Round 12 (guide §2.4): the three versions are row-aligned
    # derivations of ONE documents scan, so the generic manifest's
    # 3 fingerprint scans + 2 digest full-outer self-joins collapse
    # to one scan + one two-level aggregate (identical mod-sums,
    # identical output — tests/test_version_lineage.py pins aligned
    # == generic on these rules).
    return version_lineage_manifest_aligned(docs, VL_RULES)


def _version_lineage_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.maintenance import (
        VL_MOD,
    )

    h_of = md5_int_sql("cast(doc_id as varchar) || '#' || ph")
    parts = [
        f"""b AS (SELECT doc_id, text,
             {md5_int_sql("cast(doc_id as varchar)")} % 100 AS bkt
           FROM documents)"""
    ]
    for v, (member, rule) in enumerate(VL_RULES):
        parts.append(
            f"v{v} AS (SELECT doc_id, md5({rule}) AS ph"
            f" FROM b WHERE {member})"
        )
        parts.append(
            f"""f{v} AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum({h_of}) % {VL_MOD} AS BIGINT) AS fp FROM v{v})"""
        )
    for v in range(1, len(VL_RULES)):
        parts.append(
            f"""d{v} AS (
  SELECT CASE WHEN o.ph IS NULL THEN 'added'
              WHEN n.ph IS NULL THEN 'removed'
              WHEN o.ph <> n.ph THEN 'changed'
              ELSE 'unchanged' END AS status,
         CASE WHEN o.ph IS NULL OR o.ph <> n.ph
              THEN {md5_int_sql("cast(coalesce(o.doc_id, n.doc_id) as varchar) || '#' || n.ph")}
              ELSE 0 END AS plus,
         CASE WHEN n.ph IS NULL OR o.ph <> n.ph
              THEN {md5_int_sql("cast(coalesce(o.doc_id, n.doc_id) as varchar) || '#' || o.ph")}
              ELSE 0 END AS minus
  FROM v{v - 1} o FULL OUTER JOIN v{v} n ON o.doc_id = n.doc_id)"""
        )
        parts.append(
            f"""s{v} AS (SELECT
  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_added,
  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_changed,
  CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unchanged,
  CAST(((sum(plus) - sum(minus)) % {VL_MOD} + {VL_MOD}) % {VL_MOD}
    AS BIGINT) AS delta_fp
  FROM d{v})"""
        )
    selects = [
        """SELECT CAST(0 AS BIGINT) AS version, f0.n_docs, f0.fp,
       CAST(NULL AS BIGINT) AS parent_fp,
       CAST(0 AS BIGINT) AS n_added, CAST(0 AS BIGINT) AS n_removed,
       CAST(0 AS BIGINT) AS n_changed, CAST(0 AS BIGINT) AS n_unchanged,
       CAST(0 AS BIGINT) AS delta_fp, TRUE AS chain_ok
FROM f0"""
    ]
    for v in range(1, len(VL_RULES)):
        selects.append(
            f"""SELECT CAST({v} AS BIGINT) AS version, f{v}.n_docs, f{v}.fp,
       f{v - 1}.fp AS parent_fp,
       s{v}.n_added, s{v}.n_removed, s{v}.n_changed, s{v}.n_unchanged,
       s{v}.delta_fp,
       (f{v - 1}.fp + s{v}.delta_fp) % {VL_MOD} = f{v}.fp AS chain_ok
FROM f{v}, f{v - 1}, s{v}"""
        )
    return (
        "\nWITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\n"
    )


SKEW_AUDIT_TOP_K = 10


def key_skew_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew audit over the event stream's user key
    (operators/skew.py:key_skew_audit) — the measurement that decides
    whether a hot aggregation/join needs the salted form: the K
    hottest keys with the global summary (row count, key cardinality,
    hottest-key count/share) and ``suggested_salt``, the number of
    salt buckets that would level the hottest key to the average.

    Scale: one map-side-combined key-grain count, a summary aggregate
    over that rollup, and a TakeOrderedAndProject top-K — no global
    sort, no window over data-grain rows."""
    from firefox_public_data_report_etl_spark.operators.skew import (
        key_skew_audit,
    )

    return key_skew_audit(
        load_table(spark, sf_dir, "events"), "user_id", SKEW_AUDIT_TOP_K
    )


KEY_SKEW_AUDIT_ORACLE = f"""
WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt FROM c),
r AS (SELECT key, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT)
               AS rank
      FROM c)
SELECT r.key, r.cnt, r.rank,
       CAST(r.cnt AS DOUBLE) / g.n_rows AS share,
       g.n_rows, g.n_keys, g.max_cnt,
       greatest(1, (g.max_cnt * g.n_keys) // g.n_rows) AS suggested_salt
FROM r, g WHERE r.rank <= {SKEW_AUDIT_TOP_K}
"""


def adaptive_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit DRIVING the plan: measure key skew first
    (key_skew_audit's summary — one key-grain rollup, one scalar
    action), then run the per-event-type distinct-user count through
    the salted two-stage form with ``n_salts`` set to the measured
    recommendation — statistics-driven physical planning, the manual
    analog of AQE's runtime skew handling for the aggregation side
    AQE doesn't cover. The salt count rides along in the output so
    the decision is auditable.

    Salted counting is exact (a key always lands in one salt
    bucket), so the oracle is the plain COUNT(DISTINCT) with the
    recommendation recomputed in SQL."""
    from firefox_public_data_report_etl_spark.operators.skew import (
        key_skew_audit,
        salted_count_distinct,
    )

    events = load_table(spark, sf_dir, "events")
    rec = (
        key_skew_audit(events, "user_id", k=1)
        .select("suggested_salt")
        .head()["suggested_salt"]
    )
    out = salted_count_distinct(
        events, ["event_type"], "user_id", "distinct_users", int(rec)
    )
    return out.withColumn("n_salts_used", F.lit(int(rec)).cast("long"))


ADAPTIVE_SALTED_ORACLE = """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt FROM c)
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
       (SELECT greatest(1, (max_cnt * n_keys) // n_rows) FROM g)
         AS n_salts_used
FROM events GROUP BY event_type
"""


KANON_K = 5  # a QI group smaller than this re-identifies its members
LDIV_L = 3  # and needs at least this many distinct sensitive values


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a data release: k-anonymity + l-diversity
    over the customer table — the companion to pii_redaction (which
    scrubs direct identifiers; THIS measures whether the remaining
    quasi-identifiers still single people out).

    Quasi-identifier tuple: (nation, market segment, balance rounded
    to the nearest 1000). Sensitive attribute: the exact balance.
    One row per QI group with its size, its distinct-sensitive count,
    and the two pass/fail booleans; release tooling suppresses or
    generalizes the failing groups.

    Scale: ONE groupBy on the QI tuple computes both measures
    (count + count_distinct fuse into the same aggregate); output is
    QI-domain-sized, not data-sized.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("long")
        .alias("bal_band"),
        cents(F.col("c_acctbal")).alias("bal_c"),
    )
    g = cust.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("group_n"),
        F.count_distinct("bal_c").alias("n_sensitive"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "group_n",
        "n_sensitive",
        (F.col("group_n") >= KANON_K).alias("k_anonymous"),
        (F.col("n_sensitive") >= LDIV_L).alias("l_diverse"),
    )


K_ANONYMITY_ORACLE = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
)
SELECT c_nationkey, c_mktsegment, bal_band,
       count(*) AS group_n,
       count(DISTINCT bal_c) AS n_sensitive,
       count(*) >= {KANON_K} AS k_anonymous,
       count(DISTINCT bal_c) >= {LDIV_L} AS l_diverse
FROM cust GROUP BY c_nationkey, c_mktsegment, bal_band
"""


QUERIES = {
    "data_quality_audit": data_quality_audit,
    "corpus_snapshot_diff": corpus_snapshot_diff,
    "corpus_drift_audit": corpus_drift_audit,
    "corpus_bootstrap_ci": corpus_bootstrap_ci,
    "corpus_version_lineage": corpus_version_lineage,
    "key_skew_audit_events": key_skew_audit_events,
    "adaptive_salted_distinct": adaptive_salted_distinct,
    "k_anonymity_audit": k_anonymity_audit,
}

ORACLES = {
    "data_quality_audit": _ORACLE_WRAP,
    "corpus_snapshot_diff": _snapshot_diff_oracle(),
    "corpus_drift_audit": _drift_oracle(),
    "corpus_bootstrap_ci": _bootstrap_oracle(),
    "corpus_version_lineage": _version_lineage_oracle(),
    "key_skew_audit_events": KEY_SKEW_AUDIT_ORACLE,
    "adaptive_salted_distinct": ADAPTIVE_SALTED_ORACLE,
    "k_anonymity_audit": K_ANONYMITY_ORACLE,
}
