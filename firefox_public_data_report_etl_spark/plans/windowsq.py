"""Window-function query shapes.

The reference itself needs no window frames (SURVEY.md §2.9) — these
complete the engine's surface for the operations any analytics user of
the reference would reach for next: sessionization (lag + cumulative
boundary counts) and both frame families (RANGE value-bounded trailing
windows, ROWS running totals). All exactly-deterministic (integer
micros / exact cents), so they get full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from firefox_public_data_report_etl_spark.functions import cents, week_start
from firefox_public_data_report_etl_spark.sources import load_table

SESSION_GAP_MIN = 30


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts when the gap to the user's
    previous event exceeds 30 minutes. Per user: session count, event
    count, and total active micros summed within sessions.

    Scale: one shuffle on user_id for the lag/cum-sum windows, then a
    per-user aggregate on the already-partitioned stream (no second
    shuffle — the window and the groupBy share partitioning).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("span_us").alias("active_us"),
        F.max("n_events").alias("max_session_events"),
    )


USER_SESSIONS_ORACLE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {SESSION_GAP_MIN * 60 * 1000000}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(us) - min(us) AS span_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(span_us) AS BIGINT) AS active_us,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
"""


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both window frame families over one daily revenue spine, issued
    as RAW SPARK SQL over a registered temp view (S3 — the reference
    submits SQL text, annotations.py; the engine's SQL entry point
    must behave identically to the DataFrame API):

    - RANGE frame: 28-day trailing revenue sum/avg per priority —
      value-bounded (a gap in days still spans 28 calendar days);
    - ROWS frame: running cumulative revenue per priority.

    Scale: one shuffle to daily grain, then one window shuffle on the
    5-key priority partitioning; both frames are computed in the same
    window pass (same partition + order), and the RANGE frame's state
    is time-bounded so memory per partition is constant.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH daily AS (
          SELECT o_orderpriority,
                 datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS day_no,
                 sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100 + 0.5) AS BIGINT))
                   AS day_cents
          FROM orders_v GROUP BY o_orderpriority, day_no
        )
        SELECT o_orderpriority, day_no, day_cents,
               sum(day_cents) OVER w AS trail_cents,
               count(*) OVER w AS trail_days,
               CAST(sum(day_cents) OVER w AS DOUBLE) / 100 / count(*) OVER w AS trail_avg,
               sum(day_cents) OVER c AS cum_cents
        FROM daily
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day_no
                     RANGE BETWEEN 27 PRECEDING AND CURRENT ROW),
               c AS (PARTITION BY o_orderpriority ORDER BY day_no
                     ROWS UNBOUNDED PRECEDING)
        """
    )


WINDOW_FRAMES_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day_no,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM orders GROUP BY o_orderpriority, day_no
)
SELECT o_orderpriority, day_no, day_cents,
       CAST(sum(day_cents) OVER w AS BIGINT) AS trail_cents,
       CAST(count(*) OVER w AS BIGINT) AS trail_days,
       CAST(sum(day_cents) OVER w AS DOUBLE) / 100 / count(*) OVER w AS trail_avg,
       CAST(sum(day_cents) OVER c AS BIGINT) AS cum_cents
FROM daily
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day_no RANGE BETWEEN 27 PRECEDING AND CURRENT ROW),
       c AS (PARTITION BY o_orderpriority ORDER BY day_no ROWS UNBOUNDED PRECEDING)
"""


def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE session-window operator (``F.session_window``, the
    Structured Streaming sessionization primitive) on its batch path,
    at per-session grain — the oracle twin of the lag+cumsum form
    (``user_sessions`` rolls up per user; this exposes each session).

    Semantics note the oracle mirrors exactly: ``session_window``
    merges an event into the current session iff it starts STRICTLY
    before session end (= last event + gap), so a gap of exactly 30
    minutes starts a NEW session — the lag formulation's ``>`` becomes
    ``>=`` here. ``end_us`` is last event + gap, Spark's definition.

    Scale: one shuffle on user_id; session merging is a sorted
    single pass per user (same cost shape as the lag form), and the
    identical code serves ``readStream`` input with a watermark
    (streaming/sessions.py) — state is gap-bounded.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    per = ev.groupBy(
        F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        "user_id",
    ).agg(F.count("*").alias("n_events"))
    return per.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("start_us"),
        F.unix_micros(F.col("w.end")).alias("end_us"),
        "n_events",
    )


_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

SESSION_WINDOW_ROLLUP_ORACLE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       min(us) AS start_us,
       max(us) + {_GAP_US} AS end_us,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


_INCIDENT_WINDOW_US = 6 * 3600 * 1_000_000
_INCIDENT_MIN_ERRORS = 3


def _sessions_lag_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session intervals with ``session_window``-identical
    semantics (new session when gap >= 30 min; end = last + gap),
    computed via the lag+cumsum window form.

    Why not call ``session_window_rollup``: the native MergingSessions
    operator hash-aggregates and sorts on a per-event STRUCT key
    (start, end) — measured 10.4x per 10x data at the top decade
    (SCALING.md round-4 curve), i.e. 16x slower than this form at 10M
    events. The window form shuffles once on user_id and sorts plain
    longs; results are identical (both are gate-checked against the
    same lag+cumsum oracle SQL)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap >= _GAP_US), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("us").alias("start_us"),
        (F.max("us") + F.lit(_GAP_US)).alias("end_us"),
        F.count("*").alias("n_events"),
    )


def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-×-fact interval overlap via the grid-bucketed range join
    (operators.rangejoin — NO BroadcastNestedLoopJoin, plan-asserted):
    user sessions overlapped in time with 'incident' windows (6-hour
    tumbling windows holding ≥3 error events). The classic ops
    question — which sessions ran during an incident — that a naive
    theta join cannot answer at scale.

    Scale: both interval sets derive from the same fact table with
    their own single aggregations; the overlap join's only shuffle is
    the equi-join on the 1-hour grid cell; the canonical-cell filter
    dedups pairs without a distinct.
    """
    from firefox_public_data_report_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    sessions = _sessions_lag_form(spark, sf_dir).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    ev = load_table(spark, sf_dir, "events")
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            (
                F.expr(f"unix_micros(ts) div {_INCIDENT_WINDOW_US}")
            ).alias("iwin")
        )
        .agg(F.count("*").alias("n_errors"))
        .filter(F.col("n_errors") >= _INCIDENT_MIN_ERRORS)
        .select(
            (F.col("iwin") * _INCIDENT_WINDOW_US).alias("i_start_us"),
            ((F.col("iwin") + 1) * _INCIDENT_WINDOW_US).alias("i_end_us"),
            "n_errors",
        )
    )
    pairs = interval_overlap_join(
        sessions, incidents, "start_us", "end_us", "i_start_us", "i_end_us"
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_overlaps"),
        F.sum("n_errors").alias("incident_errors"),
        F.max("n_events").alias("max_session_events"),
    )


SESSION_INCIDENT_ORACLE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
sessions AS (
  SELECT user_id, min(us) AS start_us, max(us) + {_GAP_US} AS end_us,
         count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
),
incidents AS (
  SELECT iwin * {_INCIDENT_WINDOW_US} AS i_start_us,
         (iwin + 1) * {_INCIDENT_WINDOW_US} AS i_end_us,
         n_errors
  FROM (SELECT epoch_us(ts) // {_INCIDENT_WINDOW_US} AS iwin,
               count(*) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY 1)
  WHERE n_errors >= {_INCIDENT_MIN_ERRORS}
)
SELECT s.user_id,
       count(*) AS n_overlaps,
       CAST(sum(n_errors) AS BIGINT) AS incident_errors,
       CAST(max(s.n_events) AS BIGINT) AS max_session_events
FROM sessions s JOIN incidents i
  ON s.start_us < i.i_end_us AND i.i_start_us < s.end_us
GROUP BY s.user_id
"""


def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) history build: collapse each
    user's event stream into runs of consecutive equal states
    (event_type), one row per run with [valid_from, valid_to) validity
    and an is_current flag — the gaps-and-islands rebuild every
    warehouse needs to turn an append-only event log into a queryable
    dimension history (Kimball SCD2, built from change-point detection:
    lag → change flag → cumulative run id).

    Distinct from ``user_sessions``: sessionization splits on TIME
    gaps; SCD2 splits on VALUE change regardless of time.

    The current (open) run closes at the user's last observed event so
    the validity column stays non-null (pandas null-int round-trip in
    the gate differs between engines); ``is_current`` carries the
    open-endedness.

    Scale: ONE shuffle on user_id — the change-flag window, the
    (user, run) aggregate, and the run-grain lead window all share the
    user partitioning, so the history rebuild of a 100 TB event log
    moves each event exactly once. Ordering is (ts, event_id) so ties
    are deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    return _scd2_runs(ev)


def _scd2_runs(ev: DataFrame) -> DataFrame:
    """Gaps-and-islands SCD2 rebuild over (user_id, us, event_id,
    event_type) — shared by the full-history query above and the
    point-in-time enrichment's state dimension."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("event_type").over(w)
    marked = ev.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    )
    runs_src = marked.withColumn(
        "run_id",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = runs_src.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),
        F.min("us").alias("valid_from_us"),
        F.max("us").alias("last_us"),
        F.count("*").alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from_us").over(wr)
    return runs.select(
        "user_id",
        F.col("run_id").cast("long").alias("run_id"),
        "state",
        "valid_from_us",
        F.coalesce(nxt, F.col("last_us")).alias("valid_to_us"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


USER_STATE_SCD2_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
),
marked AS (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
runs_src AS (
  SELECT user_id, us, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
),
runs AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         min(event_type) AS state,
         min(us) AS valid_from_us,
         max(us) AS last_us,
         count(*) AS n_events
  FROM runs_src GROUP BY user_id, run_id
)
SELECT user_id, run_id, state, valid_from_us,
       coalesce(lead(valid_from_us) OVER wr, last_us) AS valid_to_us,
       n_events,
       lead(valid_from_us) OVER wr IS NULL AS is_current
FROM runs
WINDOW wr AS (PARTITION BY user_id ORDER BY run_id)
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis over the event log: a user converts to
    stage k only with an event of stage k's type STRICTLY AFTER their
    stage-(k-1) conversion time (first-touch semantics: each stage
    anchors at its earliest qualifying event). Output is one row per
    stage with the surviving-user count and the conversion ratio from
    the previous stage — the product-analytics query (view → click →
    purchase) every event warehouse serves.

    Spark-first shape: stage k is a filtered per-user MIN aggregate
    joined against the stage-(k-1) anchor — k shuffles on user_id for
    a k-stage funnel, each over an already-filtered event slice, with
    NO window over the full log and no per-user event array
    collection (the naive collect_list form OOMs on a hot user; this
    form's per-stage state is one timestamp per user). The 3-row
    rollup rides the 1-row-aggregate crossJoin + explode report edge
    (the data_quality_audit shape); ratios are one IEEE division over
    exact counts, fully lazy — no driver-side action in the plan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    s0 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(s0, "user_id")
        .filter(F.col("us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(s1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    wide = (
        s0.agg(F.count("*").alias("n0"))
        .crossJoin(F.broadcast(s1.agg(F.count("*").alias("n1"))))
        .crossJoin(F.broadcast(s2.agg(F.count("*").alias("n2"))))
    )

    def row(idx, stage, n, n_prev):
        return F.struct(
            F.lit(idx).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col(n).alias("users"),
            (F.col(n).cast("double") / F.col(n_prev)).alias(
                "conv_from_prev"
            ),
        )

    return wide.select(
        F.explode(
            F.array(
                row(0, FUNNEL_STAGES[0], "n0", "n0"),
                row(1, FUNNEL_STAGES[1], "n1", "n0"),
                row(2, FUNNEL_STAGES[2], "n2", "n1"),
            )
        ).alias("r")
    ).select("r.*")


FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
),
s0 AS (
  SELECT user_id, min(us) AS t0 FROM ev
  WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.us) AS t1
  FROM ev e JOIN s0 USING (user_id)
  WHERE e.event_type = 'click' AND e.us > s0.t0
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.us) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us > s1.t1
  GROUP BY e.user_id
),
c AS (
  SELECT (SELECT count(*) FROM s0) AS n0,
         (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2
)
SELECT 0 AS stage_idx, 'view' AS stage, n0 AS users,
       CAST(n0 AS DOUBLE) / n0 AS conv_from_prev FROM c
UNION ALL
SELECT 1, 'click', n1, CAST(n1 AS DOUBLE) / n0 FROM c
UNION ALL
SELECT 2, 'purchase', n2, CAST(n2 AS DOUBLE) / n1 FROM c
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their FIRST
    active week; each (cohort_week, offset_weeks) cell counts how many
    of that cohort were active again exactly offset weeks later, with
    the retention ratio against the cohort size — the canonical
    triangle chart behind every growth dashboard.

    Scale (round-12 rewrite, guide §2.3/§2.4): ONE user-grain
    aggregate computes each user's first week AND distinct active
    weeks together (collect_set — bounded by the calendar, a report
    dimension, not the fact volume), so the fact table is scanned
    once and shuffled once; exploding the per-user week set gives
    rows that are already (user, week)-distinct, so the per-cell
    distinct count is a plain count — no second fact-side shuffle,
    no user-grain self-join. Cohort sizes fall out of the matrix
    itself (every user is active at offset 0 of their own cohort by
    definition of min), read back with one window over the
    weeks²-row report edge. Was: two fact scans + user-grain join +
    two-phase distinct + size join — 5 shuffles, now 3 (one
    fact-grain, two report-grain).
    """
    from pyspark.sql import Window

    per_user = (
        load_table(spark, sf_dir, "events")
        .select("user_id", week_start(F.col("ts")).alias("wk"))
        .groupBy("user_id")
        .agg(
            F.min("wk").alias("cohort_wk"),
            F.collect_set("wk").alias("wks"),
        )
    )
    cells = (
        per_user.select(
            "cohort_wk", F.explode("wks").alias("wk")
        )
        .groupBy(
            "cohort_wk",
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("long")
            .alias("offset_weeks"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    cohort_users = F.max(
        F.when(F.col("offset_weeks") == 0, F.col("active_users"))
    ).over(Window.partitionBy("cohort_wk"))
    return cells.withColumn("cohort_users", cohort_users).select(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        "offset_weeks",
        "active_users",
        "cohort_users",
        (
            F.col("active_users").cast("double") / F.col("cohort_users")
        ).alias("retention"),
    )


COHORT_RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
),
first AS (
  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id
),
sizes AS (
  SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_users
  FROM first GROUP BY cohort_wk
),
cells AS (
  SELECT f.cohort_wk,
         CAST((ev.wk - f.cohort_wk) / 7 AS BIGINT) AS offset_weeks,
         CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
  FROM ev JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
       c.offset_weeks, c.active_users, s.cohort_users,
       CAST(c.active_users AS DOUBLE) / s.cohort_users AS retention
FROM cells c JOIN sizes s USING (cohort_wk)
"""


IVM_CUTOFF = "2024-01-25"  # testdata events span 2024-01 at every SF


def weekly_rollup_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a weekly rollup under
    LATE-ARRIVING data: the base rollup was built from events before
    the cutoff; when the late batch lands, only the WEEKS it touches
    are recomputed (from the full log, which at production scale is a
    partition-pruned scan on the week key) and stitched onto the
    untouched base rows via anti-join — never a full-table rebuild.

    Recompute-the-partition, not merge-the-delta, is forced by the
    DISTINCT-user column: count(*) and sum are delta-mergeable,
    countDistinct is NOT (a late event's user may already be counted)
    — the precise reason real pipelines either recompute affected
    partitions or switch the column to a mergeable sketch
    (approx_users_sketch is this repo's sketch form of the same
    rollup).

    Correctness statement: the stitched result must equal the full
    recompute bit-for-bit — the oracle IS the full recompute, so any
    stitching bug (week leak, double count, missed partition)
    hash-mismatches."""
    ev = load_table(spark, sf_dir, "events").select(
        week_start(F.col("ts")).alias("wk"),
        F.to_date("ts").alias("d"),
        "event_type",
        "user_id",
    )
    cutoff = F.lit(IVM_CUTOFF).cast("date")

    def rollup(df):
        return df.groupBy("wk", "event_type").agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )

    base = rollup(ev.filter(F.col("d") < cutoff))
    late = ev.filter(F.col("d") >= cutoff)
    affected = late.select("wk").distinct()
    recomputed = rollup(ev.join(F.broadcast(affected), "wk"))
    untouched = base.join(affected, "wk", "left_anti")
    return untouched.unionByName(recomputed).select(
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "event_type",
        "n_events",
        "n_users",
    )


WEEKLY_ROLLUP_IVM_ORACLE = """
SELECT strftime(CAST(date_trunc('week', ts) AS DATE), '%Y-%m-%d')
         AS week_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative adoption curve per event type: for each (type,
    week), how many DISTINCT users have performed that action at
    least once up to and including that week. A naive running
    countDistinct is non-mergeable (the same reason weekly_rollup_ivm
    recomputes partitions); the scalable rewrite is the FIRST-SEEN
    decomposition: per (user, type) min(week) — one shuffle — count
    first-sightings per (type, week), then a running sum over the
    (types × weeks)-sized rollup. The cumulative distinct becomes a
    mergeable SUM, and the window partitions by event_type over a
    time-bounded table."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", week_start(F.col("ts")).alias("wk")
    )
    first = ev.groupBy("user_id", "event_type").agg(
        F.min("wk").alias("wk")
    )
    weekly_new = first.groupBy("event_type", "wk").agg(
        F.count("*").alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return weekly_new.select(
        "event_type",
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


CUMULATIVE_UNIQUE_ORACLE = """
WITH first AS (
  SELECT user_id, event_type,
         min(CAST(date_trunc('week', ts) AS DATE)) AS wk
  FROM events GROUP BY user_id, event_type
),
weekly AS (
  SELECT event_type, wk, CAST(count(*) AS BIGINT) AS new_users
  FROM first GROUP BY event_type, wk
)
SELECT event_type, strftime(wk, '%Y-%m-%d') AS week_start, new_users,
       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY wk
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
FROM weekly
"""


HOP_WINDOW_US = 2 * 3600 * 1_000_000  # 2-hour window
HOP_SLIDE_US = 30 * 60 * 1_000_000  # 30-minute hop


def hopping_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 2-hour windows every 30
    minutes via the native ``F.window(ts, windowDuration,
    slideDuration)`` — each event lands in exactly window/slide = 4
    overlapping windows, the smoothing shape dashboards use where
    tumbling windows jitter. The oracle reproduces Spark's
    epoch-aligned window starts arithmetically (start_k =
    (floor(us/slide) − k)·slide for k in 0..3), so the alignment
    contract itself is hash-pinned, not assumed.

    Scale: the explode-to-4-windows fan-out happens inside the window
    aggregate (map-side partial per window), one shuffle keyed by
    (window, event_type); state is #windows × #types."""
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value")
    )
    from firefox_public_data_report_etl_spark.functions import cents

    return (
        ev.groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("start_us"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


HOPPING_ORACLE = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS us, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
hops AS (
  SELECT (us // {HOP_SLIDE_US} - k) * {HOP_SLIDE_US} AS start_us,
         event_type, cents
  FROM ev CROSS JOIN (
    SELECT unnest(range(0, {HOP_WINDOW_US // HOP_SLIDE_US})) AS k
  )
)
SELECT start_us, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM hops GROUP BY start_us, event_type
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: count
    (previous type → type) transitions between CONSECUTIVE events of
    the same user within the 30-minute session gap (the same gap
    contract as ``user_sessions``, so "transition" and "session"
    agree), then per-source-type probabilities. The behavioral-model
    complement to ``funnel_conversion``: the funnel checks one
    prescribed path, the matrix measures every observed hop.

    Scale: one shuffle on user_id for the lag window; the transition
    aggregate is keyed by (from, to) — at most |types|² groups — and
    the row-total window runs over that ≤ 25-row table, a report
    edge. Probabilities are one IEEE division of exact counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
        (F.col("us") - F.lag("us").over(w)).alias("gap_us"),
    ).filter(
        F.col("from_type").isNotNull()
        & (F.col("gap_us") <= SESSION_GAP_MIN * 60 * 1_000_000)
    )
    counts = t.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt)
        ).alias("prob"),
    )


EVENT_TRANSITION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
),
t AS (
  SELECT lag(event_type) OVER w AS from_type,
         event_type AS to_type,
         us - lag(us) OVER w AS gap_us
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM t
  WHERE from_type IS NOT NULL
    AND gap_us <= {SESSION_GAP_MIN * 60 * 1_000_000}
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / sum(n_transitions) OVER (PARTITION BY from_type) AS prob
FROM counts
"""


ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback (first+last touch)


def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution, the companion policy to
    ``last_touch_attribution``: each purchase credits the EARLIEST
    click/view within the 7 days before it. The earliest-touch argmin
    rides a time-valued RANGE frame as a single integer MIN — each
    touch packs to ``us·8 + type_code`` (click=0 < view=1, so a
    same-microsecond tie deterministically prefers the click), the
    frame minimum is decoded back to (us, type), and the window check
    is already the frame bound. One user-keyed shuffle, no self-join,
    no struct ordering (DuckDB and Spark need not agree on struct
    comparison semantics — packed integers compare identically
    everywhere).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    base = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        week_start(F.col("ts")).alias("wk"),
        "event_type",
        F.col("value"),
    )
    type_code = F.when(F.col("event_type") == "click", 0).otherwise(1)
    packed = F.when(
        F.col("event_type") != "purchase",
        F.col("us") * 8 + type_code,
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ATTR_WINDOW_US, 0)
    )
    carried = base.select(
        "*", F.min(packed).over(w).alias("first_packed")
    )
    purchases = carried.filter(F.col("event_type") == "purchase").select(
        F.when(F.col("first_packed").isNull(), F.lit("none"))
        .when(F.col("first_packed") % 8 == 0, F.lit("click"))
        .otherwise(F.lit("view"))
        .alias("attributed_type"),
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        cents(F.col("value")).alias("rev_c"),
    )
    return purchases.groupBy("attributed_type", "week_start").agg(
        F.count("*").alias("n_purchases"),
        F.sum("rev_c").alias("revenue_cents"),
    )


FIRST_TOUCH_ORACLE = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(date_trunc('week', ts) AS DATE) AS wk,
         event_type, value
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
), carried AS (
  SELECT *,
         min(CASE WHEN event_type <> 'purchase'
                  THEN us * 8 + (CASE WHEN event_type = 'click'
                                      THEN 0 ELSE 1 END) END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN {ATTR_WINDOW_US} PRECEDING AND CURRENT ROW)
           AS first_packed
  FROM base
), purchases AS (
  SELECT CASE WHEN first_packed IS NULL THEN 'none'
              WHEN first_packed % 8 = 0 THEN 'click'
              ELSE 'view' END AS attributed_type,
         strftime(wk, '%Y-%m-%d') AS week_start,
         CAST(round(value * 100) AS BIGINT) AS rev_c
  FROM carried WHERE event_type = 'purchase'
)
SELECT attributed_type, week_start,
       count(*) AS n_purchases,
       CAST(sum(rev_c) AS BIGINT) AS revenue_cents
FROM purchases GROUP BY attributed_type, week_start
"""


TRAIL_HOUR_US = 3_600_000_000  # 1-hour trailing window in micros


def user_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-valued RANGE frame over the raw event stream: for every
    event, how many events (and how much exact-cents value) the same
    user produced in the trailing hour INCLUDING this one — the
    rate-limit / burst-detection primitive. Distinct from
    window_frames' day-number RANGE (an integer spine at report
    grain): this frame ranges over epoch-micros on the full fact
    table, the shape where RANGE vs ROWS actually matters (events are
    irregular, so a row-count frame would be wrong).

    Scale: one user-keyed window shuffle; frame state is time-bounded
    (an hour of per-user events), the same boundedness argument as
    the watermarked streaming twin of this query shape.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        cents(F.col("value")).alias("val_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-TRAIL_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "us",
        F.count("*").over(w).alias("n_trailing_hour"),
        F.sum("val_c").over(w).alias("cents_trailing_hour"),
    )


USER_TRAILING_HOUR_ORACLE = f"""
SELECT event_id, user_id, epoch_us(ts) AS us,
       count(*) OVER w AS n_trailing_hour,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cents_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {TRAIL_HOUR_US} PRECEDING AND CURRENT ROW)
"""


AB_SALT = "ab1:"  # experiment id baked into the assignment hash
AB_SPLIT_DATE = "2024-01-15"  # pre-period before, experiment after


def ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED sufficient statistics: users
    hash-assigned to control/treatment (pure function of user id +
    experiment salt — stable across runs, clusters, and engines, the
    same portable-md5 device as hash_split), metric = per-user
    purchase revenue in the experiment period, covariate = pre-period
    click count. Emits per-arm exact integer moments — n, Σy, Σy²,
    Σx, Σx², Σxy — everything a CUPED-adjusted difference test needs
    (θ = cov/var, Welch t), leaving only the final scalar float math
    to the consumer; mean_y is the one FP column (single division over
    identical integers, IEEE-deterministic).

    Scale: ONE shuffle — the per-user conditional aggregate computes
    metric and covariate in the same pass (the user universe is every
    user seen in events, so zero-purchase users count in the
    denominator); the arm rollup is 2 rows.
    """
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    split = F.lit(AB_SPLIT_DATE)
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= split),
                cents(F.col("value")),
            ).otherwise(F.lit(0))
        ).alias("y_c"),
        F.count(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") < split), True
            )
        ).alias("x"),
    )
    arm = F.when(
        F.expr(
            md5_int_spark_sql(f"concat('{AB_SALT}', cast(user_id as string))")
        )
        % 2
        == 1,
        "treatment",
    ).otherwise("control")
    return (
        per_user.withColumn("arm", arm)
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("y_c").alias("sum_y_c"),
            F.sum(F.col("y_c") * F.col("y_c")).alias("sumsq_y_c"),
            F.sum("x").alias("sum_x"),
            F.sum(F.col("x") * F.col("x")).alias("sumsq_x"),
            F.sum(F.col("x") * F.col("y_c")).alias("sum_xy_c"),
        )
        .select(
            "*",
            (F.col("sum_y_c").cast("double") / 100 / F.col("n_users")).alias(
                "mean_y"
            ),
        )
    )


def _ab_readout_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    h = md5_int_sql(f"concat('{AB_SALT}', cast(user_id as string))")
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '{AB_SPLIT_DATE}'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y_c,
         count(CASE WHEN event_type = 'click'
                     AND ts < TIMESTAMP '{AB_SPLIT_DATE}'
                    THEN 1 END) AS x
  FROM events GROUP BY user_id
)
SELECT CASE WHEN {h} % 2 = 1 THEN 'treatment' ELSE 'control' END AS arm,
       count(*) AS n_users,
       CAST(sum(y_c) AS BIGINT) AS sum_y_c,
       CAST(sum(y_c * y_c) AS BIGINT) AS sumsq_y_c,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(x * x) AS BIGINT) AS sumsq_x,
       CAST(sum(x * y_c) AS BIGINT) AS sum_xy_c,
       CAST(sum(y_c) AS DOUBLE) / 100 / count(*) AS mean_y
FROM per_user GROUP BY 1
"""


def events_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension join (the feature-store
    primitive): enrich each purchase with the SCD2 state that was
    VALID AT ITS EVENT TIME — never the current state (that leaks the
    future into training features). The dimension is the gaps-and-
    islands history over the state-setting events (everything but
    purchases, `_scd2_runs`); a purchase matches the run whose
    [valid_from, valid_to) tile contains it, the open current run
    extends forward, and purchases before the user's first observed
    state land in 'unknown' via the left join.

    Exactly-one-or-zero match by construction: runs tile each user's
    timeline half-open and disjoint, so the join cannot fan out.
    Scale: the dimension build is one user-keyed shuffle (shared
    windows), the PIT join is an equi join on user_id with the
    interval residual — per-user fanout bounded by runs × purchases
    per user, the same per-user-cardinality assumption as every
    sessionization here. Output: purchases per (state-at-purchase,
    week) with exact cents.

    ONE code path with the streaming gate (round-9 advice): the
    per-row enrichment — dim rebuild AND the interval-join predicate —
    is `streaming.pitenrich.pit_enrich_rows`, the exact projection
    every micro-batch runs; this batch query only aggregates it, so
    stream and batch can never tile validity or match intervals
    differently."""
    from firefox_public_data_report_etl_spark.streaming.pitenrich import (
        pit_enrich_rows,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return (
        pit_enrich_rows(ev, ev)
        .groupBy("state", "week_start")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("rev_c").alias("revenue_cents"),
        )
    )


EVENTS_PIT_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         CAST(date_trunc('week', ts) AS DATE) AS wk, value
  FROM events
),
sev AS (SELECT user_id, us, event_id, event_type FROM ev
        WHERE event_type <> 'purchase'),
marked AS (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM sev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
runs_src AS (
  SELECT user_id, us, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
),
runs AS (
  SELECT user_id, run_id, min(event_type) AS state,
         min(us) AS valid_from_us, max(us) AS last_us
  FROM runs_src GROUP BY user_id, run_id
),
dim AS (
  SELECT user_id AS d_user, state, valid_from_us,
         coalesce(lead(valid_from_us) OVER (PARTITION BY user_id
                                            ORDER BY run_id),
                  last_us) AS valid_to_us,
         lead(valid_from_us) OVER (PARTITION BY user_id
                                   ORDER BY run_id) IS NULL AS is_current
  FROM runs
),
probes AS (
  SELECT user_id, us, wk,
         CAST(round(value * 100) AS BIGINT) AS rev_c
  FROM ev WHERE event_type = 'purchase'
)
SELECT coalesce(d.state, 'unknown') AS state,
       strftime(p.wk, '%Y-%m-%d') AS week_start,
       count(*) AS n_purchases,
       CAST(sum(p.rev_c) AS BIGINT) AS revenue_cents
FROM probes p
LEFT JOIN dim d
  ON p.user_id = d.d_user AND d.valid_from_us <= p.us
 AND (p.us < d.valid_to_us OR d.is_current)
GROUP BY 1, 2
"""


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase is
    credited to the user's MOST RECENT click/view within the 7 days
    before it ('none' when there is no touch in the window) — revenue
    and purchase counts rolled up per (attributed touch type, purchase
    week).

    Spark-first: the per-purchase "latest touch at-or-before" is the
    union-window as-of strategy (operators/asof.py) inlined — touches
    and purchases share ONE user-keyed shuffle and a single running
    ``last(ignorenulls)`` window carries the latest touch forward onto
    each purchase row; no self-join, no per-user arrays. Same-ts ties
    order touch-before-purchase then by event_id, so attribution is
    deterministic. Scale: one keyed shuffle over the type-pruned scan;
    the window is time-ordered per user (bounded by per-user event
    counts, the sessionization-grade assumption every query here
    shares).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        week_start(F.col("ts")).alias("wk"),
        "event_type",
        F.col("value"),
        (F.col("event_type") != "purchase").alias("is_touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", F.col("is_touch").cast("int").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_type = F.when(F.col("is_touch"), F.col("event_type"))
    touch_us = F.when(F.col("is_touch"), F.col("us"))
    carried = base.select(
        "*",
        F.last(touch_type, ignorenulls=True).over(w).alias("lt_type"),
        F.last(touch_us, ignorenulls=True).over(w).alias("lt_us"),
    )
    purchases = carried.filter(~F.col("is_touch")).select(
        F.when(
            F.col("lt_us").isNotNull()
            & (F.col("us") - F.col("lt_us") <= ATTR_WINDOW_US),
            F.col("lt_type"),
        )
        .otherwise(F.lit("none"))
        .alias("attributed_type"),
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        cents(F.col("value")).alias("rev_c"),
    )
    return purchases.groupBy("attributed_type", "week_start").agg(
        F.count("*").alias("n_purchases"),
        F.sum("rev_c").alias("revenue_cents"),
    )


LAST_TOUCH_ORACLE = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(date_trunc('week', ts) AS DATE) AS wk,
         event_type, value,
         event_type <> 'purchase' AS is_touch
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
), carried AS (
  SELECT *,
         last_value(CASE WHEN is_touch THEN event_type END IGNORE NULLS)
           OVER w AS lt_type,
         last_value(CASE WHEN is_touch THEN us END IGNORE NULLS)
           OVER w AS lt_us
  FROM base
  WINDOW w AS (PARTITION BY user_id
               ORDER BY us, CASE WHEN is_touch THEN 1 ELSE 0 END DESC,
                        event_id
               ROWS UNBOUNDED PRECEDING)
), purchases AS (
  SELECT CASE WHEN lt_us IS NOT NULL AND us - lt_us <= {ATTR_WINDOW_US}
              THEN lt_type ELSE 'none' END AS attributed_type,
         strftime(wk, '%Y-%m-%d') AS week_start,
         CAST(round(value * 100) AS BIGINT) AS rev_c
  FROM carried WHERE NOT is_touch
)
SELECT attributed_type, week_start,
       count(*) AS n_purchases,
       CAST(sum(rev_c) AS BIGINT) AS revenue_cents
FROM purchases GROUP BY attributed_type, week_start
"""


ANOMALY_MAD_MULT = 3  # flag weeks with |count - median| > 3 * MAD


def weekly_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series anomaly detection over the weekly event-type
    counts: flag weeks whose count deviates from the per-type MEDIAN
    by more than 3× the median absolute deviation (MAD) — the
    standard monitoring cut that, unlike mean/stddev z-scores, is not
    dragged by the very outliers it hunts.

    Exact-integer determinism trick: medians are kept doubled
    (``med2 = low + high`` of the two middle order statistics — equal
    to 2·median without the interpolating division), deviations as
    ``dev2 = |2·n − med2|`` and the MAD likewise doubled again
    (``mad4``), so the flag ``2·dev2 > 3·mad4`` is an integer
    comparison bit-identical in both engines — no floating median
    interpolation anywhere.

    Scale: one fact-scan aggregate to the (type, week) grain, then
    every window partitions BY event_type over that rollup —
    (#types × #weeks) rows, time-bounded at any corpus size.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", week_start(F.col("ts")).alias("wk")
    )
    wc = ev.groupBy("event_type", "wk").agg(F.count("*").alias("n_events"))

    def doubled_median(df: DataFrame, val: str, out: str) -> DataFrame:
        """2×median of ``val`` per event_type via order statistics:
        rank rows, then sum the value at positions ⌊(n+1)/2⌋ and
        ⌈(n+1)/2⌉ (the same row counted twice when n is odd)."""
        wo = Window.partitionBy("event_type").orderBy(val, "wk")
        wp = Window.partitionBy("event_type")
        ranked = df.withColumn("_rn", F.row_number().over(wo)).withColumn(
            "_cnt", F.count("*").over(wp)
        )
        lo = F.floor((F.col("_cnt") + 1) / 2)
        hi = F.floor((F.col("_cnt") + 2) / 2)
        pick = (F.col("_rn") == lo).cast("long") + (
            F.col("_rn") == hi
        ).cast("long")
        med = ranked.groupBy("event_type").agg(
            F.sum(F.col(val) * pick).alias(out)
        )
        return ranked.drop("_rn", "_cnt").join(F.broadcast(med), "event_type")

    with_med = doubled_median(wc, "n_events", "med2")
    with_dev = with_med.withColumn(
        "dev2", F.abs(2 * F.col("n_events") - F.col("med2"))
    )
    with_mad = doubled_median(with_dev, "dev2", "mad4")
    return with_mad.select(
        "event_type",
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "n_events",
        "med2",
        "dev2",
        "mad4",
        (2 * F.col("dev2") > ANOMALY_MAD_MULT * F.col("mad4")).alias(
            "is_anomaly"
        ),
    )


WEEKLY_ANOMALY_ORACLE = f"""
WITH wc AS (
  SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS wk,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY n_events, wk) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM wc
), m1 AS (
  SELECT event_type,
         CAST(sum(n_events * (CASE WHEN rn = (cnt + 1) // 2 THEN 1 ELSE 0 END
                    + CASE WHEN rn = (cnt + 2) // 2 THEN 1 ELSE 0 END))
              AS BIGINT) AS med2
  FROM r1 GROUP BY event_type
), dev AS (
  SELECT wc.event_type, wc.wk, wc.n_events, m1.med2,
         abs(2 * wc.n_events - m1.med2) AS dev2
  FROM wc JOIN m1 USING (event_type)
), r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY dev2, wk) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM dev
), m2 AS (
  SELECT event_type,
         CAST(sum(dev2 * (CASE WHEN rn = (cnt + 1) // 2 THEN 1 ELSE 0 END
                    + CASE WHEN rn = (cnt + 2) // 2 THEN 1 ELSE 0 END))
              AS BIGINT) AS mad4
  FROM r2 GROUP BY event_type
)
SELECT d.event_type, strftime(d.wk, '%Y-%m-%d') AS week_start,
       d.n_events, d.med2, d.dev2, m2.mad4,
       2 * d.dev2 > {ANOMALY_MAD_MULT} * m2.mad4 AS is_anomaly
FROM dev d JOIN m2 USING (event_type)
"""


QUERIES = {
    "user_state_scd2": user_state_scd2,
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "weekly_rollup_ivm": weekly_rollup_ivm,
    "hopping_event_counts": hopping_event_counts,
    "event_transition_matrix": event_transition_matrix,
    "cumulative_unique_users": cumulative_unique_users,
    "user_sessions": user_sessions,
    "window_frames": window_frames,
    "session_window_rollup": session_window_rollup,
    "session_incident_overlap": session_incident_overlap,
    "weekly_event_anomalies": weekly_event_anomalies,
    "last_touch_attribution": last_touch_attribution,
    "ab_experiment_readout": ab_experiment_readout,
    "events_pit_enrich": events_pit_enrich,
    "first_touch_attribution": first_touch_attribution,
    "user_trailing_hour_stats": user_trailing_hour_stats,
}

ORACLES = {
    "user_state_scd2": USER_STATE_SCD2_ORACLE,
    "funnel_conversion": FUNNEL_ORACLE,
    "cohort_retention": COHORT_RETENTION_ORACLE,
    "weekly_rollup_ivm": WEEKLY_ROLLUP_IVM_ORACLE,
    "hopping_event_counts": HOPPING_ORACLE,
    "event_transition_matrix": EVENT_TRANSITION_ORACLE,
    "cumulative_unique_users": CUMULATIVE_UNIQUE_ORACLE,
    "user_sessions": USER_SESSIONS_ORACLE,
    "window_frames": WINDOW_FRAMES_ORACLE,
    "session_window_rollup": SESSION_WINDOW_ROLLUP_ORACLE,
    "session_incident_overlap": SESSION_INCIDENT_ORACLE,
    "weekly_event_anomalies": WEEKLY_ANOMALY_ORACLE,
    "last_touch_attribution": LAST_TOUCH_ORACLE,
    "ab_experiment_readout": _ab_readout_oracle(),
    "events_pit_enrich": EVENTS_PIT_ORACLE,
    "first_touch_attribution": FIRST_TOUCH_ORACLE,
    "user_trailing_hour_stats": USER_TRAILING_HOUR_ORACLE,
}

# native F.session_window measured LINEAR-at-best as a batch operator
# (SCALING.md round-4 finding: 16x the window form at 10M events); it
# stays registered as the STREAMING operator's correctness binding,
# and the lag+cumsum window form (user_sessions) is the batch path.
SCALE_CLASS = {"session_window_rollup": "streaming_binding"}
SCALE_PATH_FOR = {"session_window_rollup": "user_sessions"}
