"""Remaining classic TPC-H query shapes, adapted to the testdata tables.

`plans/tpch.py` covers Q1/Q3/Q5/Q7/Q8/Q12/Q13/Q14/Q16/Q17/Q18; this
module fills in the other canonical shapes a reference user would
expect from a complete analytics engine, each adapted to the columns
that exist here (no partsupp table; no commit/receipt dates — lateness
is expressed against ``o_orderdate``):

- Q4  → ``order_priority_counts``: EXISTS semi join with a non-equi
  residual predicate.
- Q10 → ``returned_item_top_customers``: returned-revenue global top-K.
- Q15 → ``top_revenue_supplier``: scalar-max subquery (view + MAX).
- Q19 → ``disjunctive_promo_revenue``: OR-of-ANDs disjunctive
  predicate spanning both join sides.
- Q11 → ``important_parts_share``: global-scalar fraction threshold.
- Q22 → ``idle_customers_by_code``: scalar-avg threshold + anti join.
- Q2  → ``min_cost_supplier``: argmin join-back (correlated MIN
  subquery, decorrelated the way Catalyst would).
- Q21 → ``waiting_suppliers``: the semi+anti "only supplier who was
  late on a multi-supplier order" composition, expressed as one
  two-level aggregation instead of two correlated EXISTS probes.

Determinism contract: every double that feeds a SUM is converted to
exact integer cents / basis points first (``functions.cents``); scalar
thresholds (max / avg / fraction-of-total) are compared by exact
integer cross-multiplication, never a floating division. Top-K outputs
carry a unique tiebreak key in the ORDER BY on both sides so the
retained set is deterministic.

Scale notes inline per query. The 1-row scalar crossJoins
(``important_parts_share``, ``idle_customers_by_code``) are broadcast
nested-loop joins over a single aggregate row — allowlisted in
tests/test_plan_quality.py with the other report-sized scalar
attachments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.functions import cents
from firefox_public_data_report_etl_spark.sources import load_table


def _rev_c4(price_c, disc_p) -> F.Column:
    """Exact 4-decimal revenue unit: cents × (100 - discount pct)."""
    return price_c * (F.lit(100) - disc_p)


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority order counts where EXISTS a line
    shipped more than 60 days after the order date.

    Spark-first: the correlated EXISTS is a LEFT SEMI hash join on
    ``l_orderkey`` with the date comparison as the join residual — one
    shuffle per side, no pre-aggregation needed because the semi join
    short-circuits on first match. Scale: orders pruned to one quarter
    at the scan; lineitem pruned to ``l_shipdate >= window start + 60
    days`` (implied by the residual: a qualifying line ships after an
    in-window order date plus 60 days), so both scans are row-group
    pruned before the shuffle.
    """
    orders = load_table(
        spark, sf_dir, "orders", prune=("o_orderdate", "1996-07-01", "1996-10-01")
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(
        spark, sf_dir, "lineitem", prune=("l_shipdate", "1996-08-30", None)
    ).select("l_orderkey", "l_shipdate")
    late_exists = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return late_exists.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


ORDER_PRIORITY_COUNTS_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter, global top 20.

    Scale: orders pruned to the quarter at the scan; the fact join
    shuffles on ``o_orderkey`` / ``c_custkey``; nation is an explicit
    broadcast; the top-K is TakeOrderedAndProject (per-partition heap,
    K rows to the driver — never a global sort). Tiebreak on
    ``c_custkey`` keeps the retained set deterministic across ties.
    """
    orders = load_table(
        spark, sf_dir, "orders", prune=("o_orderdate", "1996-01-01", "1996-04-01")
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            _rev_c4(
                cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
            ).alias("rev_c4"),
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
    )
    named = rev.join(cust, rev.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        named.select("c_custkey", "c_name", "n_name", "revenue_c4")
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_TOP_CUSTOMERS_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
              AS BIGINT) AS revenue_c4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, n.n_name, rev.revenue_c4
FROM rev
JOIN customer c ON rev.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY rev.revenue_c4 DESC, c.c_custkey
LIMIT 20
"""


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the global maximum (the reference SQL's revenue view + scalar MAX
    subquery).

    Spark-first: the scalar MAX is a 1-row aggregate broadcast back
    onto the per-supplier rollup as an EQUI join (``total_revenue_c4 =
    _mx`` is a hash-joinable equality, not a theta join), then the
    surviving ~1 row is broadcast into the supplier dim scan. Scale:
    one pruned fact scan → one supplier-grain shuffle; everything after
    is report-sized. Integer revenue makes the max comparison exact.
    """
    li = load_table(
        spark, sf_dir, "lineitem", prune=("l_shipdate", "1996-01-01", "1996-04-01")
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    ).select(
        "l_suppkey",
        _rev_c4(cents(F.col("l_extendedprice")), cents(F.col("l_discount"))).alias(
            "rev_c4"
        ),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("rev_c4").alias("total_revenue_c4"))
    mx = rev.agg(F.max("total_revenue_c4").alias("_mx"))
    winners = rev.join(F.broadcast(mx), rev.total_revenue_c4 == F.col("_mx")).drop(
        "_mx"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supplier.join(
        F.broadcast(winners), supplier.s_suppkey == winners.l_suppkey
    ).select("s_suppkey", "s_name", "total_revenue_c4")


TOP_REVENUE_SUPPLIER_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS total_revenue_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_revenue_c4
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_revenue_c4 = (SELECT max(total_revenue_c4) FROM rev)
"""


def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate that
    spans both join sides (brand+size from part, quantity from
    lineitem).

    Scale: the part side is pre-filtered to the UNION of the three
    brand/size envelopes before the broadcast (Catalyst can't derive
    that residual itself because the disjunction spans the join), so
    the broadcast ships only candidate parts; the per-arm predicate
    then runs as the join residual. One fact scan, zero shuffles.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    part = part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(1, 20)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        _rev_c4(cents(F.col("l_extendedprice")), cents(F.col("l_discount"))).alias(
            "rev_c4"
        ),
    )
    arms = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("qty").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("qty").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 20)
            & F.col("qty").between(20, 40)
        )
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).filter(arms)
    return j.agg(
        F.count("*").alias("n_lines"),
        F.sum("rev_c4").alias("revenue_c4"),
    )


DISJUNCTIVE_PROMO_ORACLE = """
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4
  FROM lineitem
)
SELECT count(*) AS n_lines, CAST(sum(rev_c4) AS BIGINT) AS revenue_c4
FROM li JOIN part p ON li.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
         AND li.qty BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
         AND li.qty BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 20
         AND li.qty BETWEEN 20 AND 40)
"""


IMPORTANT_PART_FRACTION = 1600  # keep parts with value > total/1600


def important_parts_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fixed
    fraction of the global total (the reference SQL's HAVING > scalar
    subquery), adapted to lineitem value in place of partsupp stock.

    Scale: one fact scan → one part-grain shuffle; the global total is
    a second aggregate OVER THE ROLLUP (part-grain rows, not the
    fact), attached as a 1-row broadcast crossJoin. Threshold compared
    by exact integer cross-multiplication ``value*1600 > total``. The
    share is one final FP division for readability.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _rev_c4(cents(F.col("l_extendedprice")), cents(F.col("l_discount"))).alias(
            "rev_c4"
        ),
    )
    val = li.groupBy("l_partkey").agg(F.sum("rev_c4").alias("value_c4"))
    tot = val.agg(F.sum("value_c4").alias("_tot"))
    kept = val.crossJoin(F.broadcast(tot)).filter(
        F.col("value_c4") * IMPORTANT_PART_FRACTION > F.col("_tot")
    )
    return kept.select(
        "l_partkey",
        "value_c4",
        (F.col("value_c4").cast("double") / F.col("_tot")).alias("share"),
    )


IMPORTANT_PARTS_ORACLE = f"""
WITH val AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS value_c4
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT CAST(sum(value_c4) AS BIGINT) AS _tot FROM val)
SELECT v.l_partkey, v.value_c4,
       CAST(v.value_c4 AS DOUBLE) / t._tot AS share
FROM val v, tot t
WHERE v.value_c4 * {IMPORTANT_PART_FRACTION} > t._tot
"""


IDLE_CODES = ("13", "31", "23", "29", "30", "18", "17")
IDLE_CUTOFF = "2000-01-01"


def idle_customers_by_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected "codes" (last two digits
    of the customer name, standing in for the phone country code) with
    above-average positive balances and NO orders since the recency
    cutoff (2000-01-01) — per-code count and total balance.

    Scale: the customer scan filters the code allowlist (pushed down);
    the positive-balance average is a 1-row aggregate broadcast back
    (exact via ``bal*n > sum`` cross-multiplication); the NOT EXISTS is
    a LEFT ANTI hash join against an ``o_custkey``-only projection of
    the recency-pruned orders scan. One customer shuffle + one anti-join shuffle.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.expr("right(c_name, 2)").alias("code"),
            cents(F.col("c_acctbal")).alias("acctbal_c"),
        )
        .filter(F.col("code").isin(*IDLE_CODES))
    )
    stats = cust.filter(F.col("acctbal_c") > 0).agg(
        F.sum("acctbal_c").alias("_sum"), F.count("*").alias("_n")
    )
    rich = cust.crossJoin(F.broadcast(stats)).filter(
        F.col("acctbal_c") * F.col("_n") > F.col("_sum")
    )
    orders = load_table(
        spark, sf_dir, "orders", prune=("o_orderdate", IDLE_CUTOFF, None)
    ).filter(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF)).select("o_custkey")
    idle = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return idle.groupBy("code").agg(
        F.count("*").alias("numcust"),
        F.sum("acctbal_c").alias("totacctbal_c"),
    )


IDLE_CUSTOMERS_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, right(c_name, 2) AS code,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
  FROM customer
  WHERE right(c_name, 2) IN {IDLE_CODES!r}
), stats AS (
  SELECT CAST(sum(acctbal_c) AS BIGINT) AS _sum, count(*) AS _n
  FROM cust WHERE acctbal_c > 0
)
SELECT code, count(*) AS numcust,
       CAST(sum(acctbal_c) AS BIGINT) AS totacctbal_c
FROM cust, stats
WHERE cust.acctbal_c * stats._n > stats._sum
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = cust.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}'
  )
GROUP BY code
"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-5 part, the supplier(s) offering
    it at the minimum observed price — the correlated MIN subquery,
    decorrelated into an argmin join-back (min per part, then equi
    join on (part, offer price)), adapted to lineitem offers in place
    of partsupp supply cost.

    Scale: the filtered part dim broadcasts into the fact scan, the
    (part, supplier) offer grain and the per-part min are two keyed
    shuffles on ``l_partkey``, and the join-back reuses the same key.
    Supplier and nation dims broadcast into the report-sized result.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 5)
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", cents(F.col("l_extendedprice")).alias("price_c")
    )
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min("price_c").alias("offer_c"))
    )
    best = (
        offers.groupBy("p_partkey")
        .agg(F.min("offer_c").alias("best_c"))
        .withColumnRenamed("p_partkey", "_bk")  # disambiguate the self-join
    )
    winners = offers.join(
        best,
        (offers.p_partkey == F.col("_bk")) & (offers.offer_c == F.col("best_c")),
    ).select("p_partkey", "p_name", "l_suppkey", "best_c")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        winners.join(
            F.broadcast(supplier), winners.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "best_c")
    )


MIN_COST_SUPPLIER_ORACLE = """
WITH offers AS (
  SELECT p.p_partkey, p.p_name, l.l_suppkey,
         CAST(min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS offer_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_size = 5
  GROUP BY p.p_partkey, p.p_name, l.l_suppkey
), best AS (
  SELECT p_partkey, CAST(min(offer_c) AS BIGINT) AS best_c
  FROM offers GROUP BY p_partkey
)
SELECT o.p_partkey, o.p_name, s.s_name, n.n_name, b.best_c
FROM offers o
JOIN best b ON o.p_partkey = b.p_partkey AND o.offer_c = b.best_c
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


def waiting_suppliers(
    spark: SparkSession, sf_dir: str, max_lag_days: int | None = None
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order (lateness = shipped more than 90 days after
    the order date), top 10 by blamed-order count.

    Spark-first: Q21's two correlated EXISTS/NOT-EXISTS probes against
    the same lineitem table become ONE two-level aggregation — per
    (order, supplier) any-late, then per order ``n_supp``/``n_late``
    and the argmax late supplier — turning three fact-table joins into
    two keyed shuffles on ``l_orderkey``. Scale: orders pruned to one
    year; the top-K is TakeOrderedAndProject with a suppkey tiebreak.

    ``max_lag_days`` (r8 verdict #8) bounds the ship lag: when a
    deployment can assert every line ships within H days of (and
    never before) its order date, the lineitem scan prunes to
    [window_start, window_end + H) on l_shipdate — a PushedFilters
    cut on the FACT table, not just on orders. The default (None)
    reads full lineitem because the synthetic testdata carries no
    lag bound (docstring-proved in round 8); the agreement test
    derives the data's true horizon and pins bounded == unbounded on
    it, so the full-scan registry form is a documented choice with a
    tested escape hatch.
    """
    orders = load_table(
        spark, sf_dir, "orders", prune=("o_orderdate", "1996-01-01", "1997-01-01")
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_orderdate")
    if max_lag_days is None:
        li = load_table(spark, sf_dir, "lineitem")
    else:
        from datetime import date, timedelta

        ship_hi = str(date(1997, 1, 1) + timedelta(days=max_lag_days))
        li = load_table(
            spark, sf_dir, "lineitem",
            prune=("l_shipdate", "1996-01-01", ship_hi),
        ).filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit(ship_hi))
        )
    li = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .cast("int")
        .alias("is_late"),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("any_late").alias("n_late"),
        F.max(
            F.when(F.col("any_late") == 1, F.col("l_suppkey"))
        ).alias("late_supp"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    ).groupBy("late_supp").agg(F.count("*").alias("numwait"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(
            F.broadcast(supplier), blamed.late_supp == supplier.s_suppkey
        )
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(10)
    )


WAITING_SUPPLIERS_ORACLE = """
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
), per_supp AS (
  SELECT l_orderkey, l_suppkey, max(is_late) AS any_late
  FROM lines GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey, count(*) AS n_supp,
         CAST(sum(any_late) AS BIGINT) AS n_late,
         max(CASE WHEN any_late = 1 THEN l_suppkey END) AS late_supp
  FROM per_supp GROUP BY l_orderkey
), blamed AS (
  SELECT late_supp, count(*) AS numwait
  FROM per_order WHERE n_supp > 1 AND n_late = 1
  GROUP BY late_supp
)
SELECT s.s_suppkey, s.s_name, b.numwait
FROM blamed b JOIN supplier s ON b.late_supp = s.s_suppkey
ORDER BY b.numwait DESC, s.s_suppkey
LIMIT 10
"""


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-pushdown benchmark — potential
    revenue gain from discounted small-quantity lines in one year,
    zero joins, one global aggregate.

    Scale: everything is the scan. The year range reaches the parquet
    reader via the raw-column prune; discount and quantity filters run
    in the scan's Filter; the aggregate is a map-side partial with a
    1-row shuffle. revenue = Σ price_c · disc_p exact (4-decimal).
    """
    li = load_table(
        spark, sf_dir, "lineitem", prune=("l_shipdate", "1996-01-01", "1997-01-01")
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    disc_p = cents(F.col("l_discount"))
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    picked = li.filter(disc_p.between(5, 7) & (qty < 24)).select(
        (cents(F.col("l_extendedprice")) * disc_p).alias("rev_c4")
    )
    return picked.agg(
        F.count("*").alias("n_lines"), F.sum("rev_c4").alias("revenue_c4")
    )


DISCOUNTED_REVENUE_ORACLE = """
SELECT count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24
"""


Q9_TOKEN = "red"


def part_token_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: revenue by (supplier nation, order year) for
    parts whose name contains a token — the classic LIKE-filtered
    dim driving a multi-way fact join with a two-key rollup (adapted:
    no partsupp table, so the measure is discounted revenue rather
    than revenue minus supply cost).

    Scale: the token filter prunes part BEFORE its broadcast into the
    fact scan; supplier/nation broadcast; orders joins on the orderkey
    shuffle only to supply the year. One fact shuffle, (nation × year)
    output.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{Q9_TOKEN}%"))
        .select("p_partkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _rev_c4(cents(F.col("l_extendedprice")), cents(F.col("l_discount"))).alias(
            "rev_c4"
        ),
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return j.groupBy(F.col("n_name").alias("nation"), "o_year").agg(
        F.count("*").alias("n_lines"), F.sum("rev_c4").alias("revenue_c4")
    )


PART_TOKEN_PROFIT_ORACLE = f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{Q9_TOKEN}%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


DOMINANT_NUM = 15  # supplier dominates a part at > 15% of its volume


def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted: suppliers who shipped MORE THAN 15% of
    a part's total volume (the original asks who stocks >50% of a
    year's demand from partsupp; with lineitem as the supply relation
    the per-group fraction threshold is the same plan shape) — a
    PER-GROUP fraction cut, distinct from important_parts_share's
    GLOBAL-total threshold.

    Scale: ONE fact rollup to (part, supplier) volume; the per-part
    total is a window over that KEY-grain relation (round 12, guide
    §2.4 — the self-join form re-ran the fact scan + rollup for the
    second subtree; the window runs on the already-reduced ~|parts×
    suppliers| rows, so one lineitem pass and two exchanges drop out),
    then the exact integer cross-multiply ``100·vol > 15·total``.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
    )
    from pyspark.sql import Window

    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("vol")
    )
    dominant = per_ps.withColumn(
        "total_vol",
        F.sum("vol").over(Window.partitionBy("l_partkey")),
    ).filter(F.col("vol") * 100 > F.col("total_vol") * DOMINANT_NUM)
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        dominant.join(
            F.broadcast(supplier), dominant.l_suppkey == supplier.s_suppkey
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("*").alias("n_parts_dominated"),
            F.sum("vol").alias("dominated_volume"),
        )
    )


DOMINANT_SUPPLIERS_ORACLE = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS vol
  FROM lineitem GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey, CAST(sum(vol) AS BIGINT) AS total_vol
  FROM per_ps GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name,
       count(*) AS n_parts_dominated,
       CAST(sum(p.vol) AS BIGINT) AS dominated_volume
FROM per_ps p
JOIN per_part t ON p.l_partkey = t.l_partkey
JOIN supplier s ON p.l_suppkey = s.s_suppkey
WHERE p.vol * 100 > t.total_vol * {DOMINANT_NUM}
GROUP BY s.s_suppkey, s.s_name
"""


QUERIES = {
    "order_priority_counts": order_priority_counts,
    "returned_item_top_customers": returned_item_top_customers,
    "top_revenue_supplier": top_revenue_supplier,
    "disjunctive_promo_revenue": disjunctive_promo_revenue,
    "important_parts_share": important_parts_share,
    "idle_customers_by_code": idle_customers_by_code,
    "min_cost_supplier": min_cost_supplier,
    "waiting_suppliers": waiting_suppliers,
    "discounted_revenue": discounted_revenue,
    "part_token_profit": part_token_profit,
    "dominant_part_suppliers": dominant_part_suppliers,
}

ORACLES = {
    "order_priority_counts": ORDER_PRIORITY_COUNTS_ORACLE,
    "returned_item_top_customers": RETURNED_TOP_CUSTOMERS_ORACLE,
    "top_revenue_supplier": TOP_REVENUE_SUPPLIER_ORACLE,
    "disjunctive_promo_revenue": DISJUNCTIVE_PROMO_ORACLE,
    "important_parts_share": IMPORTANT_PARTS_ORACLE,
    "idle_customers_by_code": IDLE_CUSTOMERS_ORACLE,
    "min_cost_supplier": MIN_COST_SUPPLIER_ORACLE,
    "waiting_suppliers": WAITING_SUPPLIERS_ORACLE,
    "discounted_revenue": DISCOUNTED_REVENUE_ORACLE,
    "part_token_profit": PART_TOKEN_PROFIT_ORACLE,
    "dominant_part_suppliers": DOMINANT_SUPPLIERS_ORACLE,
}

