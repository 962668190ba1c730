"""Operator-level unit tests: as-of join strategy equivalence, top-k
forms, fan-out semantics, bitfield functions, week conventions."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.functions import (
    bitcount_lowest_7,
    major_version,
    pos_of_trailing_set_bit,
    week_start,
)
from firefox_public_data_report_etl_spark.operators import (
    asof_latest_broadcast,
    asof_latest_union_window,
    explode_preserving_empty,
    top_k_array,
    top_k_per_group,
    with_total_group,
)


def test_week_start_is_monday(spark):
    """SURVEY.md §7.4: assert (not assume) Spark weeks start Monday,
    matching BigQuery DATE_TRUNC(..., WEEK(MONDAY))."""
    df = spark.createDataFrame(
        [(date(2024, 1, 7),), (date(2024, 1, 8),), (date(2024, 1, 14),)], ["d"]
    )
    got = [r["w"] for r in df.select(week_start(F.col("d")).alias("w")).collect()]
    assert got == [date(2024, 1, 1), date(2024, 1, 8), date(2024, 1, 8)]


def test_bitfield_functions(spark):
    # bits 0b1001000: lowest-7 popcount 2; trailing set bit index 3
    df = spark.createDataFrame([(72,), (1,), (0,)], ["b"])
    out = df.select(
        bitcount_lowest_7(F.col("b")).alias("c"),
        pos_of_trailing_set_bit(F.col("b")).alias("p"),
    ).collect()
    assert (out[0]["c"], out[0]["p"]) == (2, 3)
    assert (out[1]["c"], out[1]["p"]) == (1, 0)
    assert out[2]["p"] is None  # zero guard


def test_major_version(spark):
    df = spark.createDataFrame([("109.0.1",), ("7",), ("bad",)], ["v"])
    got = [r["m"] for r in df.select(major_version(F.col("v")).alias("m")).collect()]
    assert got == [109, 7, None]


def test_hash_forms_identical(spark):
    """The Spark fast conv-based md5 int must equal the portable
    instr-chain fragment the DuckDB oracles use — value parity of the
    whole dedup/text family hangs on this."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
        md5_int_sql,
    )

    df = spark.createDataFrame(
        [("hello world",), ("",), ("Ünïcode ß",), ("a b c d e",)], ["s"]
    )
    out = df.selectExpr(
        f"{md5_int_sql('s')} AS portable",
        f"{md5_int_spark_sql('s')} AS fast",
    ).collect()
    assert all(r["portable"] == r["fast"] for r in out)


def test_asof_strategies_agree(spark):
    """Broadcast-theta and union-window as-of joins must give the same
    answer (including the <= boundary and before-first-release NULL)."""
    left = spark.createDataFrame(
        [(1, date(2024, 1, 1)), (2, date(2024, 1, 5)), (3, date(2024, 1, 10))],
        ["id", "d"],
    )
    right = spark.createDataFrame(
        [(date(2024, 1, 5), 50), (date(2024, 1, 8), 80)], ["rd", "v"]
    )
    a = {
        r["id"]: r["v"]
        for r in asof_latest_broadcast(left, right, "d", "rd", ["v"]).collect()
    }
    b = {
        r["id"]: r["v"]
        for r in asof_latest_union_window(left, right, "d", "rd", "v").collect()
    }
    from firefox_public_data_report_etl_spark.operators import asof_latest_cogroup

    c = {
        r["id"]: r["v"]
        for r in asof_latest_cogroup(left, right, "d", "rd", "v").collect()
    }
    assert a == b == c == {1: None, 2: 50, 3: 80}


def test_top_k_forms_agree(spark):
    df = spark.createDataFrame(
        [("g1", "a", 3), ("g1", "b", 9), ("g1", "c", 5), ("g2", "d", 1)],
        ["g", "name", "score"],
    )
    flat = top_k_per_group(df, ["g"], [F.desc("score"), F.asc("name")], k=2)
    flat_got = {
        (r["g"], r["rank"]): r["name"] for r in flat.collect()
    }
    assert flat_got == {("g1", 1): "b", ("g1", 2): "c", ("g2", 1): "d"}

    arr = top_k_array(
        df, ["g"], F.col("score"), F.col("name"), k=2, out_col="top"
    )
    arr_got = {r["g"]: r["top"] for r in arr.collect()}
    assert arr_got == {"g1": ["b", "c"], "g2": ["d"]}


def test_with_total_group_fanout(spark):
    df = spark.createDataFrame([("US", 1), ("DE", 2)], ["country", "n"])
    out = with_total_group(df, "country", "cohort")
    assert out.count() == 4
    cohorts = {r["cohort"] for r in out.collect()}
    assert cohorts == {"US", "DE", "Worldwide"}


def test_explode_preserving_empty(spark):
    df = spark.createDataFrame(
        [(1, ["x"]), (2, []), (3, None)],
        "id int, arr array<string>",
    )
    out = explode_preserving_empty(df, F.col("arr"), "item")
    got = {(r["id"], r["item"]) for r in out.collect()}
    # empty and NULL arrays keep their row with a NULL item
    assert got == {(1, "x"), (2, None), (3, None)}


def test_asof_cogroup_keyed_matches_union_window(spark):
    """Keyed as-of: the cogrouped merge_asof and the union-window form
    must agree per key (including a key with no right rows)."""
    from firefox_public_data_report_etl_spark.operators import (
        asof_latest_cogroup,
        asof_latest_union_window,
    )

    left = spark.createDataFrame(
        [
            ("a", 1, date(2024, 1, 3)),
            ("a", 2, date(2024, 1, 9)),
            ("b", 3, date(2024, 1, 9)),
            ("c", 4, date(2024, 1, 9)),  # no right rows for c
        ],
        ["k", "id", "d"],
    )
    right = spark.createDataFrame(
        [
            ("a", date(2024, 1, 3), 30),
            ("a", date(2024, 1, 7), 70),
            ("b", date(2024, 1, 1), 10),
        ],
        ["k", "rd", "v"],
    )
    u = {
        r["id"]: r["v"]
        for r in asof_latest_union_window(
            left, right, "d", "rd", "v", by=["k"]
        ).collect()
    }
    c = {
        r["id"]: r["v"]
        for r in asof_latest_cogroup(
            left, right, "d", "rd", "v", by=["k"]
        ).collect()
    }
    assert u == c == {1: 30, 2: 70, 3: 10, 4: None}


def test_hash_split_deterministic_and_balanced(spark, sf_dir):
    import pytest

    from firefox_public_data_report_etl_spark.operators.text import hash_split
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b  # stable across runs
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    # uniform hash: train should dominate roughly 80/10/10 (loose
    # bounds — 500 docs at sf0.001)
    assert c["train"] / n > 0.6
    assert c["val"] / n < 0.25 and c["test"] / n < 0.25
    with pytest.raises(ValueError):
        hash_split(docs, weights=(50, 30, 30))


def test_salted_join_agrees_with_plain_join(spark):
    from firefox_public_data_report_etl_spark.operators.skew import salted_join

    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k").collect()))
    assert salted == plain
    # left join keeps unmatched rows exactly once
    plain_l = sorted(map(tuple, left.join(right, "k", "left").collect()))
    salted_l = sorted(map(tuple, salted_join(left, right, "k", how="left").collect()))
    assert salted_l == plain_l


def test_aqe_skew_join_split_fires(spark):
    """The session's AQE skew handling must actually split a skewed
    shuffle join — guard the conf wiring, not just its presence."""
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        ):
            spark.conf.unset(k)


def test_pack_sequences_invariants(spark, sf_dir):
    """Concat-then-chunk packing: offsets stay inside the window,
    chunks fill contiguously per shard, and assignments are identical
    at any input partitioning (determinism is what makes a packed
    dataset reproducible across cluster sizes)."""
    from firefox_public_data_report_etl_spark.operators.text import pack_sequences
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, capacity=128, n_shards=4).collect()
    assert len(packed) == docs.count()
    by_shard: dict[int, list] = {}
    for r in packed:
        assert 0 <= r.bin_offset < 128
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        # first doc of a shard starts chunk 0 at offset 0
        assert rows[0].bin_id == 0 and rows[0].bin_offset == 0
        for a, b in zip(rows, rows[1:]):
            # stream position advances by exactly a.tokens
            pos_a = a.bin_id * 128 + a.bin_offset
            pos_b = b.bin_id * 128 + b.bin_offset
            assert pos_b == pos_a + a.tokens

    repart = pack_sequences(
        docs.repartition(7), capacity=128, n_shards=4
    ).collect()
    assert sorted(map(tuple, repart)) == sorted(map(tuple, packed))


def test_int8_quantize_error_bound(spark, sf_dir):
    """Floor quantization with a max-abs scale guarantees per-component
    reconstruction error < one step (amax/127), and the max-magnitude
    component always saturates to exactly +-127."""
    from firefox_public_data_report_etl_spark.operators.similarity import (
        int8_quantize,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    rows = int8_quantize(load_table(spark, sf_dir, "embeddings")).collect()
    assert rows
    for r in rows:
        assert all(abs(v) <= 127 for v in r.q)
        if r.amax and r.amax > 0:
            # err6_max is floor(err * 1e6); one step is amax/127
            assert r.err6_max <= int(r.amax / 127 * 1_000_000) + 1, (
                r.vec_id,
                r.err6_max,
                r.amax,
            )
            assert max(abs(v) for v in r.q) == 127, r.vec_id


def test_interval_overlap_join_matches_bruteforce(spark):
    """Grid-bucketed overlap join == brute-force theta join, with no
    duplicate pairs (canonical-cell emission), across intervals that
    span zero, one, and many grid cells."""
    from firefox_public_data_report_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    grid = 1000
    left = spark.range(200).select(
        F.col("id").alias("l_id"),
        (F.col("id") * 137 % 9000).alias("ls"),
        (F.col("id") * 137 % 9000 + 1 + (F.col("id") * 31 % 2500)).alias("le"),
    )
    right = spark.range(60).select(
        F.col("id").alias("r_id"),
        (F.col("id") * 211 % 9500).alias("rs"),
        (F.col("id") * 211 % 9500 + 1 + (F.col("id") * 17 % 4000)).alias("re"),
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", grid_us=grid
        ).collect()
    )
    brute = sorted(
        (r.l_id, r.r_id)
        for r in left.crossJoin(right)
        .filter((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .collect()
    )
    assert got == brute
    assert len(got) == len(set(got)), "duplicate pairs emitted"


def test_boilerplate_scores_known_corpus(spark):
    """Hand-computed corpus: gram 'x y z' appears in 5 distinct docs
    (boilerplate at min_df=5); everything else is unique."""
    from firefox_public_data_report_etl_spark.operators.text import (
        boilerplate_scores,
    )

    rows = [(i, f"u{i} v{i} x y z") for i in range(5)]  # 3 grams each
    rows.append((5, "p q"))  # shorter than the gram -> no output row
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in boilerplate_scores(docs, n=3, min_df=5).collect()
    }
    assert 5 not in out
    for i in range(5):
        # grams: "u v x", "v x y", "x y z" -> only the last is shared
        assert out[i]["n_grams"] == 3
        assert out[i]["n_boiler"] == 1
        assert abs(out[i]["boiler_frac"] - 1 / 3) < 1e-12


def test_pii_scrub_categories_and_order(spark):
    """Each category redacts; ordering prevents double counting (an
    email's digits never reach the digit-run pass)."""
    from firefox_public_data_report_etl_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a1_2@x.io and acct 123456789 done"),
            (2, "call 555-123-4567 from 10.0.0.1 now"),
            (3, "clean text only"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_idnum"] == 1
    assert out[1]["scrubbed"] == "mail <EMAIL> and acct <ID> done"
    assert out[2]["n_phone"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["scrubbed"] == "call <PHONE> from <IP> now"
    assert out[3]["scrubbed"] == "clean text only"
    assert all(
        out[3][c] == 0 for c in ("n_email", "n_phone", "n_ipv4", "n_idnum")
    )


def test_top_k_salted_agrees_with_plain(spark):
    """Salted two-phase top-K returns byte-identical (group, row,
    rank) sets to the single-window form, for any salt assignment —
    including a deliberately skewed constant salt."""
    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark.operators.topk import (
        top_k_per_group,
        top_k_per_group_salted,
    )

    df = (
        spark.range(2000)
        .withColumn("g", (F.col("id") % 7).cast("int"))
        .withColumn("v", F.xxhash64("id") % 100)  # heavy ties
    )
    order = [F.desc("v"), F.asc("id")]
    plain = sorted(
        map(tuple, top_k_per_group(df, ["g"], order, 5).collect())
    )
    for salt in (None, F.lit(0), (F.col("id") % 3).cast("int")):
        salted = sorted(
            map(
                tuple,
                top_k_per_group_salted(df, ["g"], order, 5, salt=salt).collect(),
            )
        )
        assert salted == plain


def test_curation_pipeline_gates_hold(spark):
    """Every output row satisfies all three gates, splits are valid,
    and kept doc_ids are unique (dedup keep decision applied)."""
    from firefox_public_data_report_etl_spark.plans.text import (
        CURATE_MIN_TOKENS,
        corpus_curation_pipeline,
    )

    rows = corpus_curation_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert rows
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["n_tokens"] >= CURATE_MIN_TOKENS
        assert r["n_types"] * 10 >= r["n_tokens"] * 3
        assert r["n_boiler"] * 20 < r["n_grams"]
        assert r["split"] in ("train", "val", "test")


def test_pricing_decimal_survives_int64_overflow(spark):
    """The decimal Q1 twin's reason to exist: a group whose cent units
    exceed int64 (SCALING.md's documented cliff). Measured misbehavior
    of the int64 path on such a row: Spark's double->long cast
    SATURATES at Long.MAX even under ANSI (floor() keeps the value a
    double, and fractional->integral ANSI casts clamp rather than
    raise) — a silently wrong sum, which is exactly why extreme-SF
    deployments must switch to the decimal twin. The decimal form must
    produce the exact sums; this test pins both behaviors so a Spark
    version that starts raising (better) or the cents() form changing
    shows up as a loud diff."""
    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark.functions import cents
    from firefox_public_data_report_etl_spark.plans.tpch import (
        _pricing_decimal_agg,
    )

    # one row: price 1e17 dollars -> cents 1e19 > 2^63-1; charge units
    # another 1e4 bigger; all well inside DECIMAL(38,6)
    rows = [("N", "O", 1.0, 1e17, 0.07, 0.04)]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double",
    )
    out = _pricing_decimal_agg(li).collect()
    assert len(out) == 1
    r = out[0]
    assert r["sum_base_price"] == 1e17
    assert r["sum_disc_price"] == 1e17 * 0.93
    assert r["sum_charge"] == 1e17 * 0.93 * 1.04
    assert r["count_order"] == 1

    # the int64 cents path clamps to Long.MAX on the same row — wrong
    # value, no error: the failure mode the decimal twin exists for
    clamped = li.select(cents(F.col("l_extendedprice")).alias("c")).collect()
    assert clamped[0]["c"] == (1 << 63) - 1


def test_boilerplate_gate_scales_with_corpus(spark):
    """Round-6 regression: with the absolute df>=5 cut, the 10x corpus
    (sf0.1, 5000 docs) saturated boiler_frac near 1.0 and the curation
    capstone kept 0 of 4263 quality-passing docs. The corpus-relative
    cut (1% of docs, floored at 5) must keep the gate meaningful at
    every SF: the capstone keeps a non-trivial majority at sf0.1 and
    its oracle-scale outputs are unchanged (parity tests cover that
    half)."""
    from firefox_public_data_report_etl_spark.plans.text import (
        corpus_curation_pipeline,
    )

    n = corpus_curation_pipeline(spark, "/root/testdata/sf0.1").count()
    assert n > 1000, f"curation kept only {n} docs at sf0.1 — gate collapsed"


def test_pricing_decimal_agrees_with_int64_form(spark, sf_dir):
    """The decimal twin must reproduce pricing_summary's values on the
    shared measures at testdata SF (where l_quantity is integral, so
    the two quantity semantics — round vs exact decimal sum —
    coincide). Guards the docstring's agreement claim with a real
    pin instead of prose."""
    import math

    from firefox_public_data_report_etl_spark.plans.tpch import (
        pricing_summary,
        pricing_summary_decimal,
    )

    key = ["l_returnflag", "l_linestatus"]
    i64 = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pricing_summary(spark, sf_dir).collect()
    }
    dec = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pricing_summary_decimal(spark, sf_dir).collect()
    }
    assert i64.keys() == dec.keys() and i64
    for k, a in i64.items():
        b = dec[k]
        assert a["count_order"] == b["count_order"]
        assert a["sum_qty"] == b["sum_qty"]
        assert a["sum_base_cents"] == round(b["sum_base_price"] * 100)
        for col in ("sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc"):
            assert math.isclose(a[col], b[col], rel_tol=1e-12), (k, col)


def test_lsh_parameter_planner_properties(spark, sf_dir):
    # monotone in s for fixed (b, r); monotone in bands for fixed
    # (r, s); fixed-point curve within 1% of the float S-curve
    from firefox_public_data_report_etl_spark.plans.dedup import (
        lsh_parameter_planner,
    )

    rows = lsh_parameter_planner(spark, sf_dir).collect()
    assert rows
    by_key = {(r.bands, r.rows_per_band, r.s_pct): r for r in rows}
    for r in rows:
        s = r.s_pct / 100
        p_float = 1 - (1 - s ** r.rows_per_band) ** r.bands
        assert abs(r.p_catch_ppm / 1e6 - p_float) < 0.01, r
        nxt = by_key.get((r.bands, r.rows_per_band, r.s_pct + 5))
        if nxt is not None:
            assert nxt.p_catch_ppm >= r.p_catch_ppm
        more = by_key.get((r.bands * 2, r.rows_per_band, r.s_pct))
        if more is not None:
            assert more.p_catch_ppm >= r.p_catch_ppm
    # the registry banding's design point: (4, 4) at s=80 catches ~88%
    assert abs(by_key[(4, 4, 80)].p_catch_ppm - 876_000) < 15_000
