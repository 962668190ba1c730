"""Training-loader order invariants (plans/loader.py,
operators/ordering.py): dense contiguous ids without a global
single-task window, exact epoch coverage, cross-epoch decorrelation,
and order-sensitive manifest checksums."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.ordering import (
    assign_contiguous_ids,
    epoch_training_order,
)
from firefox_public_data_report_etl_spark.plans.loader import (
    documents_row_ids,
    loader_shard_manifest,
    training_epoch_order,
)


def test_contiguous_ids_dense_and_ordered(spark):
    # 1000 rows through MORE partitions than some ranges can fill
    # (num_partitions=32 on skewed keys → empty partitions exercised).
    df = spark.range(1000).select(
        (F.col("id") * 7 % 997).alias("k"), F.col("id").alias("orig")
    )
    # (k, orig) is unique even where k collides
    out = assign_contiguous_ids(df, ["k", "orig"], id_name="rid")
    rows = out.orderBy("rid").collect()
    assert [r["rid"] for r in rows] == list(range(1000))
    # ids follow the total (k, orig) order exactly
    assert [(r["k"], r["orig"]) for r in rows] == sorted(
        (r["k"], r["orig"]) for r in rows
    )


def test_contiguous_ids_tiny_input(spark):
    # fewer rows than partitions: empty partitions must contribute
    # zero-width offsets, not nulls
    df = spark.range(3).select(F.col("id").alias("k"))
    out = assign_contiguous_ids(df, ["k"], id_name="rid", num_partitions=8)
    assert sorted(r["rid"] for r in out.collect()) == [0, 1, 2]


def test_row_ids_plan_has_no_partitionless_window(spark, sf_dir):
    # the entire point vs ROW_NUMBER() OVER (ORDER BY ...): every
    # window in the executed plan is partitioned
    plan = documents_row_ids(spark, sf_dir)._jdf.queryExecution().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0].strip()
        assert head and "ASC" not in head and "DESC" not in head, (
            "partition-less window leaked into documents_row_ids: "
            + spec
        )


def test_epoch_order_exact_coverage(spark, sf_dir):
    out = training_epoch_order(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # every epoch visits every doc exactly once
    per_epoch = (
        out.groupBy("epoch")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .collect()
    )
    assert len(per_epoch) == 2
    for r in per_epoch:
        assert r["n"] == n and r["nd"] == n


def test_epoch_orders_differ_and_positions_dense(spark, sf_dir):
    out = training_epoch_order(spark, sf_dir).collect()
    by_epoch: dict[int, list] = {0: [], 1: []}
    for r in out:
        by_epoch[r["epoch"]].append((r["shard_id"], r["pos"], r["doc_id"]))
    o0 = [d for _, _, d in sorted(by_epoch[0])]
    o1 = [d for _, _, d in sorted(by_epoch[1])]
    assert sorted(o0) == sorted(o1)  # same membership
    assert o0 != o1  # different order
    # positions dense per (epoch, shard)
    from collections import defaultdict

    shard_pos = defaultdict(list)
    for r in out:
        shard_pos[(r["epoch"], r["shard_id"])].append(r["pos"])
    for ps in shard_pos.values():
        assert sorted(ps) == list(range(len(ps)))


def test_manifest_checksum_is_order_sensitive(spark, sf_dir):
    man = {
        (r["epoch"], r["shard_id"]): r
        for r in loader_shard_manifest(spark, sf_dir).collect()
    }
    for r in man.values():
        assert r["max_pos"] == r["n_rows"] - 1
    # recompute one shard's checksum with two ids swapped: must differ
    order = [
        (r["doc_id"], r["pos"])
        for r in training_epoch_order(spark, sf_dir)
        .filter((F.col("epoch") == 0) & (F.col("shard_id") == 0))
        .collect()
    ]
    assert len(order) >= 2
    mod = 2147483647
    chk = sum(d % mod * ((p + 1) % mod) % mod for d, p in order) % mod
    assert chk == man[(0, 0)]["order_checksum"]
    swapped = list(order)
    (d0, p0), (d1, p1) = swapped[0], swapped[1]
    swapped[0], swapped[1] = (d1, p0), (d0, p1)
    chk2 = sum(d % mod * ((p + 1) % mod) % mod for d, p in swapped) % mod
    assert chk2 != chk


def test_epoch_order_window_is_shard_partitioned(spark, sf_dir):
    df = epoch_training_order(
        spark.range(100).select(F.col("id").alias("doc_id")),
        "doc_id",
        n_epochs=2,
        n_shards=4,
    )
    plan = df._jdf.queryExecution().toString()
    assert "windowspecdefinition(epoch" in plan


def test_window_spans_straddle_hand_case(spark):
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_window_spans,
    )

    # doc0: 700 tokens (2800 chars), doc1: 200 tokens — one shard
    docs = spark.createDataFrame(
        [(0, "x" * 2800), (1, "y" * 800)], "doc_id long, text string"
    )
    out = sorted(
        (r["bin_id"], r["doc_id"], r["tok_offset"], r["span_len"], r["is_start"])
        for r in pack_window_spans(docs, capacity=512, n_shards=1).collect()
    )
    assert out == [
        (0, 0, 0, 512, True),   # doc0 fills window 0
        (1, 0, 0, 188, False),  # doc0 continues 188 tokens into window 1
        (1, 1, 188, 200, True), # doc1 starts right after
    ]


def test_window_spans_conserve_tokens(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        packing_window_spans,
    )

    out = packing_window_spans(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.sum("span_len").alias("mass"),
        F.sum(F.when(F.col("is_start"), 1).otherwise(0)).alias("starts"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.length("text") / 4).cast("long").alias("tokens")
    )
    bad = (
        per_doc.join(docs, "doc_id")
        .filter(
            (F.col("mass") != F.col("tokens")) | (F.col("starts") != 1)
        )
        .count()
    )
    assert bad == 0


def test_write_training_shards_file_order(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from firefox_public_data_report_etl_spark.operators.ordering import (
        epoch_training_order,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    order = epoch_training_order(
        docs.select("doc_id"), "doc_id", n_epochs=2, n_shards=4
    )
    path = str(tmp_path / "shards")
    write_training_shards(order, docs, "doc_id", path)
    dirs = sorted(glob.glob(f"{path}/epoch=*/shard_id=*"))
    assert len(dirs) == 8
    # per-directory: exactly one file, rows already in pos order
    ref = {}
    for r in order.collect():
        ref.setdefault((r["epoch"], r["shard_id"]), []).append(
            (r["pos"], r["doc_id"])
        )
    for d in dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1
        t = pq.read_table(files[0]).to_pydict()
        assert t["pos"] == sorted(t["pos"])
        assert t["pos"] == list(range(len(t["pos"])))
        epoch = int(d.split("epoch=")[1].split("/")[0])
        shard = int(d.split("shard_id=")[1])
        expect = [doc for _, doc in sorted(ref[(epoch, shard)])]
        assert t["doc_id"] == expect


def test_anneal_prefix_property(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        _anneal_quotas,
        mixture_schedule_anneal,
    )

    rows = mixture_schedule_anneal(spark, sf_dir).collect()
    q = _anneal_quotas()
    by = {}
    for r in rows:
        by.setdefault((r["lang"], r["epoch"]), set()).add(r["doc_id"])
    langs = {s for s, _ in q}
    for s in langs:
        for e1 in range(3):
            for e2 in range(3):
                if q[(s, e1)] <= q[(s, e2)]:
                    assert by.get((s, e1), set()) <= by.get(
                        (s, e2), set()
                    ), f"anneal must be prefix-nested: {s} {e1}->{e2}"
        # per-epoch sizes match the quota (capped by stratum size)
        for e in range(3):
            assert len(by.get((s, e), set())) <= q[(s, e)]


def test_decontaminated_export_excludes_flagged(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        DECON_MAX_PCT,
        training_export_decontaminated,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        train_eval_contamination,
        training_export_manifest,
    )

    full = {
        r["shard"]: r["n_docs"]
        for r in training_export_manifest(spark, sf_dir).collect()
    }
    clean = {
        r["shard"]: r["n_docs"]
        for r in training_export_decontaminated(spark, sf_dir).collect()
    }
    # manifest over a subset: per-shard counts never grow
    assert all(clean[s] <= full[s] for s in clean)
    # and the subset is strictly smaller iff something was flagged
    n_flagged = (
        train_eval_contamination(spark, sf_dir)
        .filter(
            F.col("n_contaminated") * 100
            > F.col("n_grams") * DECON_MAX_PCT
        )
        .count()
    )
    # full manifest covers ALL docs; clean covers train-split minus
    # flagged — so the difference is at least n_flagged (val/test
    # docs are also absent from clean)
    assert sum(full.values()) - sum(clean.values()) >= n_flagged


def test_ranged_ids_agree_with_generic_form(spark):
    from firefox_public_data_report_etl_spark.operators.ordering import (
        assign_contiguous_ids_ranged,
    )

    # unique skewed numeric keys (clustered low values + sparse tail)
    df = spark.range(500).select(
        F.when(F.col("id") < 400, F.col("id"))
        .otherwise(F.col("id") * 1000)
        .alias("k")
    )
    a = {
        r["k"]: r["rid"]
        for r in assign_contiguous_ids(df, ["k"], id_name="rid").collect()
    }
    b = {
        r["k"]: r["rid"]
        for r in assign_contiguous_ids_ranged(
            df, "k", id_name="rid"
        ).collect()
    }
    assert a == b
    assert sorted(b.values()) == list(range(500))


def test_ranged_ids_no_checkpoint_no_partitionless_window(spark, sf_dir):
    import re

    plan = documents_row_ids(spark, sf_dir)._jdf.queryExecution().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0].strip()
        assert head and "ASC" not in head and "DESC" not in head
    # the ranged form never materializes: no checkpoint scan node
    assert "Checkpoint" not in plan and "LogicalRDD" not in plan


def test_shuffle_key_exact_at_int64_extremes(spark):
    from firefox_public_data_report_etl_spark.operators.ordering import (
        _EPOCH_STRIDE,
        _MIX_A,
        _MIX_B,
        _MIX_C,
        _MOD,
        epoch_shuffle_key,
    )

    ids = [17, 2**31 - 2, 2**31, 2**45 + 3, 2**62]
    df = spark.createDataFrame([(i, 1) for i in ids], "doc_id long, e int")
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id",
            epoch_shuffle_key(F.col("doc_id"), F.col("e")).alias("k"),
        ).collect()
    }
    for i in ids:
        want = ((i % _MOD) * _MIX_A + 1 * _EPOCH_STRIDE + _MIX_C) % _MOD
        want = (want * _MIX_B) % _MOD
        assert got[i] == want, i


def test_upsample_exact_quota_and_repeat_shape(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        UPSAMPLE_QUOTAS,
        corpus_mixture_upsample,
    )

    rows = corpus_mixture_upsample(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    from collections import Counter

    per_lang = Counter(r["lang"] for r in rows)
    per_doc = Counter((r["lang"], r["doc_id"]) for r in rows)
    for s, k in UPSAMPLE_QUOTAS.items():
        n = n_by_lang[s]
        if k >= n:
            # upsampling: total exactly k, every doc floor or ceil times
            assert per_lang[s] == k
            lo, hi = k // n, k // n + (1 if k % n else 0)
            reps = [c for (l, _), c in per_doc.items() if l == s]
            assert len(reps) == n  # every doc present
            assert set(reps) <= {lo, hi}
            assert sum(reps) == k
        else:
            # downsampling prefix: k distinct docs, once each
            assert per_lang[s] == k
            assert all(
                c == 1 for (l, _), c in per_doc.items() if l == s
            )
    # copy_idx within each doc is dense 1..reps
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r["lang"], r["doc_id"]), []).append(r["copy_idx"])
    for v in by_doc.values():
        assert sorted(v) == list(range(1, len(v) + 1))


def test_length_grouped_batching_cuts_padding_waste(spark, sf_dir):
    from pyspark.sql import Window

    from firefox_public_data_report_etl_spark.plans.loader import (
        LEN_BATCH_SIZE,
        length_grouped_batches,
    )

    out = length_grouped_batches(spark, sf_dir).collect()
    for r in out:
        assert 1 <= r["n_seqs"] <= LEN_BATCH_SIZE
        assert r["padding_waste"] == (
            r["n_seqs"] * r["max_tokens"] - r["sum_tokens"]
        )
        assert r["padding_waste"] >= 0
    grouped_waste = sum(r["padding_waste"] for r in out)
    # naive arrival-order batching (by doc_id, no length grouping)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.length("text") / 4).cast("long").alias("tokens")
    )
    w = Window.orderBy("doc_id")
    naive = (
        docs.withColumn(
            "b", ((F.row_number().over(w) - 1) / LEN_BATCH_SIZE).cast("long")
        )
        .groupBy("b")
        .agg(
            (F.count("*") * F.max("tokens") - F.sum("tokens")).alias("w")
        )
        .agg(F.sum("w").alias("total"))
        .collect()[0]["total"]
    )
    assert grouped_waste < naive


def test_spans_agree_with_pack_sequences_placement(spark, sf_dir):
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_sequences,
        pack_window_spans,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    placed = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(
            docs, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
        ).collect()
        if r["tokens"] > 0
    }
    starts = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["tok_offset"])
        for r in pack_window_spans(
            docs, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
        ).collect()
        if r["is_start"]
    }
    # the two manifests describe ONE layout: identical placement keys
    assert placed == starts


def test_token_budget_greedy_prefix(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        TOKEN_BUDGETS,
        corpus_mixture_token_budget,
    )

    rows = corpus_mixture_token_budget(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for s, b in TOKEN_BUDGETS.items():
        lrows = sorted(by_lang.get(s, []), key=lambda r: r["cum_tokens"])
        if not lrows:
            continue
        # every selected doc STARTS inside the budget; overrun only by
        # part of the last doc
        for r in lrows:
            assert r["cum_tokens"] - r["tokens"] < b
        assert lrows[-1]["cum_tokens"] >= min(
            b, lrows[-1]["cum_tokens"]
        )
        # prefix is maximal: dropping the last doc leaves cum < budget
        # (unless the stratum ran out of docs entirely)
        if lrows[-1]["cum_tokens"] > b:
            assert lrows[-1]["cum_tokens"] - lrows[-1]["tokens"] < b


def test_shuffle_audit_counts_match_python(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        shuffle_quality_audit,
        training_epoch_order,
    )

    docs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    order = {}
    for r in training_epoch_order(spark, sf_dir).collect():
        order.setdefault((r["epoch"], r["shard_id"]), {})[r["pos"]] = r[
            "doc_id"
        ]
    want = {}
    for (e, _s), posmap in order.items():
        adj = same = 0
        for p, d in posmap.items():
            if p + 1 in posmap:
                adj += 1
                same += docs[d] == docs[posmap[p + 1]]
        a, sm = want.get(e, (0, 0))
        want[e] = (a + adj, sm + same)
    got = {
        r["epoch"]: (r["n_adjacent"], r["n_same_lang"])
        for r in shuffle_quality_audit(spark, sf_dir).collect()
    }
    assert got == want


def test_sft_loss_mask_invariants(spark, sf_dir):
    """Span-union property (r9 verdict #2): for every packed doc the
    prompt span ∪ completion span is exactly its token interval —
    contiguous, non-overlapping, conserving tokens; the loss mask
    covers completion tokens only; windows stay within capacity."""
    from firefox_public_data_report_etl_spark.plans.loader import (
        sft_pack_loss_mask,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
    )

    rows = sft_pack_loss_mask(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, dict] = {}
    bins: dict[tuple, int] = {}
    for r in rows:
        d = by_doc.setdefault(r["doc_id"], {})
        assert r["part"] not in d  # one span per part per doc
        d[r["part"]] = r
        bins[(r["shard"], r["bin_id"])] = max(
            bins.get((r["shard"], r["bin_id"]), 0),
            r["span_offset"] + r["span_len"],
        )
    docs = {
        r["doc_id"]: r["t"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", (F.length("text") / 4).cast("long").alias("t"))
        .collect()
    }
    for doc_id, d in by_doc.items():
        p, c = d["prompt"], d["completion"]
        assert not p["loss_mask"] and c["loss_mask"]
        assert p["span_len"] >= 1 and c["span_len"] >= 1
        # completion starts exactly where the prompt ends (union is
        # the doc's whole contiguous token interval)
        assert c["span_offset"] == p["span_offset"] + p["span_len"]
        assert p["span_len"] + c["span_len"] == docs[doc_id]
        assert (p["shard"], p["bin_id"]) == (c["shard"], c["bin_id"])
    # exactly the eligible docs (2 <= tokens <= capacity), whole
    assert set(by_doc) == {
        d for d, t in docs.items() if 2 <= t <= PACK_CAPACITY
    }
    for fill in bins.values():
        assert fill <= PACK_CAPACITY


def test_nosplit_packing_invariants(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.loader import (
        sequence_packing_nosplit,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
    )

    rows = sequence_packing_nosplit(spark, sf_dir).collect()
    assert rows
    seen = set()
    bins: dict[tuple, list] = {}
    for r in rows:
        assert r["doc_id"] not in seen  # whole docs, exactly once
        seen.add(r["doc_id"])
        bins.setdefault((r["shard"], r["bin_id"]), []).append(
            (r["bin_offset"], r["tokens"])
        )
    for spans in bins.values():
        spans.sort()
        fill = 0
        for off, t in spans:
            assert off == fill  # contiguous within the bin
            fill += t
        assert fill <= PACK_CAPACITY  # capacity never exceeded
    # only eligible docs packed (0 < tokens <= capacity)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.length("text") / 4).cast("long").alias("t")
    )
    eligible = {
        r["doc_id"]
        for r in docs.filter(
            (F.col("t") > 0) & (F.col("t") <= PACK_CAPACITY)
        ).collect()
    }
    assert seen == eligible


def test_loader_capstone_composition_contract(spark, sf_dir):
    # the packed doc set is EXACTLY the budget mixture's survivors
    # intersected with packing eligibility, and token mass conserves
    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
        pack_no_split,
    )
    from firefox_public_data_report_etl_spark.plans.loader import (
        corpus_mixture_token_budget,
        training_loader_capstone,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    taken = corpus_mixture_token_budget(spark, sf_dir).select(
        "doc_id", "tokens"
    )
    eligible = {
        r.doc_id
        for r in taken.collect()
        if 0 < r.tokens <= PACK_CAPACITY
    }
    docs = load_table(spark, sf_dir, "documents").join(
        taken.select("doc_id"), "doc_id"
    )
    packed = pack_no_split(
        docs, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    ).collect()
    assert {r.doc_id for r in packed} == eligible
    windows = training_loader_capstone(spark, sf_dir).collect()
    assert sum(w.tokens_filled for w in windows) == sum(
        r.tokens for r in packed
    )
    for w in windows:
        assert 0 < w.tokens_filled <= PACK_CAPACITY
        assert w.fill_ppm == (1_000_000 * w.tokens_filled) // PACK_CAPACITY


def test_capacity_refill_closed_form(spark, sf_dir):
    # recompute the greedy in-order redistribution in plain Python
    # from survivor counts and pin the closed-form cumsum rule
    from collections import Counter

    from firefox_public_data_report_etl_spark.plans.loader import (
        REFILL_QUOTAS,
        corpus_mixture_capacity_refill,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    seen = {}
    for r in docs:
        seen.setdefault(
            __import__("hashlib").md5(r.text.encode()).hexdigest(), []
        ).append(r)
    surv = Counter()
    for rows in seen.values():
        keeper = min(rows, key=lambda r: r.doc_id)
        surv[keeper.lang] += 1
    langs = sorted(surv)
    base = {s: min(REFILL_QUOTAS.get(s, 0), surv[s]) for s in langs}
    cap = {s: surv[s] - base[s] for s in langs}
    pool = sum(max(0, REFILL_QUOTAS.get(s, 0) - surv[s]) for s in langs)
    refill, cum = {}, 0
    for s in langs:
        refill[s] = max(0, min(cap[s], pool - cum))
        cum += cap[s]
    out = corpus_mixture_capacity_refill(spark, sf_dir).collect()
    taken = Counter(r.lang for r in out)
    via = Counter(r.lang for r in out if r.via_refill)
    for s in langs:
        assert taken.get(s, 0) == base[s] + refill[s], s
        assert via.get(s, 0) == refill[s], s
    for r in out:
        assert (r.rnk > base[r.lang]) == bool(r.via_refill)
        assert 1 <= r.rnk <= surv[r.lang]
    # the fr quota genuinely overflows its capacity at every SF, so
    # the redistribution path is exercised, not vacuous
    assert pool > 0 and sum(refill.values()) > 0
