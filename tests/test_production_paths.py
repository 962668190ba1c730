"""Agreement tests for the flag-gated production paths.

The oracle-checked queries run "parity" variants (md5-prefix hashes,
int64-quantized cosine) so DuckDB can reproduce them bit-for-bit. The
production variants — xxHash64 shingle/token hashing and float32
cosine — cannot be oracle-checked (DuckDB has no xxHash64; float32
accumulation order is engine-specific), so these tests pin each one
against its parity twin on the same inputs instead: same near-dup
decisions, same top-k neighbors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.dedup import (
    jaccard_for_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    simhash_signatures,
)
from firefox_public_data_report_etl_spark.operators.similarity import quantized
from firefox_public_data_report_etl_spark.operators.vectorized import (
    cosine_topk_matmul,
    cosine_topk_matmul_f32,
)
from firefox_public_data_report_etl_spark.sources import load_table

THRESHOLD = 0.5


def _dup_pairs(spark, sf_dir, hash_mode):
    sh = shingle_rows(
        load_table(spark, sf_dir, "documents"), hash_mode=hash_mode
    ).cache()
    sigs = minhash_signatures(sh, with_size=True).cache()
    out = jaccard_for_pairs(lsh_candidate_pairs(sigs), sh, sizes=sigs).filter(
        F.col("jaccard") >= THRESHOLD
    )
    rows = {(r["da"], r["db"], round(r["jaccard"], 6)) for r in out.collect()}
    sh.unpersist()
    sigs.unpersist()
    return rows


def test_minhash_xxhash64_agrees_with_parity(spark, sf_dir):
    """The thresholded near-dup pair set must be identical under both
    hash modes: exact Jaccard over hashed shingles is hash-agnostic up
    to 28-bit collisions (immaterial at corpus scale), and with planted
    dups at jaccard ~0.97 both LSH band layouts recover every pair —
    including the jaccard VALUES, which count distinct hashed shingles
    and so agree exactly when no collision fires."""
    parity = _dup_pairs(spark, sf_dir, "parity")
    prod = _dup_pairs(spark, sf_dir, "xxhash64")
    assert len(parity) > 0
    assert prod == parity


def test_simhash_xxhash64_separates_near_dups(spark, sf_dir):
    """SimHash bit values differ per hash, but the METRIC property must
    survive the hash swap: planted near-dup pairs (from the verified
    minhash set) sit at small hamming distance, far below the ~14-bit
    expectation for unrelated docs, under BOTH hash modes."""
    docs = load_table(spark, sf_dir, "documents")
    dup_pairs = [(da, db) for (da, db, _) in _dup_pairs(spark, sf_dir, "parity")]
    assert dup_pairs
    for mode in ("parity", "xxhash64"):
        sims = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, hash_mode=mode).collect()
        }
        for da, db in dup_pairs:
            ham = bin(sims[da] ^ sims[db]).count("1")
            assert ham <= 8, (mode, da, db, ham)


import pytest


@pytest.mark.parametrize(
    "hash_mode,bits,n_blocks",
    [("parity", 60, None), ("xxhash64", 64, None), ("parity", 60, 6)],
    ids=[
        "parity60-registry",
        "xxhash64-production",
        "parity60-manku-C(6,3)",
    ],
)
def test_simhash_pairs_banding_is_lossless(
    spark, sf_dir, hash_mode, bits, n_blocks
):
    """The combination-block join must recover EXACTLY the brute-force
    all-pairs Hamming ≤ k set — blocking is a candidate filter, never
    a recall trade-off (unlike MinHash banding). The property is
    hash- and layout-agnostic, so one test pins the md5-parity
    registry form (k+1 pigeonhole bands), the 64-bit xxhash64
    production mode (also exercising the signed bit-63 signature
    term), and the Manku-style C(6,3) wide-key layout."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        simhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["da"], r["db"], r["hamming"])
        for r in simhash_pairs(
            docs,
            max_hamming=3,
            hash_mode=hash_mode,
            bits=bits,
            n_blocks=n_blocks,
        ).collect()
    }
    sims = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(
            docs, hash_mode=hash_mode, bits=bits
        ).collect()
    }
    ids = sorted(sims)
    brute = set()
    mask64 = (1 << 64) - 1
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sims[a] ^ sims[b]) & mask64).count("1")
            if h <= 3:
                brute.add((a, b, h))
    assert brute
    assert got == brute


def test_cosine_f32_agrees_with_parity(spark, sf_dir):
    """Float32 brute-force top-3 vs the int64-quantized parity path on
    the same queries: identical (q_id, n_id) pair sets. Quantization
    error is 1e-3 per component — a rank flip would need a near-exact
    cosine tie, which the testdata embeddings don't have."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantized(emb).cache()
    queries_q = q.filter(F.col("vec_id") % 50 == 0)
    parity = {
        (r["q_id"], r["n_id"])
        for r in cosine_topk_matmul(queries_q, q, 3).collect()
    }
    raw = emb.select("vec_id", "embedding")
    queries_raw = raw.filter(F.col("vec_id") % 50 == 0)
    prod = {
        (r["q_id"], r["n_id"])
        for r in cosine_topk_matmul_f32(queries_raw, raw, 3).collect()
    }
    assert len(parity) > 0
    assert prod == parity
    q.unpersist()


def test_minhash_array_form_matches_row_form(spark, sf_dir):
    """The array-native pipeline (two shuffles) must produce the same
    thresholded pair set as the row-form pipeline it replaced."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        gram_hash_arrays,
        minhash_lsh_pairs_arr,
    )
    from firefox_public_data_report_etl_spark.plans.dedup import (
        JACCARD_THRESHOLD,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs).cache()
    sigs = minhash_signatures(sh, with_size=True).cache()
    row_form = {
        (r.da, r.db, round(r.jaccard, 9))
        for r in jaccard_for_pairs(lsh_candidate_pairs(sigs), sh, sizes=sigs)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .collect()
    }
    arr_form = {
        (r.da, r.db, round(r.jaccard, 9))
        for r in minhash_lsh_pairs_arr(gram_hash_arrays(docs))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .collect()
    }
    assert arr_form == row_form and row_form


def test_boilerplate_xxhash64_agrees_with_raw(spark, sf_dir):
    """gram_key='xxhash64' must reproduce the raw-string-key counts
    exactly (64-bit collisions are ~impossible at test corpus size) —
    the shuffle-width cut may not change a single (n_grams, n_boiler)
    pair."""
    from firefox_public_data_report_etl_spark.plans.text import (
        corpus_boilerplate,
        corpus_boilerplate_hashed,
    )

    raw = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"])
        for r in corpus_boilerplate(spark, sf_dir).collect()
    }
    hashed = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"])
        for r in corpus_boilerplate_hashed(spark, sf_dir).collect()
    }
    assert raw == hashed


def test_prefix_filter_equals_brute_force(spark, sf_dir):
    """Prefix filtering is lossless by theorem (PPJoin Lemma 1); this
    pins it empirically — the exact thresholded pair set must equal
    the all-pairs baseline, including the Jaccard values. Runs at two
    thresholds so the prefix-length formula is exercised off the
    planted-dup sweet spot too."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        all_pairs_jaccard,
        prefix_filter_pairs,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    from firefox_public_data_report_etl_spark.operators.dedup import (
        gram_hash_arrays,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs).cache()
    hs = gram_hash_arrays(docs)
    for t in (0.5, 0.3, 0.9):
        brute = {
            (r.da, r.db, round(r.jaccard, 9))
            for r in all_pairs_jaccard(sh)
            .filter(F.col("jaccard") >= t)
            .collect()
        }
        pf = {
            (r.da, r.db, round(r.jaccard, 9))
            for r in prefix_filter_pairs(hs, t).collect()
        }
        assert pf == brute and brute


def test_positional_filter_keeps_exact_threshold_pair(spark):
    """The PPJoin positional filter's overlap upper bound holds with
    EQUALITY for a pair at exactly J = t: here |A∩B| = 2 and the bound
    min(na−ia, nb−ib) at the first common prefix token is also 2, so a
    float comparison without the conservative slack could prune a true
    boundary pair. Constructed on raw (id, hs, n) rows: A={10,11,12},
    B={10,11,13} → J = 2/4 = 0.5 at t = 0.5; rarest-first order puts
    the unique token first and the shared tokens at positions 1–2 of
    each prefix."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    hs = spark.createDataFrame(
        [(1, [10, 11, 12], 3), (2, [10, 11, 13], 3)],
        "doc_id INT, hs ARRAY<BIGINT>, n INT",
    )
    got = {
        (r.da, r.db, round(r.jaccard, 9))
        for r in prefix_filter_pairs(hs, 0.5, "doc_id").collect()
    }
    assert got == {(1, 2, 0.5)}


def test_containment_detects_excerpts_jaccard_misses(spark):
    """A 30-token excerpt of a 200-token doc: containment(excerpt,
    base) = 1.0 while Jaccard ≈ 0.14 — the directed join finds it, the
    symmetric threshold can't. Also pins the one-sided prefix filter's
    exactness: no (base, excerpt) direction, no third-doc pairs."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        containment_pairs,
    )

    base = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(50, 80))
    other = " ".join(f"z{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, base), (2, excerpt), (3, other)], ["doc_id", "text"]
    )
    from firefox_public_data_report_etl_spark.operators.dedup import (
        gram_hash_arrays,
    )

    got = {
        (r.da, r.db, round(r.containment, 9))
        for r in containment_pairs(gram_hash_arrays(docs), 0.8).collect()
    }
    assert got == {(2, 1, 1.0)}


def test_containment_equals_brute_force(spark, sf_dir):
    """Directed-containment prefix filtering must reproduce the brute
    directed computation exactly on the real corpus."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        containment_pairs,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    from firefox_public_data_report_etl_spark.operators.dedup import (
        gram_hash_arrays,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("na"))
    sa = sh.select(F.col("doc_id").alias("da"), "h")
    sb = sh.select(F.col("doc_id").alias("db"), "h")
    brute = {
        (r.da, r.db, round(r.containment, 9))
        for r in sa.join(sb, "h")
        .filter(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
        .join(sizes.withColumnRenamed("doc_id", "da"), "da")
        .select(
            "da",
            "db",
            (F.col("inter").cast("double") / F.col("na")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= 0.6)
        .collect()
    }
    got = {
        (r.da, r.db, round(r.containment, 9))
        for r in containment_pairs(gram_hash_arrays(docs), 0.6).collect()
    }
    assert got == brute and brute


def test_group_split_never_leaks_near_dups(spark, sf_dir):
    """The group-aware split's whole point: every verified near-dup
    pair must land in ONE split. Checked directly against the pair
    set (not the group ids), so a wrong coalesce or hash column
    would fail even if groups were internally consistent. Also pins
    that all three splits are non-empty at test SF."""
    from firefox_public_data_report_etl_spark.plans.dedup import (
        JACCARD_THRESHOLD,
        corpus_group_split,
    )
    from firefox_public_data_report_etl_spark.operators.dedup import (
        gram_hash_arrays,
        minhash_lsh_pairs_arr,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    split = {
        r.doc_id: r.split
        for r in corpus_group_split(spark, sf_dir).collect()
    }
    pairs = (
        minhash_lsh_pairs_arr(
            gram_hash_arrays(load_table(spark, sf_dir, "documents"))
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .collect()
    )
    assert pairs
    for p in pairs:
        assert split[p.da] == split[p.db], (p.da, p.db)
    assert set(split.values()) == {"train", "val", "test"}
