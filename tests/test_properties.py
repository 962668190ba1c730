"""Property-based tests (hypothesis) for the data-dependent operators —
the test style the reference lacks entirely (SURVEY.md §5)."""

from __future__ import annotations

import pytest

# Property-based (hypothesis) suites are minutes-scale: full profile only
# (FPDR_FULL_TESTS=1); unit/parity coverage of the same operators stays fast.
pytestmark = pytest.mark.full

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators import collapse_buckets
from firefox_public_data_report_etl_spark.operators.skew import (
    salted_count_distinct,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

counts_strategy = st.lists(
    st.tuples(
        st.sampled_from([f"k{i}" for i in range(12)]),
        st.integers(min_value=1, max_value=500),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(rows=counts_strategy)
@_settings
def test_collapse_preserves_total_and_threshold(spark, rows):
    df = spark.createDataFrame(rows, ["key", "cnt"])
    out = collapse_buckets(
        df, scope_cols=[], key_col="key", count_col="cnt", threshold=(1, 10)
    ).collect()
    total = sum(c for _, c in rows)
    thr = total // 10
    got_total = sum(r["cnt"] for r in out)
    assert got_total == total                       # counts conserved
    assert abs(sum(r["ratio"] for r in out) - 1.0) < 1e-9
    for r in out:
        if r["key"] != "Other":
            # every surviving bucket meets the threshold
            assert r["cnt"] >= thr
    keys = [r["key"] for r in out]
    assert len(keys) == len(set(keys))              # re-keying merged


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["hot", "g1", "g2"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.sampled_from([1, 3, 16]),
)
@_settings
def test_salted_distinct_is_exact(spark, rows, n_salts):
    df = spark.createDataFrame(rows, ["g", "k"])
    got = {
        r["g"]: r["d"]
        for r in salted_count_distinct(df, ["g"], "k", "d", n_salts).collect()
    }
    expected = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("d")).collect()
    }
    assert got == expected


def test_cents_roundtrip_exhaustive(spark):
    """cents() must invert x/100 exactly for every 2-decimal value in
    ±1e6 cents (covers every fractional bit pattern a monetary double
    in testdata range can take, including negatives and ties like
    x.xx5 that double division can land just above or below)."""
    from firefox_public_data_report_etl_spark.functions import cents

    df = spark.range(-1_000_000, 1_000_001).select(
        F.col("id").alias("true_cents"),
        (F.col("id").cast("double") / 100.0).alias("dollars"),
    )
    bad = (
        df.select("true_cents", cents(F.col("dollars")).alias("got"))
        .filter(F.col("got") != F.col("true_cents"))
        .count()
    )
    assert bad == 0


def test_cents_matches_spark_round_on_random_doubles(spark):
    """On arbitrary (not-2-decimal) doubles the arithmetic form must
    still agree with Spark's BigDecimal HALF_UP round — the contract
    the DuckDB oracles were originally written against."""
    from firefox_public_data_report_etl_spark.functions import cents

    df = spark.range(0, 200_000).select(
        (
            (F.hash(F.col("id").cast("string")).cast("double") / 1000.0)
        ).alias("x")
    )
    bad = (
        df.select(
            cents(F.col("x")).alias("a"),
            F.round(F.col("x") * 100).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert bad == 0


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters="\x00"
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pii_scrub_idempotent(spark, texts):
    """Scrubbing already-scrubbed text finds nothing: replacement
    tokens contain no digits or @, so no pattern can re-fire — a
    double-redaction pass is a no-op for ANY input."""
    from firefox_public_data_report_etl_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = pii_scrub(docs).withColumnRenamed("scrubbed", "text")
    twice = pii_scrub(once.select("doc_id", "text")).collect()
    for r in twice:
        assert (
            r["n_email"] == r["n_phone"] == r["n_ipv4"] == r["n_idnum"] == 0
        ), r


@given(
    docs_words=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_boilerplate_bounds(spark, docs_words):
    """For any corpus: every doc with >= n tokens gets exactly
    len-n+1 grams, 0 <= n_boiler <= n_grams, and with min_df=1 every
    gram is 'boilerplate' (frac == 1)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        boilerplate_scores,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_scores(docs, n=3, min_df=5).collect()}
    for i, ws in enumerate(docs_words):
        n_tok = len(" ".join(ws).split(" "))  # split semantics: '' -> ['']
        if n_tok < 3:
            assert i not in out
        else:
            assert out[i]["n_grams"] == n_tok - 2
            assert 0 <= out[i]["n_boiler"] <= out[i]["n_grams"]
    allb = boilerplate_scores(docs, n=3, min_df=1).collect()
    assert all(r["n_boiler"] == r["n_grams"] for r in allb)


def test_document_chunks_cover_and_overlap(spark, sf_dir):
    """Chunking invariants over the real corpus: every token position
    of every doc is covered by >= 1 chunk, consecutive chunks overlap
    by exactly CHUNK_TOKENS - CHUNK_STRIDE tokens (verified on the
    text itself), and short docs yield exactly one chunk."""
    from firefox_public_data_report_etl_spark.plans.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        document_chunks,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in document_chunks(spark, sf_dir).collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r[
            "chunk_text"
        ].split(" ")
    assert set(by_doc) == set(docs)
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    for doc_id, toks in docs.items():
        chunks = by_doc[doc_id]
        assert sorted(chunks) == list(range(len(chunks)))
        if len(toks) <= CHUNK_TOKENS:
            assert len(chunks) == 1 and chunks[0] == toks
            continue
        # coverage: chunk k starts at k*stride and the last chunk
        # reaches the final token
        covered = 0
        for k in sorted(chunks):
            assert chunks[k] == toks[
                k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_TOKENS
            ]
            covered = max(covered, k * CHUNK_STRIDE + len(chunks[k]))
        assert covered == len(toks)
        for k in range(len(chunks) - 1):
            assert chunks[k][-overlap:] == chunks[k + 1][: overlap]


_token = st.sampled_from(
    ["a", "b", "céf", "日本", "x1", "the", "of", "ω", "z"]
)
_docs_strategy = st.lists(
    st.lists(_token, min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=10,
)


@given(texts=_docs_strategy)
@_settings
def test_simhash_blocking_lossless_on_arbitrary_corpora(spark, texts):
    """Losslessness must hold for ANY corpus — empty docs, one-token
    docs, unicode tokens, heavy duplication (tiny token alphabet ⇒
    many identical/near-identical signatures, the worst case for a
    blocking bug) — and for both the pigeonhole and the Manku
    combination layout."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sims = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, bits=60).collect()
    }
    ids = sorted(sims)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 2:
                brute.add((a, b, h))
    for n_blocks in (None, 6):
        got = {
            (r["da"], r["db"], r["hamming"])
            for r in simhash_pairs(
                docs, max_hamming=2, bits=60, n_blocks=n_blocks
            ).collect()
        }
        assert got == brute


@given(
    lengths=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=5),
            st.sampled_from([47, 48, 49, 63, 64, 65, 111, 112, 113]),
        ),
        min_size=1,
        max_size=8,
    )
)
@_settings
def test_document_chunks_boundaries(spark, lengths):
    """Chunk-count and reconstruction invariants at the exact window/
    stride boundaries (n = C−1, C, C+1, multiples of the stride, and
    degenerate 0/1-token docs): every doc yields ceil(max(0, n−C)/S)+1
    chunks, chunk k is precisely tokens[kS : kS+C], and the chunks
    concatenate (dropping the overlap) back to the original text."""
    import math

    from firefox_public_data_report_etl_spark.plans.text import (
        CHUNK_STRIDE as S,
        CHUNK_TOKENS as C,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        document_chunks,
    )

    texts = [" ".join(f"t{j}" for j in range(n)) for n in lengths]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )

    import firefox_public_data_report_etl_spark.plans.text as textmod
    orig = textmod.load_table
    textmod.load_table = lambda _s, _d, _t: docs
    try:
        rows = document_chunks(spark, "unused").collect()
    finally:
        textmod.load_table = orig

    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r[
            "chunk_text"
        ].split(" ")
    for i, text in enumerate(texts):
        toks = text.split(" ")  # '' -> [''] — split semantics
        n = len(toks)
        expect = 1 + max(0, math.ceil((n - C) / S))
        chunks = by_doc[i]
        assert len(chunks) == expect
        rebuilt: list[str] = []
        for k in sorted(chunks):
            assert chunks[k] == toks[k * S : k * S + C]
            rebuilt.extend(chunks[k] if k == 0 else chunks[k][C - S :])
        assert rebuilt == toks


# --- C4 span dedup (round 7): structural invariants on random corpora ---

_span_corpus = st.lists(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(6)]),  # tiny vocab → real dups
        min_size=1,
        max_size=35,
    ),
    min_size=1,
    max_size=20,
)


@given(corpus=_span_corpus)
@_settings
def test_dedup_line_spans_invariants(spark, corpus):
    """On ANY corpus: (1) every distinct span survives exactly once
    corpus-wide; (2) each doc's reassembled text is the in-order
    concatenation of its kept spans; (3) span/keep counts add up."""
    from firefox_public_data_report_etl_spark.operators.text import (
        dedup_line_spans,
    )

    L = 4
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    out = {
        r["doc_id"]: r
        for r in dedup_line_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            span_tokens=L,
        ).collect()
    }
    # reference segmentation in plain python
    segs = {}
    for i, toks in enumerate(corpus):
        segs[i] = [
            " ".join(toks[k : k + L]) for k in range(0, len(toks), L)
        ]
    first = {}
    for i in sorted(segs):
        for sn, line in enumerate(segs[i]):
            first.setdefault(line, (i, sn))
    for i, toks in enumerate(corpus):
        kept = [
            line
            for sn, line in enumerate(segs[i])
            if first[line] == (i, sn)
        ]
        r = out[i]
        assert r["n_spans"] == len(segs[i])
        assert r["n_kept"] == len(kept)
        assert r["text_dedup"] == " ".join(kept)  # order preserved
    # global uniqueness: kept spans across the corpus == distinct spans
    all_kept = [
        line
        for i in segs
        for sn, line in enumerate(segs[i])
        if first[line] == (i, sn)
    ]
    assert len(all_kept) == len(set(all_kept))
    assert set(all_kept) == {l for ls in segs.values() for l in ls}


@given(corpus=_span_corpus)
@_settings
def test_dedup_line_spans_agg_mode_agrees_with_window(spark, corpus):
    """The skew-safe min-struct strategy must be bit-identical to the
    window strategy on ANY corpus (adversarial hot spans included —
    the tiny vocab plants heavy span repetition)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        dedup_line_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["text_dedup"])
        for r in dedup_line_spans(docs, span_tokens=4).collect()
    }
    b = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["text_dedup"])
        for r in dedup_line_spans(
            docs, span_tokens=4, first_occurrence="agg"
        ).collect()
    }
    assert a == b


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hashproj_partition_and_order_invariant(spark, texts, parts):
    """Embeddings are a pure function of (id, text): repartitioning
    and reversing input order must produce identical vectors, and
    norm must equal the exact sum of squares."""
    from pyspark.sql import Row

    from firefox_public_data_report_etl_spark.operators.text import (
        hashproj_embeddings,
    )

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    a = (
        hashproj_embeddings(spark.createDataFrame(rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    b = (
        hashproj_embeddings(
            spark.createDataFrame(list(reversed(rows))).repartition(parts)
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert [list(q) for q in a.q] == [list(q) for q in b.q]
    for _, r in a.iterrows():
        assert r["norm"] == sum(int(x) * int(x) for x in r["q"])


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    max_dim=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_resize_rule_invariants(spark, w, h, max_dim):
    """The resize target rule: identity at/below the cap, longest
    side == cap above it (1-px floor on the short side), aspect
    never inverted."""
    import numpy as np

    from firefox_public_data_report_etl_spark.operators.multimodal import (
        resize_nearest,
    )

    longest = max(w, h)
    if longest > max_dim:
        tw = max(1, (w * max_dim) // longest)
        th = max(1, (h * max_dim) // longest)
    else:
        tw, th = w, h
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    out = resize_nearest(rgb, tw, th)
    assert out.shape == (th, tw, 3)
    if longest <= max_dim:
        assert np.array_equal(out, rgb)  # identity below the cap
    else:
        assert max(tw, th) == max_dim
    if w >= h:
        assert tw >= th
    else:
        assert th >= tw
    # every output pixel exists in the source row/col it mapped from
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    assert np.array_equal(out, rgb[ys[:, None], xs[None, :]])


# --- training-loader order properties (round 9 continuation) ---------

tok_docs_strategy = st.lists(
    st.integers(min_value=0, max_value=1300),  # token counts incl. 0
    min_size=1,
    max_size=40,
)


@given(toks=tok_docs_strategy)
@_settings
def test_window_spans_properties(spark, toks):
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_window_spans,
    )

    cap = 128
    rows = [(i, "x" * (4 * t)) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_window_spans(df, capacity=cap, n_shards=2).collect()
    # conservation: every doc's spans sum to its token count, with
    # exactly one is_start; zero-token docs emit nothing
    mass: dict[int, int] = {}
    starts: dict[int, int] = {}
    for r in out:
        mass[r["doc_id"]] = mass.get(r["doc_id"], 0) + r["span_len"]
        starts[r["doc_id"]] = starts.get(r["doc_id"], 0) + bool(
            r["is_start"]
        )
        assert 0 <= r["tok_offset"] < cap
        assert 1 <= r["span_len"] <= cap
        assert r["tok_offset"] + r["span_len"] <= cap
    for i, t in enumerate(toks):
        assert mass.get(i, 0) == t
        assert starts.get(i, 0) == (1 if t > 0 else 0)
    # windows are exactly full except possibly each shard's last
    fill: dict[tuple, int] = {}
    for r in out:
        key = (r["shard"], r["bin_id"])
        fill[key] = fill.get(key, 0) + r["span_len"]
    for shard in {s for s, _ in fill}:
        bins = sorted(b for s, b in fill if s == shard)
        assert bins == list(range(len(bins)))  # bins are dense
        for b in bins[:-1]:
            assert fill[(shard, b)] == cap


ids_strategy = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40),
    min_size=1,
    max_size=60,
    unique=True,
)


@given(keys=ids_strategy)
@_settings
def test_ranged_ids_dense_any_distribution(spark, keys):
    from firefox_public_data_report_etl_spark.operators.ordering import (
        assign_contiguous_ids_ranged,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = {
        r["k"]: r["rid"]
        for r in assign_contiguous_ids_ranged(
            df, "k", id_name="rid", num_partitions=8
        ).collect()
    }
    ordered = sorted(keys)
    assert out == {k: i for i, k in enumerate(ordered)}
