"""Pure-Python Count-Min sketch decoder (operators/cms_codec.py):
must reproduce the JVM sketch library's estimates bit-exactly from
the same serialized bytes — the decoder is what lets
token_heavy_hitters run without the private _jvm gateway (r7 review
fix), so its agreement with the writer is THE correctness surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.cms_codec import (
    CountMinSketchBytes,
    murmur3_32_spark,
)


def _sketch_bytes(spark, values, eps=0.01, conf=0.95, seed=7):
    df = spark.createDataFrame([(v,) for v in values], "token string")
    row = df.agg(
        F.count_min_sketch(
            "token", F.lit(eps), F.lit(conf), F.lit(seed)
        ).alias("sk")
    ).head()
    return bytes(row["sk"])


TOKENS = (
    ["alpha"] * 5
    + ["beta"] * 3
    + ["gamma"]
    + ["päivää", "päivää"]  # multi-byte UTF-8 exercises the signed tail
    + ["", " ", "a", "ab", "abc", "abcd", "abcde"]  # every tail length
)


def test_decoder_matches_jvm_reader(spark):
    """Same bytes, same estimates as org.apache.spark.util.sketch —
    for present tokens, absent tokens, and multi-byte UTF-8. Uses the
    JVM gateway HERE (test-only pin of the wire contract); the
    production path never does."""
    data = _sketch_bytes(spark, TOKENS)
    py = CountMinSketchBytes.from_bytes(data)

    jvm = spark.sparkContext._jvm
    jcms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(data)
    )
    probes = set(TOKENS) | {"absent", "nope", "päivä", "ααβ", "x" * 33}
    for t in sorted(probes):
        assert py.estimate_string(t) == int(jcms.estimateCount(t)), t
    assert py.total_count == int(jcms.totalCount()) == len(TOKENS)
    assert py.depth == int(jcms.depth()) and py.width == int(jcms.width())


def test_estimates_never_undercount(spark):
    data = _sketch_bytes(spark, TOKENS)
    py = CountMinSketchBytes.from_bytes(data)
    from collections import Counter

    for t, c in Counter(TOKENS).items():
        assert py.estimate_string(t) >= c


def test_murmur_matches_sql_hash_on_word_aligned_input(spark):
    """Spark SQL's hash() is the same Murmur3_x86_32 over the UTF-8
    bytes (seed 42) — an independent cross-check of the word loop
    (SQL hash covers the identical tail path too)."""
    vals = ["abcd", "12345678", "tail1", "ää", "", "xyz"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.hash("s").alias("h")).collect()
    }
    for v in vals:
        assert murmur3_32_spark(v.encode("utf-8"), 42) == got[v], v


def test_rejects_unknown_version():
    with pytest.raises(ValueError, match="version"):
        CountMinSketchBytes.from_bytes(
            (2).to_bytes(4, "big") + b"\x00" * 32
        )
