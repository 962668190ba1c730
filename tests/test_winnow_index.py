"""Winnowing fingerprint index (operators/winnow_index.py): the
parquet round-trip + partition-pruned probe is pinned EQUAL to the
in-memory registry form (`dedup_winnowing_incremental`), appends and
replay exclusion behave like the other three index lifecycles, and
compaction preserves results while folding labels."""

from __future__ import annotations

import pytest

# Index-lifecycle e2e: full profile (see test_hamming_index note).
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.winnow_index import (
    append_to_winnow_index,
    build_winnow_index,
    compact_winnow_index,
    probe_winnow_index,
)
from firefox_public_data_report_etl_spark.plans.dedup import BATCH_MOD


def _split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") % BATCH_MOD != 0)
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
    return docs, base, batch


def _pairs(probe):
    with probe:
        return sorted(
            (r.base_id, r.batch_id, r.shared) for r in probe.pairs.collect()
        )


def test_probe_equals_registry_form(spark, sf_dir, tmp_path):
    from firefox_public_data_report_etl_spark.plans.text import (
        dedup_winnowing_incremental,
    )

    _, base, batch = _split(spark, sf_dir)
    path = str(tmp_path / "widx")
    build_winnow_index(base, path)
    got = _pairs(probe_winnow_index(spark, path, batch))
    want = sorted(
        (r.base_id, r.batch_id, r.shared)
        for r in dedup_winnowing_incremental(spark, sf_dir).collect()
    )
    assert got == want and got


@pytest.mark.full
def test_append_then_probe_sees_both_slices(spark, sf_dir, tmp_path):
    _, base, batch = _split(spark, sf_dir)
    half = base.filter(F.col("doc_id") % 2 == 1)
    other = base.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "widx")
    build_winnow_index(half, path)
    append_to_winnow_index(spark, path, other, batch_label=1)
    full_path = str(tmp_path / "widx_full")
    build_winnow_index(base, full_path)
    got = _pairs(probe_winnow_index(spark, path, batch))
    want = _pairs(probe_winnow_index(spark, full_path, batch))
    assert got == want and got


def test_exclude_label_masks_slice(spark, sf_dir, tmp_path):
    _, base, batch = _split(spark, sf_dir)
    half = base.filter(F.col("doc_id") % 2 == 1)
    other = base.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "widx")
    build_winnow_index(half, path)
    append_to_winnow_index(spark, path, other, batch_label=1)
    masked = _pairs(
        probe_winnow_index(spark, path, batch, exclude_label=1)
    )
    base_ids = {r[0] for r in masked}
    assert base_ids and all(i % 2 == 1 for i in base_ids)


@pytest.mark.full
def test_append_idempotent_and_compact_preserves(spark, sf_dir, tmp_path):
    _, base, batch = _split(spark, sf_dir)
    half = base.filter(F.col("doc_id") % 2 == 1)
    other = base.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "widx")
    build_winnow_index(half, path)
    append_to_winnow_index(spark, path, other, batch_label=1)
    before = _pairs(probe_winnow_index(spark, path, batch))
    # replayed append must not duplicate fingerprints
    append_to_winnow_index(spark, path, other, batch_label=1)
    assert _pairs(probe_winnow_index(spark, path, batch)) == before
    compact_winnow_index(spark, path)
    assert _pairs(probe_winnow_index(spark, path, batch)) == before
    # newest label (1) is preserved through compaction for replay
    labels = {
        r.bl
        for r in spark.read.parquet(f"{path}/sel").select("bl").distinct().collect()
    }
    assert labels == {0, 1}


def test_empty_batch_probe(spark, sf_dir, tmp_path):
    _, base, _ = _split(spark, sf_dir)
    path = str(tmp_path / "widx")
    build_winnow_index(base, path)
    empty = spark.createDataFrame([], "doc_id long, text string")
    probe = probe_winnow_index(spark, path, empty)
    assert probe.pairs.count() == 0


def test_contamination_winnowing_planted_span(spark):
    # a train doc that copies a >= 12-char passage from a held-out doc
    # must share a selected fingerprint (the guarantee) and be caught
    # by the same cross_winnow_pairs join the registry query runs
    from firefox_public_data_report_etl_spark.operators.text import (
        winnow_fingerprints,
    )
    from firefox_public_data_report_etl_spark.operators.winnow_index import (
        cross_winnow_pairs,
    )

    leak = "the quick brown fox jumps over the lazy dog"
    held = spark.createDataFrame(
        [(1, "held out eval passage " + leak + " end of eval")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "completely unrelated training material here x"),
            (11, "sneaky training doc embedding " + leak + " verbatim"),
        ],
        "doc_id long, text string",
    )
    sel_h = winnow_fingerprints(held).select("doc_id", "h").distinct()
    sel_t = winnow_fingerprints(train).select("doc_id", "h").distinct()
    pairs = cross_winnow_pairs(sel_h, sel_t, max_df=100, shared_min=2)
    got = {(r.base_id, r.batch_id) for r in pairs.collect()}
    assert (1, 11) in got
    assert all(b != 10 for _, b in got)


def test_custom_id_col_probe(spark, tmp_path):
    """An index built with a non-default id column probes end-to-end:
    cross_winnow_pairs follows the meta's id_col instead of assuming
    'doc_id' (round-11 ADVICE fix)."""
    base = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),
         (11, "completely unrelated base document text content here")],
        "item_id long, body string",
    )
    batch = spark.createDataFrame(
        [(90, "copies the quick brown fox jumps over the lazy dog"),
         (91, "fresh novel content with zero shared substrings xyz")],
        "item_id long, body string",
    )
    path = str(tmp_path / "ididx")
    build_winnow_index(base, path, id_col="item_id", text_col="body")
    got = _pairs(probe_winnow_index(spark, path, batch))
    assert [(b, q) for b, q, _ in got] == [(10, 90)]
