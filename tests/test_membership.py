"""Bloom membership (operators/membership.py): the properties the
`contamination_bloom_probe` oracle alone cannot express — no false
negatives ever (a folded key always probes true), the bitset stays
bounded at m/64 rows however many keys are folded, and an empty
filter rejects everything (the coalesce path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.membership import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_probe,
    bloom_word_table,
)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("h"))


def test_no_false_negatives(spark):
    # include keys engineered to land on bit 63 of some word somewhere
    # (5k keys ~ 15k positions cover all 64 bit offsets): the round-10
    # regression this pins was Spark's sign-keeping % turning any
    # word with bit 63 set into a false negative.
    keys = _keys(spark, 0, 5000)
    words = bloom_word_table(keys)
    probed = bloom_probe(keys, "h", words)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_word_table_bounded_and_bit63_present(spark):
    words = bloom_word_table(_keys(spark, 0, 50000)).collect()
    assert len(words) <= BLOOM_M_BITS // 64
    # the adversarial regime exists in the fixture: at least one word
    # is negative (bit 63 set), so the no-false-negative pass above
    # actually exercised the signed-long path
    assert any(r.word < 0 for r in words)


def test_empty_filter_rejects_all(spark):
    empty = _keys(spark, 0, 0)
    words = bloom_word_table(empty)
    probed = bloom_probe(_keys(spark, 0, 100), "h", words)
    assert probed.filter(F.col("bloom_hit")).count() == 0


def test_superset_of_truth_in_registry_query(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.text import (
        contamination_bloom_probe,
    )

    out = contamination_bloom_probe(spark, sf_dir)
    assert (
        out.filter(
            (F.col("n_bloom_hits") < F.col("n_true_hits"))
            | (F.col("n_false_pos") < 0)
        ).count()
        == 0
    )


def test_probe_plan_broadcasts_and_keeps_grain(spark):
    keys = _keys(spark, 0, 1000)
    words = bloom_word_table(keys)
    plan = bloom_probe(keys, "h", words)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == BLOOM_K
    assert "SortMergeJoin" not in plan
