"""Tokenizer head/tail audit (plans/text.py:tokenizer_tail_audit):
curve invariants — dense total-order ranks, monotone non-increasing
counts, exact cumulative tiling ending at 10^6 ppm, hapax flags."""

from __future__ import annotations


def test_tail_audit_curve_invariants(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans.text import (
        tokenizer_tail_audit,
    )

    rows = sorted(
        tokenizer_tail_audit(spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert rows
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    cum = 0
    prev_cnt = None
    total = rows[-1].cum_cnt
    for r in rows:
        assert r.cnt >= 1
        if prev_cnt is not None:
            assert r.cnt <= prev_cnt  # sorted by frequency
        prev_cnt = r.cnt
        cum += r.cnt
        assert r.cum_cnt == cum
        assert r.cum_ppm == (1_000_000 * cum) // total
        assert r.hapax == (r.cnt == 1)
    assert rows[-1].cum_ppm == 1_000_000
    # the head carries real mass: the top half of the vocab covers
    # well over half the stream on any Zipf-ish corpus (measured
    # 457k ppm at the top quarter on the synthetic corpus)
    head = rows[: max(1, len(rows) // 2)]
    assert head[-1].cum_ppm > 600_000
