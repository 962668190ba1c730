"""Multi-turn chat-SFT assembly (plans/loader.py:chat_sft_assembly):
the structural invariants the value-hash oracle cannot express as
properties — kept turns form a contiguous prefix of each
conversation, spans tile without gaps, roles strictly alternate with
the loss mask on assistant turns only, and no conversation exceeds
the context cap."""

from __future__ import annotations

from firefox_public_data_report_etl_spark.plans.loader import (
    CHAT_CTX_CAP,
    chat_sft_assembly,
)


def _rows(spark, sf_dir):
    out = chat_sft_assembly(spark, sf_dir).collect()
    convs: dict[int, list] = {}
    for r in out:
        convs.setdefault(r.conv_id, []).append(r)
    for turns in convs.values():
        turns.sort(key=lambda r: r.turn_idx)
    return convs


def test_prefix_tiling_alternation_and_cap(spark, sf_dir):
    convs = _rows(spark, sf_dir)
    assert convs
    for conv_id, turns in convs.items():
        # contiguous prefix: turn indices are 1..n with no holes —
        # truncation may only drop a SUFFIX of whole turns
        assert [t.turn_idx for t in turns] == list(
            range(1, len(turns) + 1)
        )
        # spans tile: each turn starts exactly where the previous ended
        off = 0
        for t in turns:
            assert t.span_offset == off
            assert t.span_len > 0
            off += t.span_len
        assert off <= CHAT_CTX_CAP
        # strict alternation starting at user; mask on assistant only
        for t in turns:
            want = "user" if t.turn_idx % 2 == 1 else "assistant"
            assert t.role == want
            assert t.loss_mask == (t.role == "assistant")


def test_truncation_drops_whole_turns_only(spark, sf_dir):
    # every kept conversation's total is <= cap AND adding the first
    # dropped turn (if any) would overflow — i.e. truncation is the
    # maximal whole-turn prefix, never a split turn
    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )
    from firefox_public_data_report_etl_spark.plans.loader import (
        CHAT_N_CONVS,
        CHAT_TURN_OVERHEAD,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    all_turns = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (
                F.expr(f"length(text) div {CHARS_PER_TOKEN_EST}").cast(
                    "long"
                )
                + CHAT_TURN_OVERHEAD
            ).alias("span_len"),
            (
                F.expr(md5_int_spark_sql("cast(doc_id as string)"))
                % CHAT_N_CONVS
            ).alias("conv_id"),
        )
        .filter(F.col("span_len") > CHAT_TURN_OVERHEAD)
        .collect()
    )
    full: dict[int, list] = {}
    for r in all_turns:
        full.setdefault(r.conv_id, []).append(r)
    for turns in full.values():
        turns.sort(key=lambda r: r.doc_id)
    kept = _rows(spark, sf_dir)
    for conv_id, turns in full.items():
        k = kept.get(conv_id, [])
        total = sum(t.span_len for t in k)
        if len(k) < len(turns):
            first_dropped = turns[len(k)]
            assert total + first_dropped.span_len > CHAT_CTX_CAP
