"""Caption↔image alignment (round-10 verdict #1): planted
matched/mismatched separation, projection-sign dialect parity, and
the caption-curation composition (filter before dedup). The
corpus-level value recompute is oracle-checked by
`multimodal_caption_align` / `multimodal_caption_curation`; these
tests pin the planted structure and the gate margins the oracle
alone cannot distinguish from coincidence."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from firefox_public_data_report_etl_spark.operators.multimodal import (
    CAP_COS2_DEN,
    CAP_COS2_NUM,
    CAP_DIM,
    CAP_FILLER,
    CAP_MIS_MOD,
    CAP_MIS_RES,
    CAP_SCORE_SCALE,
    NEARDUP_VARIANTS,
    _ndimg_rule_rgb,
    caption_described_id,
    caption_gray_cells,
    caption_text,
    decode_bmp24,
    encode_bmp24,
    visual_words,
)

GATE = CAP_COS2_NUM * CAP_SCORE_SCALE // CAP_COS2_DEN


def _signs(w: str) -> np.ndarray:
    h = hashlib.md5(w.encode()).hexdigest()
    return np.array(
        [
            1 - 2 * ((int(h[dm // 4], 16) >> (dm % 4)) & 1)
            for dm in range(CAP_DIM)
        ],
        dtype=np.int64,
    )


def test_codec_and_caption_agree_on_gray_cells():
    # the caption generator (logical rule) and the decode stage
    # (real bytes) must land identical gray cells — the bit-exactness
    # the matched-pair cosine relies on
    for mid in range(12):
        rgb = _ndimg_rule_rgb(mid)
        _w, _h, back = decode_bmp24(encode_bmp24(rgb))
        assert np.array_equal(
            caption_gray_cells(back), caption_gray_cells(rgb)
        )


def test_described_id_rule():
    for mid in range(25):
        did = caption_described_id(mid)
        if mid % CAP_MIS_MOD == CAP_MIS_RES:
            assert did != mid
            # a different SOURCE image, not a sibling variant
            assert did // NEARDUP_VARIANTS != mid // NEARDUP_VARIANTS
        else:
            assert did == mid


def test_planted_separation_local():
    # exact projection math (the oracle's arithmetic) over 400 ids:
    # every matched row clears the gate, every planted mismatch
    # falls well below it
    matched, mismatched = [], []
    for mid in range(400):
        img = np.zeros(CAP_DIM, dtype=np.int64)
        for w in visual_words(caption_gray_cells(_ndimg_rule_rgb(mid))):
            img += _signs(w)
        cap = np.zeros(CAP_DIM, dtype=np.int64)
        for w in caption_text(mid).split(" "):
            cap += _signs(w)
        dot = int(img @ cap)
        na, nb = int(img @ img), int(cap @ cap)
        cos2 = (dot * dot * CAP_SCORE_SCALE) // (na * nb)
        aligned = dot > 0 and CAP_COS2_DEN * dot * dot >= (
            CAP_COS2_NUM * na * nb
        )
        if mid % CAP_MIS_MOD == CAP_MIS_RES:
            mismatched.append((cos2, aligned))
        else:
            matched.append((cos2, aligned))
    assert all(a for _, a in matched)
    assert not any(a for _, a in mismatched)
    # wide margins, not edge-riding: >1.5x the gate on both sides
    assert min(c for c, _ in matched) > GATE * 3 // 2
    assert max(c for c, _ in mismatched) < GATE * 2 // 3


def test_alignment_query_matches_planted_truth(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans import QUERIES

    rows = QUERIES["multimodal_caption_align"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        planted_mismatch = r.media_id % CAP_MIS_MOD == CAP_MIS_RES
        assert r.aligned == (not planted_mismatch), r
        assert r.na > 0 and r.nb > 0


def test_caption_curation_composition(spark, sf_dir):
    from firefox_public_data_report_etl_spark.plans import QUERIES

    rows = QUERIES["multimodal_caption_curation"](spark, sf_dir).collect()
    by_id = {r.media_id: r for r in rows}
    assert rows
    comps: dict[int, list] = {}
    for r in rows:
        # keep implies aligned; representative is the component min
        if r.keep:
            assert r.aligned
        if r.aligned:
            comps.setdefault(r.component, []).append(r)
        else:
            # dropped rows never claim a keep slot and stay singleton
            assert not r.keep and r.component == r.media_id
    for comp, members in comps.items():
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1
        assert keeps[0].media_id == min(m.media_id for m in members)
        assert comp == min(m.media_id for m in members)
    # planted collapse: an aligned v0/v1 brightness-sibling pair
    # (dHash-invariant) shares a component when both survive the gate
    collapsed = 0
    for r in rows:
        if not r.aligned or r.media_id % NEARDUP_VARIANTS != 0:
            continue
        sib = by_id.get(r.media_id + 1)
        if sib is not None and sib.aligned:
            assert sib.component == r.component
            collapsed += 1
    assert collapsed > 0


def test_sign_dialect_parity(spark):
    # conv/shiftright (Spark) and instr/>> (DuckDB) produce the same
    # ±1 for every (token, dim) — and match the local reference
    import duckdb

    from firefox_public_data_report_etl_spark.functions import (
        md5_sign_spark_sql,
        md5_sign_sql,
    )

    words = ["v0b12", "a", "photo", "of", "v24b31", "zz"]
    arr = ", ".join(f"'{w}'" for w in words)
    duck = duckdb.connect().execute(
        f"SELECT w, d.range AS dm, {md5_sign_sql('w', 'd.range')} AS s"
        f" FROM (SELECT unnest([{arr}]) AS w) CROSS JOIN"
        f" range({CAP_DIM}) d ORDER BY w, dm"
    ).fetchall()
    sp = spark.sql(
        f"SELECT w, dm, {md5_sign_spark_sql('w', 'dm')} AS s"
        f" FROM (SELECT explode(array({arr})) AS w)"
        f" LATERAL VIEW explode(sequence(0, {CAP_DIM - 1})) AS dm"
        f" ORDER BY w, dm"
    ).collect()
    assert [(w, dm, int(s)) for w, dm, s in duck] == [
        (r.w, r.dm, int(r.s)) for r in sp
    ]
    ref = {w: _signs(w) for w in words}
    for w, dm, s in duck:
        assert int(s) == int(ref[w][dm])


def test_sign_dialect_parity_python(spark):
    """The fused Arrow embed's Python sign dialect
    (operators/multimodal._md5_sign_row) matches the Spark SQL
    dialect for every (token, dim) — the pin that lets the fused
    caption vectors replace the Catalyst embed chain bit-for-bit."""
    from firefox_public_data_report_etl_spark.functions import (
        md5_sign_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        _md5_sign_row,
    )

    words = ["v0b12", "a", "photo", "of", "v24b31", "zz", "v9b0"]
    arr = ", ".join(f"'{w}'" for w in words)
    sp = spark.sql(
        f"SELECT w, dm, {md5_sign_spark_sql('w', 'dm')} AS s"
        f" FROM (SELECT explode(array({arr})) AS w)"
        f" LATERAL VIEW explode(sequence(0, {CAP_DIM - 1})) AS dm"
    ).collect()
    for r in sp:
        assert int(r.s) == int(_md5_sign_row(r.w)[r.dm]), (r.w, r.dm)
