"""Perceptual media near-dup (round 9, r8 verdict #1/#2): planted-
sibling recall and negative separation for the image dHash and the
audio onset-anchored energy-delta fingerprint, plus the perceptual
invariances each signature claims (brightness shift for dHash,
whole-frame leading-silence time shift for the audio fingerprint).
The corpus-level pair mining is oracle-checked by
`multimodal_image_neardup` / `multimodal_audio_neardup`; these tests
pin the planted structure the oracle alone cannot distinguish from
coincidence."""

from __future__ import annotations

import numpy as np
import pytest

from firefox_public_data_report_etl_spark.operators.multimodal import (
    NDAUD_FRAME_LEN,
    NDAUD_MAX_HAMMING,
    NDAUD_SHIFT_FRAMES,
    NDAUD_SIG_FRAMES,
    NDIMG_MAX_HAMMING,
    NEARDUP_VARIANTS,
    _ndaud_rule,
    _ndimg_rule_rgb,
    audio_fingerprint,
    decode_bmp24,
    decode_wav16,
    dhash_signature,
    encode_bmp24,
    encode_wav16,
)


def _img_sig(media_id: int) -> int:
    """Signature through the REAL codec round-trip, as the plan does."""
    _, _, rgb = decode_bmp24(encode_bmp24(_ndimg_rule_rgb(media_id)))
    return dhash_signature(rgb)


def _aud_fp(media_id: int):
    _, s = decode_wav16(
        encode_wav16(_ndaud_rule(media_id), 8000, pad_chunk=(media_id % 3 == 0))
    )
    return audio_fingerprint(s)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


N_SRC = 40  # sources exercised per test (160 media ids)


def test_dhash_brightness_invariant():
    # v1 = uniform brightness lift: every horizontal gradient sign is
    # unchanged, so the dHash is IDENTICAL — hamming 0, analytic
    for src in range(N_SRC):
        assert _img_sig(4 * src) == _img_sig(4 * src + 1)


def test_dhash_planted_dots_within_threshold():
    for src in range(N_SRC):
        h = _hamming(_img_sig(4 * src), _img_sig(4 * src + 2))
        assert h <= NDIMG_MAX_HAMMING, (src, h)


def test_dhash_negative_separation():
    # the unrelated-pattern sibling must sit far outside the mining
    # threshold — a margin of 3x guards against slow drift
    for src in range(N_SRC):
        h = _hamming(_img_sig(4 * src), _img_sig(4 * src + 3))
        assert h > 3 * NDIMG_MAX_HAMMING, (src, h)


def test_audio_fp_time_shift_invariant():
    # v1 = whole frames of leading silence: the onset anchor cancels
    # the shift exactly — same fingerprint, onset moved
    for src in range(N_SRC):
        n0, on0, s0 = _aud_fp(4 * src)
        n1, on1, s1 = _aud_fp(4 * src + 1)
        assert s0 == s1
        assert on0 == 0 and on1 == NDAUD_SHIFT_FRAMES
        assert n1 == n0 + NDAUD_SHIFT_FRAMES


def test_audio_fp_dither_within_threshold():
    for src in range(N_SRC):
        h = _hamming(_aud_fp(4 * src)[2], _aud_fp(4 * src + 2)[2])
        assert h <= NDAUD_MAX_HAMMING, (src, h)


def test_audio_fp_negative_separation():
    for src in range(N_SRC):
        h = _hamming(_aud_fp(4 * src)[2], _aud_fp(4 * src + 3)[2])
        assert h > 3 * NDAUD_MAX_HAMMING, (src, h)


def test_audio_fp_too_short_raises():
    with pytest.raises(ValueError):
        audio_fingerprint(
            np.ones(NDAUD_FRAME_LEN * (NDAUD_SIG_FRAMES - 1), dtype=np.int16)
        )
    with pytest.raises(ValueError):
        audio_fingerprint(np.zeros(NDAUD_FRAME_LEN * 70, dtype=np.int16))


def test_banded_mining_finds_every_planted_pair(spark, sf_dir):
    """End-to-end on the smoke corpus: the banded pair mining must
    return EXACTLY the brute-force pair set (hamming_band_pairs is
    exact-recall by the pigeonhole theorem) and every source group's
    3 planted sibling pairs (v0-v1, v0-v2, v1-v2) must be present."""
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_audio_neardup,
        multimodal_image_neardup,
    )
    from firefox_public_data_report_etl_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    n_groups = n_docs // NEARDUP_VARIANTS
    for fn in (multimodal_image_neardup, multimodal_audio_neardup):
        pairs = {
            (r["da"], r["db"]): r["hamming"]
            for r in fn(spark, sf_dir).collect()
        }
        for g in range(n_groups):
            base = NEARDUP_VARIANTS * g
            for a, b in [(0, 1), (0, 2), (1, 2)]:
                assert (base + a, base + b) in pairs, (fn.__name__, g, a, b)
        # no pair may involve the unrelated v3 sibling
        assert not any(
            da % NEARDUP_VARIANTS == 3 or db % NEARDUP_VARIANTS == 3
            for da, db in pairs
        )


def test_video_frame_vote_planted_structure(spark, sf_dir):
    """Clip-level frame vote: per source group, the re-encode sibling
    matches 8/8 aligned frames, the one-frame re-edit 7/8, and the
    unrelated clip (and every cross-group pair) is absent."""
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        NDVID_FRAMES,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_video_neardup,
    )
    from firefox_public_data_report_etl_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    pairs = {
        (r["va"], r["vb"]): r["n_matched"]
        for r in multimodal_video_neardup(spark, sf_dir).collect()
    }
    n_groups = n_docs // NEARDUP_VARIANTS
    assert len(pairs) == 3 * n_groups
    for g in range(n_groups):
        base = NEARDUP_VARIANTS * g
        assert pairs[(base, base + 1)] == NDVID_FRAMES
        assert pairs[(base, base + 2)] == NDVID_FRAMES - 1
        assert pairs[(base + 1, base + 2)] == NDVID_FRAMES - 1


def test_curation_pipeline_stage_interaction(spark, sf_dir):
    """The composed stages must interact as designed: the brightness-
    lifted re-encode sibling dies at the QUALITY stage in every
    group (never wins a dedup cluster), and in size-passing groups
    the source is kept, the dot sibling dedups against it, and the
    unrelated negative survives alone."""
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_curation_pipeline,
    )

    rows = {
        r["media_id"]: (r["stage"], r["component"])
        for r in multimodal_curation_pipeline(spark, sf_dir).collect()
    }
    groups = len(rows) // NEARDUP_VARIANTS
    assert groups > 0
    for g in range(groups):
        base = NEARDUP_VARIANTS * g
        assert rows[base + 1][0] == "quality"  # bright sibling always
        stages = {v: rows[base + v][0] for v in range(4)}
        if stages[0] != "quality":  # size-passing group
            assert stages[0] == "kept"
            assert rows[base + 2] == ("dedup", base)
            assert stages[3] == "kept"
        else:  # size-failing group drops every variant at quality
            assert set(stages.values()) == {"quality"}


def test_audio_curation_stage_interaction(spark, sf_dir):
    """The audio pipeline's planted interaction: the time-shifted
    sibling dies at the leading-silence QUALITY rule in every group,
    the dither sibling dedups against its source, sources and
    unrelated clips are kept."""
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_audio_curation,
    )

    rows = {
        r["media_id"]: (r["stage"], r["component"])
        for r in multimodal_audio_curation(spark, sf_dir).collect()
    }
    groups = len(rows) // NEARDUP_VARIANTS
    assert groups > 0
    for g in range(groups):
        base = NEARDUP_VARIANTS * g
        assert rows[base] == ("kept", base)
        assert rows[base + 1][0] == "quality"
        assert rows[base + 2] == ("dedup", base)
        assert rows[base + 3] == ("kept", base + 3)


def test_image_dedup_keeps_one_per_group(spark, sf_dir):
    """The keep/drop composition: every 4-id source group must keep
    exactly its v0 representative (min id of the sibling cluster)
    plus the unrelated v3 as its own singleton."""
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_image_dedup,
    )
    from firefox_public_data_report_etl_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = {
        r["media_id"]: (r["component"], r["keep"])
        for r in multimodal_image_dedup(spark, sf_dir).collect()
    }
    assert len(rows) == n_docs
    for g in range(n_docs // NEARDUP_VARIANTS):
        base = NEARDUP_VARIANTS * g
        for v in range(3):
            assert rows[base + v] == (base, v == 0)
        assert rows[base + 3] == (base + 3, True)  # singleton negative
