"""Multimodal plumbing: binary payload schema, Arrow-batched decode
stage, unsupported-type behavior."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FakeDecoder,
    attach_payload,
    decode_media,
)
from firefox_public_data_report_etl_spark.sources import load_table


def test_attach_payload_schema(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["n_bytes"] == "bigint"
    row = media.first()
    assert row["n_bytes"] == len(row["payload"])


def test_decode_media_deterministic(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    out = decode_media(media)
    assert out.schema == DECODED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == media.count()
    # spot-check against the driver-side stub on one payload
    sample = media.first()
    w, h, cks = FakeDecoder().decode(bytes(sample["payload"]), "image/fake")
    got = rows[sample["media_id"]]
    assert (got["width"], got["height"], got["checksum"]) == (w, h, cks)
    # dimensions stay in the fake decoder's documented range
    assert all(64 <= r["width"] < 192 for r in rows.values())


def test_decoder_unsupported_type_raises():
    with pytest.raises(NotImplementedError):
        FakeDecoder().decode(b"xx", "video/mp4")


def test_resize_plan_integer_exact(spark):
    from firefox_public_data_report_etl_spark.operators.multimodal import resize_plan

    decoded = spark.createDataFrame(
        [(1, 190, 80), (2, 96, 96), (3, 50, 100), (4, 64, 64)],
        "media_id long, width int, height int",
    )
    out = {r["media_id"]: r for r in resize_plan(decoded, max_dim=96).collect()}
    # 190x80 -> longest 190 caps to 96: w=190*96//190=96, h=80*96//190=40
    assert (out[1]["target_width"], out[1]["target_height"]) == (96, 40)
    assert out[1]["needs_resize"] is True
    # exactly at the cap: untouched
    assert (out[2]["target_width"], out[2]["target_height"]) == (96, 96)
    assert out[2]["needs_resize"] is False
    # portrait: 50x100 -> w=50*96//100=48, h=96
    assert (out[3]["target_width"], out[3]["target_height"]) == (48, 96)
    assert (out[4]["target_width"], out[4]["target_height"]) == (64, 64)


def test_frame_sample_plan_spacing_and_empty(spark):
    from firefox_public_data_report_etl_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        # 2048 bytes -> 8 frames; 300 -> 2 frames; 0 -> 0 frames (dropped)
        [(1, 2048), (2, 300), (3, 0)],
        "media_id long, n_bytes long",
    )
    out = frame_sample_plan(media, n_samples=4).collect()
    by_id: dict[int, list[int]] = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    assert sorted(by_id[1]) == [0, 2, 4, 6]  # evenly spaced over 8 frames
    assert sorted(by_id[2]) == [0, 1]  # fewer frames than samples: every frame
    assert 3 not in by_id  # zero-frame media emits no rows


def test_resize_nearest_identity_and_downsample():
    import numpy as np

    from firefox_public_data_report_etl_spark.operators.multimodal import (
        resize_nearest,
    )

    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    # identity when target == source
    assert np.array_equal(resize_nearest(rgb, 6, 4), rgb)
    # 2x downsample picks every other pixel starting at index 0
    half = resize_nearest(rgb, 3, 2)
    assert np.array_equal(half, rgb[::2, ::2])
    # degenerate 1x1 keeps the top-left source pixel
    one = resize_nearest(rgb, 1, 1)
    assert one.shape == (1, 1, 3) and np.array_equal(one[0, 0], rgb[0, 0])


def test_resize_targets_match_resize_plan(spark):
    """The fused Arrow-stage target-dimension math must agree with
    the Catalyst resize_plan rule row-for-row (same inputs, no
    join)."""
    from pyspark.sql import Row

    from firefox_public_data_report_etl_spark.operators.multimodal import (
        attach_bmp_payload,
        decode_bmp_stats,
        resize_bmp_stats,
        resize_plan,
    )
    from firefox_public_data_report_etl_spark.plans.text import RESIZE_MAX_DIM

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(60)])
    media = attach_bmp_payload(docs)
    planned = resize_plan(
        decode_bmp_stats(media).select("media_id", "width", "height"),
        max_dim=RESIZE_MAX_DIM,
    ).select("media_id", "target_width", "target_height")
    executed = resize_bmp_stats(media, RESIZE_MAX_DIM).select(
        "media_id", "width", "height"
    )
    j = planned.join(executed, "media_id").toPandas()
    assert len(j) == 60
    assert (j.target_width == j.width).all()
    assert (j.target_height == j.height).all()
    # the 1-px floor binds at these dims (e.g. w=8,h=1,max=4): no
    # zero-dimension targets anywhere
    assert (j.width >= 1).all() and (j.height >= 1).all()


def test_scene_cuts_exactly_at_scene_boundary(spark, sf_dir):
    """The frame rule plants exactly one scene boundary (frame 4 of 8
    at SCENE_LEN=4): is_cut must be TRUE there and FALSE everywhere
    else, for every video — pins both the codec round-trip and the
    lag-window cut logic."""
    from firefox_public_data_report_etl_spark.plans.text import (
        multimodal_scene_cuts,
    )

    rows = multimodal_scene_cuts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.is_cut == (r.frame_idx == 4), (r.video_id, r.frame_idx)


def test_binary_file_source_feeds_decode_stage(spark, tmp_path):
    """The production media path: real BMP files on disk, read via
    Spark's binaryFile source, decoded by the UNCHANGED decode stage —
    per-channel stats must equal the in-stage synthesized path for the
    same media ids (same pixel rule, different transport)."""
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        _bmp_rule_rgb,
        attach_bmp_payload,
        decode_bmp_stats,
        encode_bmp24,
    )
    from firefox_public_data_report_etl_spark.sources.binary_media import (
        load_media_dir,
    )

    ids = list(range(3, 23))
    for mid in ids:
        (tmp_path / f"{mid}.bmp").write_bytes(
            encode_bmp24(_bmp_rule_rgb(mid))
        )
    from_files = {
        r.media_id: tuple(r)[1:]
        for r in decode_bmp_stats(
            load_media_dir(spark, str(tmp_path), "bmp")
        ).collect()
    }
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    synthesized = {
        r.media_id: tuple(r)[1:]
        for r in decode_bmp_stats(attach_bmp_payload(docs)).collect()
    }
    assert from_files == synthesized and set(from_files) == set(ids)


def test_binary_media_source_rejects_unknown_ext(spark):
    import pytest

    from firefox_public_data_report_etl_spark.sources.binary_media import (
        load_media_dir,
    )

    with pytest.raises(ValueError, match="unknown media extension"):
        load_media_dir(spark, "/tmp", "gif")
