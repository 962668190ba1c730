"""Binary PPM (P6) codec spec conformance (operators/multimodal.py,
round 8): hand-laid-out byte fixtures pin the header tokenizer
(whitespace forms, '#' comments, the single post-maxval whitespace)
and the top-down unpadded raster layout — the complementary layout
choices to BMP, so a shared layout bug between the two decoders is
structurally impossible. The corpus-level decode is oracle-checked
by `multimodal_ppm_decode`; these tests pin the physical format."""

from __future__ import annotations

import numpy as np
import pytest

from firefox_public_data_report_etl_spark.operators.multimodal import (
    decode_ppm,
    encode_ppm,
)


def test_decode_hand_built_spec_example() -> None:
    # 2x2 image, distinct channel values per pixel, top-down RGB
    raster = bytes(
        [
            10, 20, 30,    40, 50, 60,     # row 0: (0,0) (1,0)
            70, 80, 90,    100, 110, 120,  # row 1: (0,1) (1,1)
        ]
    )
    payload = b"P6\n2 2\n255\n" + raster
    w, h, rgb = decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert rgb[0, 0].tolist() == [10, 20, 30]
    assert rgb[0, 1].tolist() == [40, 50, 60]
    assert rgb[1, 0].tolist() == [70, 80, 90]
    assert rgb[1, 1].tolist() == [100, 110, 120]


def test_header_whitespace_and_comment_forms() -> None:
    raster = bytes([1, 2, 3])
    # spec allows arbitrary whitespace between tokens and '#'
    # comments through end of line anywhere in the header
    for header in (
        b"P6 1 1 255 ",
        b"P6\t1\r\n1\n255\n",
        b"P6\n# a comment\n1 1\n# another\n255\n",
        b"P6\n1 # trailing comment\n1 255\n",
    ):
        w, h, rgb = decode_ppm(header + raster)
        assert (w, h) == (1, 1) and rgb[0, 0].tolist() == [1, 2, 3], header


def test_raster_starts_after_exactly_one_whitespace() -> None:
    # a raster whose first byte is 0x0A (newline) must NOT be eaten
    # by header parsing: only ONE whitespace byte follows maxval
    raster = bytes([10, 10, 10])
    w, h, rgb = decode_ppm(b"P6\n1 1\n255\n" + raster)
    assert rgb[0, 0].tolist() == [10, 10, 10]


def test_encoder_matches_hand_layout() -> None:
    rgb = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    assert encode_ppm(rgb) == b"P6\n2 2\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 7), (13, 1)])
def test_roundtrip_exact(w, h) -> None:
    rng = np.random.default_rng(w * 100 + h)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    w2, h2, back = decode_ppm(encode_ppm(rgb))
    assert (w2, h2) == (w, h)
    assert np.array_equal(back, rgb)


def test_unsupported_variants_raise() -> None:
    with pytest.raises(NotImplementedError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")  # ASCII variant
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))
