"""Real BMP decode (operators/multimodal.py round-7): conformance is
pinned against HAND-LAID-OUT bytes from the public format spec, not
just against the sibling encoder — so encoder and decoder can't agree
on a shared mistake."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from firefox_public_data_report_etl_spark.operators.multimodal import (
    decode_bmp24,
    encode_bmp24,
)


def _hand_built_2x2() -> bytes:
    """The classic 2x2 example laid out by hand per the spec:
    top-left red, top-right white, bottom-left blue, bottom-right
    green. Physical file: bottom-up row order, BGR channel order,
    rows padded to 4 bytes (2 px * 3 B = 6 -> pad 2)."""
    header = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0
    )
    bottom_row = bytes([0xFF, 0x00, 0x00, 0x00, 0xFF, 0x00, 0, 0])  # blue, green
    top_row = bytes([0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0, 0])     # red, white
    return header + dib + bottom_row + top_row


def test_decode_hand_built_spec_example() -> None:
    w, h, rgb = decode_bmp24(_hand_built_2x2())
    assert (w, h) == (2, 2)
    want = np.array(
        [
            [[255, 0, 0], [255, 255, 255]],  # top row: red, white
            [[0, 0, 255], [0, 255, 0]],      # bottom row: blue, green
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(rgb, want)


def test_encoder_matches_hand_layout() -> None:
    rgb = np.array(
        [
            [[255, 0, 0], [255, 255, 255]],
            [[0, 0, 255], [0, 255, 0]],
        ],
        dtype=np.uint8,
    )
    assert encode_bmp24(rgb) == _hand_built_2x2()


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (4, 1), (5, 7), (13, 7)])
def test_roundtrip_exact_across_padding_widths(w, h) -> None:
    # widths cover every row-padding residue (3w % 4 in {0,1,2,3})
    rng = np.random.default_rng(w * 100 + h)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got_w, got_h, got = decode_bmp24(encode_bmp24(rgb))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, rgb)


def test_top_down_negative_height_layout() -> None:
    # top-down BMP: negative height, first stored row is the TOP row
    header = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 16, 2835, 2835, 0, 0
    )
    top_row = bytes([0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0, 0])     # red, white
    bottom_row = bytes([0xFF, 0x00, 0x00, 0x00, 0xFF, 0x00, 0, 0])  # blue, green
    w, h, rgb = decode_bmp24(header + dib + top_row + bottom_row)
    assert (w, h) == (2, 2)
    assert np.array_equal(
        rgb,
        np.array(
            [
                [[255, 0, 0], [255, 255, 255]],
                [[0, 0, 255], [0, 255, 0]],
            ],
            dtype=np.uint8,
        ),
    )


def test_unsupported_variants_raise() -> None:
    payload = bytearray(_hand_built_2x2())
    payload[28] = 8  # bpp = 8
    with pytest.raises(NotImplementedError):
        decode_bmp24(bytes(payload))
    payload = bytearray(_hand_built_2x2())
    payload[30] = 1  # BI_RLE8 compression
    with pytest.raises(NotImplementedError):
        decode_bmp24(bytes(payload))
    with pytest.raises(ValueError):
        decode_bmp24(b"PNG....")
