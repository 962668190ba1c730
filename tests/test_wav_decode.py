"""RIFF/WAVE PCM16 codec spec conformance (operators/multimodal.py,
round 8): hand-laid-out byte fixtures pin the chunk walker (unknown
chunks skipped via their declared size, ODD chunk sizes padded to a
word boundary, fmt-before-data ordering) and the little-endian
signed-int16 sample layout — the chunked-container layout class
neither image codec exercises. The corpus-level decode is
oracle-checked by `multimodal_wav_decode`; these tests pin the
physical format."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from firefox_public_data_report_etl_spark.operators.multimodal import (
    decode_wav16,
    encode_wav16,
)


def _fmt_chunk(fmt=1, ch=1, rate=8000, bits=16) -> bytes:
    return struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, fmt, ch, rate, rate * ch * bits // 8,
        ch * bits // 8, bits
    )


def _riff(body: bytes) -> bytes:
    return struct.pack("<4sI", b"RIFF", len(body) + 4) + b"WAVE" + body


def test_decode_hand_built_spec_example() -> None:
    # two samples: +1 and -2, little-endian int16
    data = struct.pack("<4sI", b"data", 4) + struct.pack("<hh", 1, -2)
    rate, s = decode_wav16(_riff(_fmt_chunk() + data))
    assert rate == 8000
    assert s.tolist() == [1, -2]


def test_unknown_chunk_is_skipped_by_declared_size() -> None:
    junk = struct.pack("<4sI", b"LIST", 4) + b"abcd"
    data = struct.pack("<4sI", b"data", 2) + struct.pack("<h", -32768)
    rate, s = decode_wav16(_riff(_fmt_chunk() + junk + data))
    assert s.tolist() == [-32768]


def test_odd_sized_chunk_consumes_pad_byte() -> None:
    # 5-byte junk payload -> one pad byte before the next chunk; a
    # walker that forgets the pad lands mid-stream and fails
    junk = struct.pack("<4sI", b"LIST", 5) + b"abcde" + b"\x00"
    data = struct.pack("<4sI", b"data", 2) + struct.pack("<h", 7)
    rate, s = decode_wav16(_riff(_fmt_chunk() + junk + data))
    assert s.tolist() == [7]


def test_samples_are_little_endian_signed() -> None:
    # 0x0080 LE = 128; 0xFF7F LE = 32767; 0x0080 BE would be -32768
    data = struct.pack("<4sI", b"data", 4) + bytes([0x80, 0x00, 0xFF, 0x7F])
    _, s = decode_wav16(_riff(_fmt_chunk() + data))
    assert s.tolist() == [128, 32767]


def test_encoder_matches_hand_layout() -> None:
    payload = encode_wav16(np.array([1, -2], dtype=np.int16), 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    # fmt chunk immediately after WAVE: PCM, mono, 16-bit, 8 kHz
    assert payload[12:16] == b"fmt "
    assert struct.unpack_from("<HHI", payload, 20) == (1, 1, 8000)
    assert payload[36:40] == b"data"
    assert payload[44:48] == struct.pack("<hh", 1, -2)


@pytest.mark.parametrize("n", [1, 2, 101, 150])
def test_roundtrip_exact(n) -> None:
    s = ((np.arange(n, dtype=np.int64) * 7919 + 13) % 65536 - 32768).astype(
        np.int16
    )
    for pad in (False, True):
        rate, out = decode_wav16(encode_wav16(s, 44100, pad_chunk=pad))
        assert rate == 44100
        assert np.array_equal(out, s)


def test_unsupported_variants_raise() -> None:
    data = struct.pack("<4sI", b"data", 2) + struct.pack("<h", 0)
    with pytest.raises(NotImplementedError):  # stereo
        decode_wav16(_riff(_fmt_chunk(ch=2) + data))
    with pytest.raises(NotImplementedError):  # 8-bit
        decode_wav16(_riff(_fmt_chunk(bits=8) + data))
    with pytest.raises(NotImplementedError):  # IEEE-float encoding
        decode_wav16(_riff(_fmt_chunk(fmt=3) + data))
    with pytest.raises(ValueError):  # not RIFF at all
        decode_wav16(b"OggS" + bytes(40))
    with pytest.raises(ValueError):  # RIFF but no data chunk
        decode_wav16(_riff(_fmt_chunk()))


# --- nearest-neighbor rate conversion (round 10) --------------------


def test_resample_identity() -> None:
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        resample_nearest,
    )

    s = np.arange(-5, 95, dtype=np.int16)
    out = resample_nearest(s, 16000, 16000)
    assert out.tolist() == s.tolist()


def test_resample_2to1_downsample_takes_even_samples() -> None:
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        resample_nearest,
    )

    s = np.arange(100, dtype=np.int16)
    out = resample_nearest(s, 16000, 8000)
    assert out.tolist() == s[::2].tolist()


def test_resample_1to2_upsample_repeats_each_sample() -> None:
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        resample_nearest,
    )

    s = np.array([3, -7, 11], dtype=np.int16)
    out = resample_nearest(s, 8000, 16000)
    assert out.tolist() == [3, 3, -7, -7, 11, 11]


def test_resample_3to2_ratio() -> None:
    """12000 -> 8000 Hz (3:2 down): out[j] = s[(3*j) div 2], so the
    index walk is 0, 1, 3, 4, 6, 7, ... (every third sample merged
    away)."""
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        resample_nearest,
    )

    s = np.arange(9, dtype=np.int16)
    out = resample_nearest(s, 12000, 8000)
    assert out.tolist() == [0, 1, 3, 4, 6, 7]


def test_fingerprint_invariant_under_integer_upsample() -> None:
    """An exact-integer nearest upsample repeats each sample r times;
    with the frame length scaled by r, every frame energy scales by
    exactly r, so energy-delta SIGNS — hence the onset frame and the
    whole fingerprint — are unchanged. This is the property that
    makes rate normalization safe to run before fingerprinting."""
    from firefox_public_data_report_etl_spark.operators.multimodal import (
        NDAUD_FRAME_LEN,
        _ndaud_rule,
        audio_fingerprint,
        resample_nearest,
    )

    for mid in (0, 1, 2, 5, 41, 1002):
        s = _ndaud_rule(mid)
        base = audio_fingerprint(s)
        for r in (2, 3):
            up = resample_nearest(s, 8000, 8000 * r)
            got = audio_fingerprint(up, frame_len=NDAUD_FRAME_LEN * r)
            assert got == base, (mid, r)
