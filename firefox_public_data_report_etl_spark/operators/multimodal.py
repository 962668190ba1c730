"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize run as Arrow-batched
``mapInPandas`` stages. The decode itself is STUBBED (no image/audio
libs in this container) behind ``FakeDecoder`` — a deterministic
stand-in with the real batch shape — while the Spark-side plumbing
(schema, batching, partitioning, UDF signature) is real and tested.

Scale notes: ``mapInPandas`` streams Arrow record batches, so memory
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of blob size; repartition upstream by a content-hash bucket
for even decode load; never collect blobs to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Builds a media table from a text table: payload = utf-8 bytes
    (the opaque-binary stand-in), typed metadata columns alongside."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )


class FakeDecoder:
    """Deterministic stand-in for an image decoder.

    A real deployment replaces ``decode`` with e.g. PIL/libvips; the
    surrounding Spark plumbing does not change. Raises
    ``NotImplementedError`` for media types it does not fake.
    """

    def decode(self, payload: bytes, media_type: str) -> tuple[int, int, int]:
        if media_type != "image/fake":
            raise NotImplementedError(f"no decoder for {media_type}")
        n = len(payload)
        checksum = 0
        for b in payload:
            checksum = (checksum * 31 + b) % 1_000_000_007
        # fake dimensions derived deterministically from content
        return (64 + checksum % 128, 64 + (checksum // 128) % 128, checksum)


def resize_plan(decoded: DataFrame, max_dim: int = 96, keep: tuple = ()) -> DataFrame:
    """Resize planning over decoded media: integer-exact target
    dimensions capped at ``max_dim`` on the longest side (aspect
    preserved via integer scaling, floored at 1 px so extreme aspect
    ratios can't plan a zero-dimension target — no FP, so the stage
    is oracle-exact). The actual pixel resample runs inside the
    decode mapInPandas stage (resize_bmp_stats); THIS plan (which
    rows resize, to what) is the distributed decision the pipeline
    schedules on."""
    longest = F.greatest(F.col("width"), F.col("height"))
    needs = longest > max_dim
    return decoded.select(
        "media_id",
        *keep,
        "width",
        "height",
        needs.alias("needs_resize"),
        F.when(
            needs,
            F.expr(
                f"greatest(1L, cast(width * {max_dim} as long)"
                " div greatest(width, height))"
            ),
        )
        .otherwise(F.col("width").cast("long"))
        .alias("target_width"),
        F.when(
            needs,
            F.expr(
                f"greatest(1L, cast(height * {max_dim} as long)"
                " div greatest(width, height))"
            ),
        )
        .otherwise(F.col("height").cast("long"))
        .alias("target_height"),
    )


def frame_sample_plan(media: DataFrame, n_samples: int = 4) -> DataFrame:
    """Frame-sampling plan for video-like payloads: the payload's
    chunk count stands in for the frame count (256-byte fake frames);
    emit ``n_samples`` evenly-spaced frame indices per media row as an
    explode — one output row per (media, frame) ready for a decode
    stage. Media with fewer frames than ``n_samples`` emit every
    frame once."""
    frames = F.expr("(n_bytes + 255) div 256")
    idx = F.explode(
        F.when(
            frames >= n_samples,
            F.expr(
                f"transform(sequence(0, {n_samples - 1}),"
                f" k -> k * ((n_bytes + 255) div 256) div {n_samples})"
            ),
        )
        .when(frames > 0, F.expr("sequence(0, ((n_bytes + 255) div 256) - 1)"))
        .otherwise(F.expr("cast(array() as array<bigint>)"))
    )
    return media.select("media_id", frames.alias("n_frames"), idx.alias("frame_index"))


def decode_media(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """The mapInPandas decode stage: binary payloads → typed features.

    Arrow-batched; one python worker call per record batch, vectorized
    over the batch (the loop below is per-row over an in-memory batch,
    not per-row over Spark).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = FakeDecoder()
        for pdf in batches:
            rows = []
            for mid, payload, mtype, nbytes in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"], pdf["n_bytes"]
            ):
                w, h, cks = dec.decode(bytes(payload), mtype)
                rows.append((mid, mtype, nbytes, w, h, cks))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "checksum",
                ],
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Real format decode (round-7): 24-bit uncompressed BMP — a public,
# trivially-specified format (BITMAPFILEHEADER + BITMAPINFOHEADER +
# bottom-up BGR rows padded to 4 bytes), decodable in pure
# Python/numpy with no image libraries. This upgrades the multimodal
# column from shape-only (FakeDecoder) to a genuine decode whose
# pixel statistics are oracle-checked: the payload generator writes
# REAL spec-conformant BMP bytes, the decoder independently parses
# the header and physical layout (bottom-up row order, BGR channel
# order, row padding), and the DuckDB twin recomputes the statistics
# from the logical pixel rule — a decoder that mishandles padding,
# row order, or channel order fails the value hash.
# ---------------------------------------------------------------------------

BMP_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("min_r", IntegerType()),
        StructField("max_r", IntegerType()),
        StructField("min_g", IntegerType()),
        StructField("max_g", IntegerType()),
        StructField("min_b", IntegerType()),
        StructField("max_b", IntegerType()),
    ]
)


def encode_bmp24(rgb) -> bytes:
    """RGB uint8 array (H, W, 3), row-major top-down → spec-conformant
    24-bit uncompressed BMP bytes (54-byte header, bottom-up BGR rows,
    each row padded to a 4-byte boundary)."""
    import struct

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    row_pad = (4 - (w * 3) % 4) % 4
    row_size = w * 3 + row_pad
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + dib + rows.tobytes()


def decode_bmp24(payload: bytes):
    """Parse a 24-bit uncompressed BMP: returns (width, height, rgb)
    with rgb a (H, W, 3) uint8 array, row-major top-down, RGB channel
    order. Handles both bottom-up (positive height — the normal case)
    and top-down (negative height) layouts and the per-row 4-byte
    padding. Raises ``NotImplementedError`` for other bit depths or
    compressed variants — the honest boundary of this decoder."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    row_pad = (4 - (width * 3) % 4) % 4
    row_size = width * 3 + row_pad
    arr = np.frombuffer(
        payload, dtype=np.uint8, offset=data_offset, count=row_size * h
    )
    arr = arr.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        arr = arr[::-1]
    return width, h, arr[:, :, ::-1]  # BGR -> RGB


# Deterministic logical pixel rule for the synthesized corpus images
# (the testdata carries no real blobs): RGB value of flat pixel k,
# channel c is (media_id*7 + k*33 + c*11) % 256. The oracle recomputes
# channel statistics from THIS rule; the payload in between is real
# BMP bytes, so the decode is pinned against the physical format.
BMP_W_MOD, BMP_H_MOD = 13, 7


def _bmp_rule_rgb(media_id: int):
    import numpy as np

    w = 1 + media_id % BMP_W_MOD
    h = 1 + media_id % BMP_H_MOD
    k = np.arange(w * h, dtype=np.int64).reshape(h, w)
    c = np.arange(3, dtype=np.int64)
    vals = (media_id * 7 + k[..., None] * 33 + c * 11) % 256
    return vals.astype(np.uint8)


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL 24-bit BMP payload per row (Arrow-batched;
    dimensions and pixels follow the deterministic rule above) —
    the binary-column source for the real-decode pipeline."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                payload = encode_bmp24(_bmp_rule_rgb(int(mid)))
                out.append((int(mid), payload, "image/bmp", len(payload)))
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "media_type", "n_bytes"]
            )

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def decode_bmp_stats(media: DataFrame) -> DataFrame:
    """mapInPandas real-decode stage: parse each BMP payload and emit
    exact per-channel pixel statistics (integer sums + extrema — no
    FP, so the stage is oracle-exact). Arrow-batched like
    ``decode_media``; raises for non-BMP media types rather than
    guessing."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                w, h, rgb = decode_bmp24(bytes(payload))
                flat = rgb.reshape(-1, 3).astype("int64")
                rows.append(
                    (
                        int(mid), w, h, w * h,
                        int(flat[:, 0].sum()), int(flat[:, 1].sum()),
                        int(flat[:, 2].sum()),
                        int(flat[:, 0].min()), int(flat[:, 0].max()),
                        int(flat[:, 1].min()), int(flat[:, 1].max()),
                        int(flat[:, 2].min()), int(flat[:, 2].max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_STATS_SCHEMA])

    return media.mapInPandas(_decode, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Video temporal analytics: per-"video" frame sequences through the
# REAL BMP codec (encode → decode round-trip per frame), then
# scene-cut detection on the decoded per-frame statistics. The frame
# rule is NON-WRAPPING by construction (base pattern mod 200, plus a
# scene term ≤ 40 and an in-scene tick ≤ 3, so every value stays
# ≤ 242 < 256): each pixel-channel advances by exactly +1 per frame
# within a scene and by +(SCENE_JUMP − SCENE_LEN + 1) across a scene
# boundary — consecutive-frame sum deltas are exactly n_px·3 within
# scenes and 37·n_px·3 at cuts, all integer, all recomputable by the
# oracle from the logical rule without seeing a byte. (A mod-256
# wrapping rule would make sum deltas average to ~0 — uninformative.)
# ---------------------------------------------------------------------------

SCENE_LEN = 4
SCENE_JUMP = 40
N_FRAMES = 8  # scenes ∈ {0, 1}: max value 199 + 40 + 3 = 242 < 256

FRAME_SUM_SCHEMA = StructType(
    [
        StructField("video_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_rgb", LongType()),
    ]
)


def _frame_rule_rgb(video_id: int, frame_idx: int):
    import numpy as np

    w = 1 + video_id % BMP_W_MOD
    h = 1 + video_id % BMP_H_MOD
    scene = frame_idx // SCENE_LEN
    k = np.arange(w * h, dtype=np.int64).reshape(h, w)
    c = np.arange(3, dtype=np.int64)
    vals = (
        (video_id * 7 + k[..., None] * 33 + c * 11) % 200
        + scene * SCENE_JUMP
        + frame_idx % SCENE_LEN
    )
    return vals.astype(np.uint8)


def decode_frame_sums(frames: DataFrame) -> DataFrame:
    """(video_id, frame_idx) → per-frame decoded pixel totals, through
    the REAL BMP codec: each frame is encoded to spec bytes
    (encode_bmp24) and parsed back by the independent decoder
    (decode_bmp24) inside ONE Arrow-batched mapInPandas stage —
    pixels never leave the stage; the output is 5 ints per frame.
    At 100 TB the same stage reads frame payloads from object storage
    instead of synthesizing them."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, fi in zip(pdf["video_id"], pdf["frame_idx"]):
                payload = encode_bmp24(_frame_rule_rgb(int(vid), int(fi)))
                w, h, rgb = decode_bmp24(payload)
                rows.append(
                    (
                        int(vid),
                        int(fi),
                        w,
                        h,
                        int(rgb.astype("int64").sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SUM_SCHEMA]
            )

    return frames.mapInPandas(_run, FRAME_SUM_SCHEMA)


# ---------------------------------------------------------------------------
# Second real format (round-8, r7 verdict #6): binary PPM (P6) — the
# netpbm true-color format: an ASCII header ("P6", width, height,
# maxval as whitespace-separated tokens, '#' comments allowed) then
# raw RGB bytes, TOP-DOWN rows, NO padding. Deliberately the
# complementary layout to BMP (text header vs packed structs,
# top-down vs bottom-up, RGB vs BGR, unpadded vs 4-byte-padded rows)
# so the two decoders cannot share a layout bug. Same oracle
# strategy: payloads are real spec bytes, the oracle recomputes the
# statistics from the logical pixel rule and never sees the bytes.
# ---------------------------------------------------------------------------


def encode_ppm(rgb) -> bytes:
    """RGB uint8 array (H, W, 3), row-major top-down → binary PPM
    (P6, maxval 255): ASCII header then unpadded RGB rows."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + rgb.tobytes()


def decode_ppm(payload: bytes):
    """Parse a binary PPM (P6): returns (width, height, rgb) with rgb
    a (H, W, 3) uint8 array, top-down RGB — the header tokenizer
    accepts any whitespace between tokens and '#' comments (the spec
    allows both; a fixture test pins it). Raises
    ``NotImplementedError`` for other magic numbers or maxval > 255
    (2-byte samples) — the honest boundary of this decoder."""
    import numpy as np

    if payload[:2] != b"P6":
        raise NotImplementedError(
            f"only binary PPM (P6) supported, got magic {payload[:2]!r}"
        )
    # tokenize header: after the magic, the next 3 whitespace-
    # separated tokens (skipping '#'-to-end-of-line comments) are
    # width, height, maxval; exactly ONE whitespace byte follows
    # maxval before the raster (per spec)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b"\r", b""):
                pos += 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError(
            f"2-byte-per-sample PPM not supported (maxval={maxval})"
        )
    arr = np.frombuffer(
        payload, dtype=np.uint8, offset=pos, count=width * height * 3
    )
    return width, height, arr.reshape(height, width, 3)


# Logical pixel rule for the synthesized PPM corpus — a DIFFERENT
# rule family than BMP's so the two oracles cannot mask each other:
# channel c of flat pixel k is (media_id*5 + k*29 + c*13) % 256.
PPM_W_MOD, PPM_H_MOD = 11, 5


def _ppm_rule_rgb(media_id: int):
    import numpy as np

    w = 1 + media_id % PPM_W_MOD
    h = 1 + media_id % PPM_H_MOD
    k = np.arange(w * h, dtype=np.int64).reshape(h, w)
    c = np.arange(3, dtype=np.int64)
    vals = (media_id * 5 + k[..., None] * 29 + c * 13) % 256
    return vals.astype(np.uint8)


def attach_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL binary PPM payload per row (Arrow-batched,
    deterministic rule above)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                payload = encode_ppm(_ppm_rule_rgb(int(mid)))
                out.append((int(mid), payload, "image/x-portable-pixmap",
                            len(payload)))
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "media_type", "n_bytes"]
            )

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def decode_ppm_stats(media: DataFrame) -> DataFrame:
    """mapInPandas real-decode stage for PPM — same exact-integer
    channel statistics contract as ``decode_bmp_stats``."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/x-portable-pixmap":
                    raise NotImplementedError(f"no decoder for {mtype}")
                w, h, rgb = decode_ppm(bytes(payload))
                flat = rgb.reshape(-1, 3).astype("int64")
                rows.append(
                    (
                        int(mid), w, h, w * h,
                        int(flat[:, 0].sum()), int(flat[:, 1].sum()),
                        int(flat[:, 2].sum()),
                        int(flat[:, 0].min()), int(flat[:, 0].max()),
                        int(flat[:, 1].min()), int(flat[:, 1].max()),
                        int(flat[:, 2].min()), int(flat[:, 2].max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_STATS_SCHEMA])

    return media.mapInPandas(_decode, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Third real format, third MODALITY: WAV (RIFF) PCM — canonical
# uncompressed audio. Chunked container (RIFF size header, then
# "fmt "/"data" chunks that may be preceded or separated by other
# chunks, each word-aligned), little-endian int16 samples — a layout
# class neither image codec exercises. Same oracle strategy as
# BMP/PPM: payloads are real spec bytes; the oracle recomputes the
# sample statistics from the logical sample rule and never sees the
# bytes, so a decoder that misparses chunk walking, alignment, or
# sample signedness hash-mismatches.
# ---------------------------------------------------------------------------

WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("s_sum", LongType()),
        StructField("s_min", LongType()),
        StructField("s_max", LongType()),
        StructField("energy", LongType()),
        StructField("zero_cross", LongType()),
    ]
)


def encode_wav16(samples, sample_rate: int, pad_chunk: bool = False) -> bytes:
    """int16 mono samples → spec-conformant RIFF/WAVE bytes (PCM
    format chunk + data chunk; with ``pad_chunk`` a junk "LIST"
    chunk — with an ODD payload size, so its word-alignment pad byte
    is exercised — is inserted between "fmt " and "data", which a
    compliant reader must skip by walking chunk sizes)."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    junk = b""
    if pad_chunk:
        payload = b"junk!"  # odd length -> needs a pad byte
        junk = struct.pack("<4sI", b"LIST", len(payload)) + payload + b"\x00"
    body = b"WAVE" + fmt + junk + struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav16(payload: bytes):
    """Parse RIFF/WAVE PCM: returns (sample_rate, samples int16
    ndarray). Walks the chunk list (skipping unknown chunks and
    their word-alignment padding) to find "fmt " and "data". Raises
    ``NotImplementedError`` for non-PCM encodings, multi-channel, or
    bit depths other than 16 — the honest boundary of this decoder."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    sample_rate, bits, channels, audio_fmt = None, None, None, None
    samples = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, body
            )
            bits = struct.unpack_from("<H", payload, body + 14)[0]
        elif cid == b"data":
            if audio_fmt is None:
                raise ValueError("data chunk before fmt chunk")
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM mono 16-bit supported (fmt={audio_fmt}, "
                    f"channels={channels}, bits={bits})"
                )
            samples = np.frombuffer(payload, dtype="<i2", offset=body, count=size // 2)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if samples is None:
        raise ValueError("no data chunk found")
    return sample_rate, samples


# Deterministic logical sample rule for the synthesized corpus audio:
# sample k of media_id is ((media_id*31 + k*17) % 65536) - 32768;
# n_samples = 50 + media_id % 101; sample_rate = 8000 + 4000*(media_id % 3).
# The oracle recomputes the statistics from THIS rule; the payload in
# between is real RIFF bytes (every third clip carries the junk-chunk
# variant so chunk walking is exercised in the corpus, not just in
# fixtures).
def _wav_rule(media_id: int):
    import numpy as np

    n = 50 + media_id % 101
    rate = 8000 + 4000 * (media_id % 3)
    k = np.arange(n, dtype=np.int64)
    s = ((media_id * 31 + k * 17) % 65536) - 32768
    return rate, s.astype(np.int16)


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL RIFF/WAVE PCM16 payload per row (Arrow-
    batched; samples follow the deterministic rule above) — the
    binary-column source for the audio-decode pipeline."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                rate, s = _wav_rule(mid)
                payload = encode_wav16(s, rate, pad_chunk=(mid % 3 == 0))
                out.append((mid, payload, "audio/wav", len(payload)))
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "media_type", "n_bytes"]
            )

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def decode_wav_stats(media: DataFrame) -> DataFrame:
    """mapInPandas real-decode stage: parse each WAV payload and emit
    exact integer sample statistics — count, rate, sum, extrema,
    energy (Σ s², exact in int64), and the zero-crossing count
    (sign(s_k) ≠ sign(s_{k−1}) with sign ≔ s ≥ 0), the classic cheap
    audio feature. No FP anywhere, so the stage is oracle-exact."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "audio/wav":
                    raise NotImplementedError(f"no decoder for {mtype}")
                rate, s = decode_wav16(bytes(payload))
                s64 = s.astype(np.int64)
                nonneg = s64 >= 0
                rows.append(
                    (
                        int(mid), len(s64), int(rate),
                        int(s64.sum()), int(s64.min()), int(s64.max()),
                        int((s64 * s64).sum()),
                        int((nonneg[1:] != nonneg[:-1]).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_STATS_SCHEMA])

    return media.mapInPandas(_decode, WAV_STATS_SCHEMA)


def resample_nearest(samples, src_rate: int, target_rate: int):
    """Nearest-neighbor rate conversion of an int16 clip — the audio
    twin of ``resize_nearest``: output sample j takes source sample
    (j*src_rate) // target_rate, n_out = n*target_rate // src_rate.
    Pure integer index math, so the result is deterministic across
    engines and the oracle can recompute any output sample straight
    from the logical source rule. Identity when the rates match
    (n_out == n and every index maps to itself); an exact-integer
    upsample by factor r repeats each sample r times, which is what
    makes the fingerprint-invariance property hold (energies scale
    by exactly r per r-times-longer frame, preserving delta signs)."""
    import numpy as np

    s = np.asarray(samples)
    n = len(s)
    n_out = (n * target_rate) // src_rate
    idx = (np.arange(n_out, dtype=np.int64) * src_rate) // target_rate
    return s[idx]


RESAMPLED_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_rate", LongType()),
        StructField("target_rate", LongType()),
        StructField("n_in", LongType()),
        StructField("n_out", LongType()),
        StructField("r_sum", LongType()),
        StructField("r_min", LongType()),
        StructField("r_max", LongType()),
        StructField("r_energy", LongType()),
        StructField("r_zero_cross", LongType()),
    ]
)


def resample_wav_stats(media: DataFrame, target_rate: int) -> DataFrame:
    """Decode → RESAMPLE fused into one Arrow stage (the audio twin of
    ``resize_bmp_stats``): parse each WAV payload, nearest-resample
    to ``target_rate`` (real pipelines normalize rates before
    fingerprinting/featurizing — the corpus carries three), and emit
    exact integer statistics of the RESAMPLED signal. No FP anywhere,
    so a resampler that misrounds one index hash-mismatches."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "audio/wav":
                    raise NotImplementedError(f"no decoder for {mtype}")
                rate, s = decode_wav16(bytes(payload))
                r = resample_nearest(s, rate, target_rate).astype(np.int64)
                if len(r) == 0:  # clip shorter than one output sample
                    raise ValueError(
                        f"clip {mid}: {len(s)} samples @ {rate} Hz "
                        f"resample to 0 samples @ {target_rate} Hz"
                    )
                nonneg = r >= 0
                rows.append(
                    (
                        int(mid), int(rate), int(target_rate),
                        len(s), len(r),
                        int(r.sum()), int(r.min()), int(r.max()),
                        int((r * r).sum()),
                        int((nonneg[1:] != nonneg[:-1]).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESAMPLED_STATS_SCHEMA]
            )

    return media.mapInPandas(_decode, RESAMPLED_STATS_SCHEMA)


def resize_nearest(rgb, tw: int, th: int):
    """Nearest-neighbor resample of an (H, W, 3) uint8 array to
    (th, tw, 3): target pixel (y, x) takes source pixel
    (y*H // th, x*W // tw) — pure integer index math, so the result
    is deterministic across engines and the oracle can recompute any
    target pixel straight from the logical source rule."""
    import numpy as np

    h, w, _ = rgb.shape
    ys = (np.arange(th, dtype=np.int64) * h) // th
    xs = (np.arange(tw, dtype=np.int64) * w) // tw
    return rgb[ys[:, None], xs[None, :]]


RESIZED_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def resize_bmp_stats(media: DataFrame, max_dim: int) -> DataFrame:
    """Decode + RESAMPLE fused into one Arrow stage: parse each BMP,
    apply the resize_plan target-dimension rule (cap the longest side
    at ``max_dim``, aspect preserved by integer scaling, floored at
    1 px), nearest-neighbor resample, and emit exact channel sums of
    the RESIZED image. Target dims are a pure function of (w, h) —
    identical math to resize_plan — so the planning query and this
    execution stage agree row-for-row without a join; pixels never
    leave the task."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                w, h, rgb = decode_bmp24(bytes(payload))
                longest = max(w, h)
                if longest > max_dim:
                    tw = max(1, (w * max_dim) // longest)
                    th = max(1, (h * max_dim) // longest)
                else:
                    tw, th = w, h
                out = resize_nearest(rgb, tw, th).reshape(-1, 3).astype("int64")
                rows.append(
                    (
                        int(mid), w, h, tw, th, tw * th,
                        int(out[:, 0].sum()), int(out[:, 1].sum()),
                        int(out[:, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_STATS_SCHEMA]
            )

    return media.mapInPandas(_decode, RESIZED_STATS_SCHEMA)


WAV_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("n_in_frame", IntegerType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
        StructField("active", BooleanType()),
    ]
)

# voice-activity cut: a frame is active when its MEAN-SQUARE energy
# meets this floor (≈ the uniform-int16 mean square 65536²/12, so the
# synthetic clips split near 50/50 and both branches are exercised).
# Compared by integer cross-multiply: energy ≥ floor · n_in_frame.
VAD_MS_FLOOR = 358_000_000


def decode_wav_frames(media: DataFrame, frame_len: int) -> DataFrame:
    """Decode → FRAME, the windowing stage after decode in every audio
    pipeline (feature extraction, VAD, diarization all consume fixed
    frames): parse each WAV payload, split samples into non-
    overlapping ``frame_len``-sample frames (last frame ragged), and
    emit per-frame exact integer features — energy (Σ s²), peak |s|,
    and the VAD flag ``energy ≥ VAD_MS_FLOOR · n_in_frame``.

    Scale: decode and framing fuse into one narrow Arrow stage —
    samples never shuffle, only the per-frame feature rows (clip_len /
    frame_len per clip) leave Python.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "audio/wav":
                    raise NotImplementedError(f"no decoder for {mtype}")
                _, s = decode_wav16(bytes(payload))
                s64 = s.astype(np.int64)
                for fno in range(0, len(s64), frame_len):
                    fr = s64[fno : fno + frame_len]
                    energy = int((fr * fr).sum())
                    rows.append(
                        (
                            int(mid),
                            fno // frame_len,
                            len(fr),
                            energy,
                            int(np.abs(fr).max()),
                            energy >= VAD_MS_FLOOR * len(fr),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_FRAME_SCHEMA])

    return media.mapInPandas(_frames, WAV_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Media near-dup (round 9, r8 verdict #1/#2): perceptual signatures
# computed from DECODED payloads inside the Arrow codec stages, then
# paired with the exact-recall Hamming banding the text dedup already
# uses (operators/dedup.py:hamming_band_pairs). The corpus rules
# plant near-copy siblings — every NEARDUP_VARIANTS consecutive
# media_ids share one source image/clip with variant-specific
# perturbations (brightness shift / sparse dots for images; whole-
# frame time shift / dither for audio; one deliberately-unrelated
# pattern per group as the far negative) — so recall is testable
# analytically, and the oracle recomputes the signature from the
# LOGICAL rule (never the bytes), pinning codec + downscale +
# signature bit-for-bit.
# ---------------------------------------------------------------------------

NEARDUP_VARIANTS = 4
# image rule: src-shared dims (so siblings share a raster), pixel
# values kept < 197 so the +29 brightness / +58 dot offsets cannot
# wrap — perceptual invariance must come from the HASH, not from
# modular coincidence
NDIMG_W_BASE, NDIMG_W_MOD = 12, 17  # width  12..28
NDIMG_H_BASE, NDIMG_H_MOD = 12, 13  # height 12..24
NDIMG_PIX_MOD = 197
NDIMG_BRIGHT = 29  # v1: uniform brightness lift (dHash-invariant)
NDIMG_DOT = 58  # v2: sparse bright dots (flips <= 2 dHash bits)
NDIMG_DOT_STRIDE = 499
NDIMG_ALT_SEED = 500009  # v3's unrelated-pattern seed offset

# xorshift-multiply mixer shared by both corpus rules. Two simpler
# families were measured and rejected before landing here: linear-
# congruential rules are phase/stride-smooth (nearby sources give
# correlated gradients → cross-source collisions), and a bare
# multiplicative (Knuth) hash is AFFINE in its input, so two seeds
# differ by a near-constant offset after mixing and their
# gradient-sign signatures still collide. The xor-shift steps break
# the additive structure (Wang-style 32-bit finalizer). Every step
# is exact int64 arithmetic — the 32-bit value times the 27-bit
# multiplier stays under 2^59 — so DuckDB recomputes it verbatim
# with xor()/>>/%.
MIX_A, MIX_M = 1_000_003, 0x45D9F3B


def _mix(seed, pos):
    """Well-mixed 32-bit hash of (seed, pos), identical in numpy
    int64 and DuckDB BIGINT."""
    x = (seed * MIX_A + pos) % (1 << 32)
    x = ((x >> 16) ^ x) * MIX_M % (1 << 32)
    x = ((x >> 16) ^ x) * MIX_M % (1 << 32)
    return (x >> 16) ^ x
# dHash grid: 6 rows x 11 cols of nearest-neighbor gray samples ->
# 6 x 10 horizontal comparisons = 60 signature bits (fits BIGINT,
# divisible by the k+1=4 pigeonhole bands of max_hamming=3)
DHASH_ROWS, DHASH_COLS = 6, 11
DHASH_BITS = DHASH_ROWS * (DHASH_COLS - 1)
NDIMG_MAX_HAMMING = 3


def _ndimg_rule_rgb(media_id: int):
    """Variant-aware logical pixel rule for the near-dup image corpus:
    src = media_id // NEARDUP_VARIANTS shares dims + base pattern;
    v0 = base, v1 = base + uniform brightness, v2 = base + sparse
    dots, v3 = an unrelated pattern (the far negative)."""
    import numpy as np

    src, v = divmod(media_id, NEARDUP_VARIANTS)
    w = NDIMG_W_BASE + src % NDIMG_W_MOD
    h = NDIMG_H_BASE + src % NDIMG_H_MOD
    k = np.arange(w * h, dtype=np.int64).reshape(h, w)
    c = np.arange(3, dtype=np.int64)
    seed = src + NDIMG_ALT_SEED if v == 3 else src
    vals = _mix(seed, k[..., None] * 3 + c) % NDIMG_PIX_MOD
    if v == 1:
        vals = vals + NDIMG_BRIGHT
    elif v == 2:
        vals = vals + NDIMG_DOT * (
            (k[..., None] % NDIMG_DOT_STRIDE == 0).astype(np.int64)
        )
    return vals.astype(np.uint8)


def attach_neardup_bmp_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize REAL 24-bit BMP bytes per row under the near-dup
    variant rule — the binary source for the perceptual-hash
    pipeline (Arrow-batched like ``attach_bmp_payload``)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                payload = encode_bmp24(_ndimg_rule_rgb(int(mid)))
                out.append((int(mid), payload, "image/bmp", len(payload)))
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "media_type", "n_bytes"]
            )

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def dhash_signature(rgb) -> int:
    """64->60-bit difference hash of an (H, W, 3) uint8 image:
    nearest-neighbor downscale to the DHASH_ROWS x DHASH_COLS grid
    (resize_nearest — pure integer index math), grayscale by exact
    channel SUM (integer, no luma weights — deterministic across
    engines), bit y*(COLS-1)+x set iff grid[y][x+1] > grid[y][x].
    Invariant to uniform brightness shifts and (coarsely) to
    resolution — the properties the planted v1/v2 siblings test."""
    import numpy as np

    grid = resize_nearest(rgb, DHASH_COLS, DHASH_ROWS).astype(np.int64)
    gray = grid.sum(axis=2)
    bits = gray[:, 1:] > gray[:, :-1]
    sig = 0
    for b, flag in enumerate(bits.ravel()):
        if flag:
            sig |= 1 << b
    return sig


def decode_dhash(media: DataFrame) -> DataFrame:
    """mapInPandas decode→perceptual-hash stage: parse each BMP
    payload, downscale, emit the 60-bit dHash. Pixels never leave
    the stage — the output is (id, dims, one BIGINT) per image."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                w, h, rgb = decode_bmp24(bytes(payload))
                rows.append((int(mid), w, h, dhash_signature(rgb)))
            yield pd.DataFrame(rows, columns=[f.name for f in DHASH_SCHEMA])

    return media.mapInPandas(_decode, DHASH_SCHEMA)


# audio fingerprint rule: sample range kept to ±32000 so the ±3 v2
# dither cannot overflow int16; the v1 sibling is shifted by WHOLE
# frames of leading silence, which the onset-anchored signature
# cancels exactly (hamming 0, analytic)
NDAUD_FRAME_LEN = 25
NDAUD_SIG_FRAMES = 61  # frames after onset -> 60 delta bits
NDAUD_BITS = NDAUD_SIG_FRAMES - 1
NDAUD_SAMPLE_MOD = 64000
NDAUD_ALT_SEED = 900007  # v3's unrelated-pattern seed offset
NDAUD_SHIFT_FRAMES = 2  # v1: leading-silence time shift
NDAUD_MAX_HAMMING = 3


def _ndaud_rule(media_id: int):
    """Variant-aware logical sample rule for the near-dup audio
    corpus: v0 = base, v1 = base shifted by NDAUD_SHIFT_FRAMES frames
    of leading silence, v2 = base + small deterministic dither
    (re-encode stand-in), v3 = an unrelated pattern."""
    import numpy as np

    src, v = divmod(media_id, NEARDUP_VARIANTS)
    n_body = NDAUD_FRAME_LEN * NDAUD_SIG_FRAMES
    k = np.arange(n_body, dtype=np.int64)
    seed = src + NDAUD_ALT_SEED if v == 3 else src
    body = _mix(seed, k) % NDAUD_SAMPLE_MOD - NDAUD_SAMPLE_MOD // 2
    if v == 2:
        body = body + ((k * 13) % 7 - 3)
    if v == 1:
        body = np.concatenate(
            [
                np.zeros(NDAUD_FRAME_LEN * NDAUD_SHIFT_FRAMES, dtype=np.int64),
                body,
            ]
        )
    return body.astype(np.int16)


def attach_neardup_wav_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize REAL RIFF/WAVE PCM16 bytes per row under the
    near-dup variant rule (every third clip carries the junk-chunk
    layout so chunk walking stays exercised)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                payload = encode_wav16(
                    _ndaud_rule(mid), 8000, pad_chunk=(mid % 3 == 0)
                )
                out.append((mid, payload, "audio/wav", len(payload)))
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "media_type", "n_bytes"]
            )

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("onset", IntegerType()),
        StructField("afp", LongType()),
    ]
)


def audio_fingerprint(
    samples, frame_len: int = NDAUD_FRAME_LEN
) -> tuple[int, int, int]:
    """(n_frames, onset, fingerprint): onset-anchored energy-delta
    fingerprint of an int16 clip — frame energies (Σ s² per
    ``frame_len`` samples), onset = first frame with energy > 0,
    bit b set iff e[onset+b+1] > e[onset+b] for b in 0..59. The onset
    anchor makes the signature exactly invariant to whole-frame
    leading silence (the time-shift sibling); sign-of-delta makes it
    robust to gain and small dither. Raises if the clip is too short
    to fill the signature past its onset — the honest boundary."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    n_full = len(s) - len(s) % frame_len
    e = (
        (s[:n_full].reshape(-1, frame_len) ** 2).sum(axis=1)
        if n_full
        else np.zeros(0, dtype=np.int64)
    )
    active = np.nonzero(e > 0)[0]
    if len(active) == 0:
        raise ValueError("all-silent clip has no onset")
    onset = int(active[0])
    if onset + NDAUD_SIG_FRAMES > len(e):
        raise ValueError(
            f"clip too short: {len(e)} frames, onset {onset}, need "
            f"{NDAUD_SIG_FRAMES} past onset"
        )
    win = e[onset : onset + NDAUD_SIG_FRAMES]
    sig = 0
    for b in range(NDAUD_BITS):
        if win[b + 1] > win[b]:
            sig |= 1 << b
    return len(e), onset, sig


def decode_audio_fingerprint(media: DataFrame) -> DataFrame:
    """mapInPandas decode→fingerprint stage: parse each WAV payload,
    frame it, emit the 60-bit onset-anchored fingerprint. Samples
    never leave the stage."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "audio/wav":
                    raise NotImplementedError(f"no decoder for {mtype}")
                _, s = decode_wav16(bytes(payload))
                n_frames, onset, sig = audio_fingerprint(s)
                rows.append((int(mid), n_frames, onset, sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA]
            )

    return media.mapInPandas(_decode, AUDIO_FP_SCHEMA)


# ---------------------------------------------------------------------------
# Video near-dup (round 9, completing the modality set): clip-level
# duplicate detection by FRAME VOTE — each frame goes through the
# real BMP codec round-trip and gets its 60-bit dHash; two clips are
# near-dups when >= NDVID_MIN_FRAMES of their time-ALIGNED frames
# are within per-frame Hamming NDVID_MAX_HAMMING. Robust to
# re-encoding (brightness-shifted sibling: every frame hash
# identical) and to re-editing (one replaced frame: 7/8 still
# match); unrelated clips share ~0 aligned frames. The corpus rule
# plants exactly those siblings per 4-id group.
# ---------------------------------------------------------------------------

NDVID_FRAMES = 8
NDVID_SEED_STRIDE = 16  # > NDVID_FRAMES: frame seeds never collide
NDVID_MAX_HAMMING = 2  # per-frame bit budget (tighter than stills)
NDVID_MIN_FRAMES = 6  # clip verdict: >= 6 of 8 aligned frames match
NDVID_EDIT_FRAME = 4  # v2: this frame is replaced (re-edit sibling)
NDVID_EDIT_SEED = 700_003
NDVID_ALT_SEED = 800_011


def _ndvid_frame_rgb(video_id: int, frame_idx: int):
    """Logical pixel rule for near-dup video frames: per 4-id group,
    v0 = base clip, v1 = brightness-lifted re-encode (dHash-
    invariant per frame), v2 = base with ONE frame replaced by
    unrelated content, v3 = fully unrelated clip."""
    import numpy as np

    src, v = divmod(video_id, NEARDUP_VARIANTS)
    w = NDIMG_W_BASE + src % NDIMG_W_MOD
    h = NDIMG_H_BASE + src % NDIMG_H_MOD
    seed = src * NDVID_SEED_STRIDE + frame_idx
    if v == 3:
        seed += NDVID_ALT_SEED
    elif v == 2 and frame_idx == NDVID_EDIT_FRAME:
        seed += NDVID_EDIT_SEED
    k = np.arange(w * h, dtype=np.int64).reshape(h, w)
    c = np.arange(3, dtype=np.int64)
    vals = _mix(seed, k[..., None] * 3 + c) % NDIMG_PIX_MOD
    if v == 1:
        vals = vals + NDIMG_BRIGHT
    return vals.astype(np.uint8)


FRAME_DHASH_SCHEMA = StructType(
    [
        StructField("video_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("fhash", LongType()),
    ]
)


def decode_frame_dhash(frames: DataFrame) -> DataFrame:
    """(video_id, frame_idx) → per-frame dHash through the REAL BMP
    codec (encode → independent decode → downscale → hash, one
    Arrow stage — pixels never leave the task; one BIGINT per frame
    does)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, fi in zip(pdf["video_id"], pdf["frame_idx"]):
                payload = encode_bmp24(_ndvid_frame_rgb(int(vid), int(fi)))
                _, _, rgb = decode_bmp24(payload)
                rows.append((int(vid), int(fi), dhash_signature(rgb)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_DHASH_SCHEMA]
            )

    return frames.mapInPandas(_run, FRAME_DHASH_SCHEMA)


def video_neardup_pairs(frame_hashes: DataFrame) -> DataFrame:
    """(va, vb, n_matched): clip pairs with >= NDVID_MIN_FRAMES
    time-aligned frames within per-frame Hamming NDVID_MAX_HAMMING.

    Mining is the shared Manku banding over a composite
    (video, frame) id with the FRAME INDEX joined alongside the band
    key — candidates are only ever aligned frames of two clips, so
    the join volume is banded-per-frame, never clips × clips and
    never frames × frames across time."""
    from firefox_public_data_report_etl_spark.operators.dedup import (
        hamming_band_rows,
    )

    sigs = frame_hashes.select(
        (
            F.col("video_id") * NDVID_FRAMES + F.col("frame_idx")
        ).alias("fid"),
        F.col("fhash"),
    )
    rows = hamming_band_rows(
        sigs,
        id_col="fid",
        sig_col="fhash",
        bits=DHASH_BITS,
        max_hamming=NDVID_MAX_HAMMING,
    ).withColumn("f", F.col("fid") % NDVID_FRAMES)
    left = rows.select(
        F.col("fid").alias("fa"), F.col("fhash").alias("sa"), "b", "v", "f"
    )
    right = rows.select(
        F.col("fid").alias("fb"), F.col("fhash").alias("sb"), "b", "v", "f"
    )
    cand = (
        left.join(right, ["b", "v", "f"])
        .filter(
            F.expr(f"fa div {NDVID_FRAMES}") < F.expr(f"fb div {NDVID_FRAMES}")
        )
        .select("fa", "fb", "sa", "sb", "f")
        .distinct()
    )
    matched = cand.filter(
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        <= NDVID_MAX_HAMMING
    ).select(
        F.expr(f"fa div {NDVID_FRAMES}").alias("va"),
        F.expr(f"fb div {NDVID_FRAMES}").alias("vb"),
        "f",
    ).distinct()
    return (
        matched.groupBy("va", "vb")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= NDVID_MIN_FRAMES)
    )


STATS_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("dhash", LongType()),
    ]
)


def decode_bmp_stats_dhash(media: DataFrame) -> DataFrame:
    """ONE decode pass feeding both curation stages: parse each BMP
    payload once and emit the exact channel sums (the quality rules'
    input) AND the 60-bit dHash (the dedup stage's input) from the
    same in-memory pixels — at 100 TB this halves blob IO vs running
    decode_bmp_stats and decode_dhash as separate branches (each
    re-reads every payload; mapInPandas stages share no work)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                w, h, rgb = decode_bmp24(bytes(payload))
                flat = rgb.reshape(-1, 3).astype("int64")
                rows.append(
                    (
                        int(mid), w, h, w * h,
                        int(flat[:, 0].sum()), int(flat[:, 1].sum()),
                        int(flat[:, 2].sum()),
                        dhash_signature(rgb),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in STATS_DHASH_SCHEMA]
            )

    return media.mapInPandas(_decode, STATS_DHASH_SCHEMA)


def video_neardup_against_index(
    spark,
    index_path: str,
    batch_frame_hashes: DataFrame,
    exclude_label: int | None = None,
):
    """``HammingProbe`` whose ``pairs`` is (base_video, batch_video,
    n_matched): incremental clip-level
    video near-dup — an incoming batch of clips (per-frame dHash
    rows, ``decode_frame_dhash`` output) voted against a PERSISTED
    frame-hash index (``operators/hamming_index.py`` built over
    composite ``fid = video_id·NDVID_FRAMES + frame_idx`` ids with
    sig column ``fhash``). The banded probe yields frame-level
    candidates; time alignment (``fid % NDVID_FRAMES`` equal) and
    the ≥ NDVID_MIN_FRAMES vote run post-probe — alignment cannot
    lose recall (an aligned frame pair within the per-frame budget
    always shares a band by pigeonhole; misaligned candidates are
    merely filtered).

    Scale: probe IO is the partition-pruned bucket set the batch
    occupies; the vote is a pair-sized aggregate. Accepted history
    is never rescanned — the same incremental contract as the text,
    embedding, and still-image gates."""
    from firefox_public_data_report_etl_spark.operators.hamming_index import (
        probe_hamming_index,
    )

    sigs = batch_frame_hashes.select(
        (
            F.col("video_id") * NDVID_FRAMES + F.col("frame_idx")
        ).alias("fid"),
        F.col("fhash"),
    )
    probe = probe_hamming_index(
        spark, index_path, sigs, exclude_label=exclude_label
    )
    out = (
        probe.pairs.filter(
            F.col("base_id") % NDVID_FRAMES
            == F.col("batch_id") % NDVID_FRAMES
        )
        .select(
            F.expr(f"base_id div {NDVID_FRAMES}").alias("base_video"),
            F.expr(f"batch_id div {NDVID_FRAMES}").alias("batch_video"),
            (F.col("base_id") % NDVID_FRAMES).alias("f"),
        )
        .distinct()
        .groupBy("base_video", "batch_video")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= NDVID_MIN_FRAMES)
    )
    # the vote rides the probe's result object: the cache handles and
    # the band-row reuse handle survive the clip-level aggregation
    # without ad-hoc attribute re-propagation (round-9 advice)
    probe.pairs = out
    return probe


# ---------------------------------------------------------------------------
# Caption↔image alignment corpus (round-10 verdict #1). Every public
# image-text training recipe (CLIP-style filtering, LAION) gates pairs
# on a caption/image agreement score; the engine scored modalities
# only separately until now. Deterministic joint space: the image side
# quantizes a coarse gray grid of the REAL decoded pixels into
# position-tagged "visual words"; captions are synthesized from the
# SAME logical pixel rule (matched rows describe their own image,
# planted mismatches describe a different source image), and both
# token bags embed through one signed-hash linear map
# (functions.core:md5_sign_sql — a fixed projection matrix that is a
# hash function, never materialized). Alignment = fixed-point cosine
# gate, recomputable bit-exactly in SQL from the logical rule.

CAP_GRID = 5  # 5×5 gray cells -> 25 visual words per image
CAP_CELLS = CAP_GRID * CAP_GRID
CAP_Q = 24  # gray quantum (gray = r+g+b in 0..762 -> 32 buckets)
CAP_DIM = 64  # joint-space dims (one md5 yields all 64 signs/token)
CAP_MIS_MOD, CAP_MIS_RES = 5, 4  # media_id % 5 == 4 -> planted mismatch
CAP_MIS_OFFSET = 7  # mismatched caption describes media_id + 7
CAP_FILLER = ("a", "photo", "of")  # non-visual caption tokens
CAP_SCORE_SCALE = 10000  # fixed-point cos² scale
CAP_COS2_NUM, CAP_COS2_DEN = 5, 12  # aligned iff cos² >= 5/12 & dot>0


def caption_gray_cells(rgb):
    """Row-major CAP_CELLS exact channel-sum gray values of the
    nearest-neighbor CAP_GRID×CAP_GRID downscale — integers, so the
    oracle recomputes each cell straight from the pixel rule."""
    import numpy as np

    return (
        resize_nearest(rgb, CAP_GRID, CAP_GRID)
        .astype(np.int64)
        .sum(axis=2)
        .ravel()
    )


def visual_words(gray_cells) -> list:
    """Position-tagged quantized-gray tokens: cell i with gray g
    becomes ``v{i}b{g // CAP_Q}``. Matched caption/image pairs share
    all CAP_CELLS tokens exactly (codec and downscale are bit-exact);
    independent images collide per cell only when quantized grays
    agree (~7% per cell), so the token-space cosine separates cleanly
    before any projection noise."""
    return [f"v{i}b{int(g) // CAP_Q}" for i, g in enumerate(gray_cells)]


def caption_described_id(media_id: int) -> int:
    """The id whose image this row's caption describes: itself, except
    planted mismatches (media_id % CAP_MIS_MOD == CAP_MIS_RES) whose
    caption describes media_id + CAP_MIS_OFFSET — a different source
    image under the variant rule (offset > NEARDUP_VARIANTS)."""
    if media_id % CAP_MIS_MOD == CAP_MIS_RES:
        return media_id + CAP_MIS_OFFSET
    return media_id


def caption_text(media_id: int) -> str:
    """Deterministic caption: filler words + the described image's
    visual words (from the LOGICAL rule — the generator never sees
    the bytes, so decode bugs cannot cancel out)."""
    cells = caption_gray_cells(_ndimg_rule_rgb(caption_described_id(media_id)))
    return " ".join(list(CAP_FILLER) + visual_words(cells))


CAPTION_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("caption", StringType()),
    ]
)


def attach_captions(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize the caption column per row (Arrow-batched fixture
    generator, like ``attach_neardup_bmp_payload`` for the pixels)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(mid), caption_text(int(mid))) for mid in pdf["media_id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "caption"])

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _gen, CAPTION_SCHEMA
    )


CAPGRID_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("gray", ArrayType(LongType())),
    ]
)


def decode_caption_grid(media: DataFrame) -> DataFrame:
    """Fused decode→feature stage for the alignment scorer: parse each
    BMP payload, emit the CAP_CELLS coarse gray cells. Pixels never
    leave the stage — CAP_CELLS BIGINTs per image cross the wire."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                _w, _h, rgb = decode_bmp24(bytes(payload))
                rows.append(
                    (int(mid), [int(g) for g in caption_gray_cells(rgb)])
                )
            yield pd.DataFrame(rows, columns=["media_id", "gray"])

    return media.mapInPandas(_decode, CAPGRID_SCHEMA)


# per-worker memo of each token's CAP_DIM sign row: the joint-space
# vocabulary is tiny (CAP_CELLS positions × ~32 gray buckets + the
# filler words ≈ 800 tokens), so the md5 count collapses from
# tokens×docs to the vocab size
_CAP_SIGN_CACHE: dict = {}


def _md5_sign_row(token: str):
    """CAP_DIM signs of one token — the PYTHON dialect of
    functions.core.md5_sign_sql / md5_sign_spark_sql: one md5 of the
    UTF-8 token, hex nibble ``dm DIV 4``, bit ``dm % 4``, sign
    ``1 - 2*bit``. Pinned against the Spark/DuckDB dialects in
    tests/test_caption_align.py::test_sign_dialect_parity."""
    import hashlib

    import numpy as np

    v = _CAP_SIGN_CACHE.get(token)
    if v is None:
        h = hashlib.md5(token.encode("utf-8")).hexdigest()
        v = np.asarray(
            [
                1 - 2 * ((int(h[dm >> 2], 16) >> (dm & 3)) & 1)
                for dm in range(CAP_DIM)
            ],
            dtype=np.int64,
        )
        _CAP_SIGN_CACHE[token] = v
    return v


def _embed_token_bag(tokens):
    """Exact int64 joint-space vector of a token bag: Σ tf · sign(w).
    Order-independent, so identical to the Catalyst groupBy+sum form
    and the DuckDB oracle bit-for-bit."""
    from collections import Counter

    import numpy as np

    v = np.zeros(CAP_DIM, dtype=np.int64)
    for tok, tf in Counter(tokens).items():
        v += tf * _md5_sign_row(tok)
    return v


def caption_image_vectors(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, v) image vectors of the caption joint space as ONE
    fused Arrow stage: payload synthesis → REAL BMP decode → gray
    cells → position-tagged visual words → signed md5 projection —
    nothing gram-grain ever crosses the wire or shuffles (the
    unfused form exploded 25 tokens/image, shuffled them to a
    (media, word) aggregate, and re-aggregated 64 sums: three
    Catalyst stages whose compile+shuffle overhead dominated the
    caption family's bench rows). Values are pinned bit-identical to
    the byte-free DuckDB recompute by every caption-family oracle."""

    def _emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                _w, _h, rgb = decode_bmp24(
                    encode_bmp24(_ndimg_rule_rgb(mid))
                )
                toks = visual_words(caption_gray_cells(rgb))
                rows.append((mid, _embed_token_bag(toks).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "v"])

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _emb, "media_id long, v array<long>"
    )


def caption_pair_vectors(media: DataFrame) -> DataFrame:
    """(media_id, qi, qc) from REAL payload bytes + caption strings —
    the ingestion shape of the fused joint-space embed: unlike
    ``caption_image_vectors``/``caption_text_vectors`` (which
    synthesize from the id rule for the batch fixtures), this stage
    scores whatever (payload, caption) pair actually arrived, so an
    ingestion gate cannot be fooled by a row whose id claims one
    image while its bytes carry another. One Arrow stage; pixels and
    tokens never leave it."""

    def _emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype, cap in zip(
                pdf["media_id"],
                pdf["payload"],
                pdf["media_type"],
                pdf["caption"],
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                _w, _h, rgb = decode_bmp24(bytes(payload))
                qi = _embed_token_bag(
                    visual_words(caption_gray_cells(rgb))
                )
                qc = _embed_token_bag(str(cap).split(" "))
                rows.append((int(mid), qi.tolist(), qc.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "qi", "qc"])

    return media.select(
        "media_id", "payload", "media_type", "caption"
    ).mapInPandas(_emb, "media_id long, qi array<long>, qc array<long>")


def caption_pair_scores(media: DataFrame) -> DataFrame:
    """(media_id, dot, na, nb) from REAL (payload, caption) pairs —
    ``caption_pair_vectors`` with the three inner products emitted
    straight from the SAME Arrow stage (numpy int64 dots on the
    embeds it just built), so the per-row interpreted
    ``aggregate(zip_with(...))`` HOF the gate used to run over the
    returned arrays is gone entirely (round-11 verdict #6 — the HOF
    class every other pair-scoring path already retired). Verdict
    arithmetic (fixed-point cos², threshold) stays in Catalyst at the
    caller."""

    def _emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype, cap in zip(
                pdf["media_id"],
                pdf["payload"],
                pdf["media_type"],
                pdf["caption"],
            ):
                if mtype != "image/bmp":
                    raise NotImplementedError(f"no decoder for {mtype}")
                _w, _h, rgb = decode_bmp24(bytes(payload))
                qi = _embed_token_bag(
                    visual_words(caption_gray_cells(rgb))
                )
                qc = _embed_token_bag(str(cap).split(" "))
                rows.append(
                    (
                        int(mid),
                        int(qi @ qc),
                        int(qi @ qi),
                        int(qc @ qc),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "dot", "na", "nb"]
            )

    return media.select(
        "media_id", "payload", "media_type", "caption"
    ).mapInPandas(_emb, "media_id long, dot long, na long, nb long")


def caption_align_scores(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, dot, na, nb) for the batch-fixture alignment gate —
    BOTH joint-space embeds (image: synth → real BMP decode → gray
    cells → visual words; caption: the described image's logical
    rule) and their three inner products in ONE fused Arrow stage
    (round 13; guide §2.4/§4.2). The former shape ran two separate
    mapInPandas stages over the same id set, round-robin-exchanged
    and broadcast one of them into an equi-join, then evaluated three
    interpreted ``aggregate(zip_with(...))`` HOFs per row — the HOF
    class every other pair-scoring path retired in rounds 11-12
    (``caption_pair_scores`` is the ingestion-bytes twin of this
    shape). Inner products are numpy int64 on the embeds the stage
    just built, so every caption-family oracle pins them bit-equal.
    Verdict arithmetic (fixed-point cos², threshold) stays in
    Catalyst at the caller."""

    def _emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                _w, _h, rgb = decode_bmp24(
                    encode_bmp24(_ndimg_rule_rgb(mid))
                )
                qi = _embed_token_bag(
                    visual_words(caption_gray_cells(rgb))
                )
                qc = _embed_token_bag(caption_text(mid).split(" "))
                rows.append(
                    (mid, int(qi @ qc), int(qi @ qi), int(qc @ qc))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "dot", "na", "nb"]
            )

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _emb, "media_id long, dot long, na long, nb long"
    )


def caption_text_vectors(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, v) caption vectors of the joint space, same fused
    Arrow shape as ``caption_image_vectors`` (captions come from the
    LOGICAL pixel rule of the described image — the generator never
    sees bytes, so decode bugs cannot cancel out)."""

    def _emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                toks = caption_text(mid).split(" ")
                rows.append((mid, _embed_token_bag(toks).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "v"])

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        _emb, "media_id long, v array<long>"
    )
