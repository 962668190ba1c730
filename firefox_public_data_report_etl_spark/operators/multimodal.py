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
    BinaryType,
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
    preserved via integer scaling — no FP, so the stage is
    oracle-exact). The actual pixel resample would run inside the
    decode mapInPandas stage; THIS plan (which rows resize, to what)
    is the distributed decision the pipeline schedules on."""
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
            F.expr(f"cast(width * {max_dim} as long) div greatest(width, height)"),
        )
        .otherwise(F.col("width").cast("long"))
        .alias("target_width"),
        F.when(
            needs,
            F.expr(f"cast(height * {max_dim} as long) div greatest(width, height)"),
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
