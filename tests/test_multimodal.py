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
