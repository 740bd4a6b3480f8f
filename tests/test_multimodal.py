"""Multimodal binary-column plumbing (fake codec, real Spark path)."""

from __future__ import annotations

import pytest

from spotify_pipeline_gcp_spark.operators.multimodal import (
    FakeImageCodec,
    decode_image_meta,
    to_binary_docs,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 700)], "doc_id long, text string"
    )


def test_to_binary_docs_schema_and_bytes(spark):
    out = to_binary_docs(_docs(spark), "doc_id", "text")
    assert dict(out.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "byte_len": "bigint",
    }
    rows = {r.doc_id: r for r in out.collect()}
    assert bytes(rows[1].payload) == b"hello world"
    assert rows[2].byte_len == 700


def test_decode_image_meta_matches_codec(spark):
    meta = {r.doc_id: r for r in decode_image_meta(
        to_binary_docs(_docs(spark), "doc_id", "text")
    ).collect()}
    w, h = FakeImageCodec.decode(b"hello world")
    assert (meta[1].width, meta[1].height) == (w, h)
    assert meta[2].width == 700 % 640 + 1
    assert meta[2].n_pixels == meta[2].width * meta[2].height


def test_resize_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        FakeImageCodec.resize(b"x", 10, 10)
