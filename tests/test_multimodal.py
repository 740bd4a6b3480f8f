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


def test_payload_features_arbitrary_bytes(spark):
    # the kernel is byte-level: verify against a NumPy reference on
    # NON-text payloads (the oracle's char-wise replay only works for
    # ASCII; the operator itself must not care)
    import hashlib

    import numpy as np

    from spotify_pipeline_gcp_spark.operators.multimodal import (
        extract_payload_features,
    )

    payloads = [bytes([7, 250, 16, 16, 255, 0]), hashlib.sha256(b"x").digest()]
    df = spark.createDataFrame(
        [(i, p, "application/octet-stream", len(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary, media_type string, byte_len long",
    )
    got = {r.doc_id: [r[f"f{j}"] for j in range(16)]
           for r in extract_payload_features(df).collect()}
    for i, p in enumerate(payloads):
        ref = np.bincount(
            np.frombuffer(p, dtype=np.uint8) % 16, minlength=16
        ).tolist()
        assert got[i] == ref


def test_frame_sample_slicing_and_stride(spark):
    import hashlib

    from spotify_pipeline_gcp_spark.operators.multimodal import sample_frames

    payload = bytes(range(256)) * 2  # 512 bytes -> 8 frames of 64
    df = spark.createDataFrame(
        [(1, payload, "video/fake", len(payload))],
        "doc_id long, payload binary, media_type string, byte_len long",
    )
    rows = {r.frame_idx: r.frame_md5
            for r in sample_frames(df, frame_size=64, stride=2).collect()}
    assert sorted(rows) == [0, 2, 4, 6]  # every 2nd of 8 frames
    for idx, digest in rows.items():
        frame = payload[idx * 64:(idx + 1) * 64]
        assert digest == hashlib.md5(frame).hexdigest()
    # trailing partial frame is still emitted when stride hits it
    short = payload[:100]  # frames: [0:64], [64:100]
    df2 = spark.createDataFrame(
        [(2, short, "video/fake", len(short))],
        "doc_id long, payload binary, media_type string, byte_len long",
    )
    rows2 = {r.frame_idx: r.frame_md5
             for r in sample_frames(df2, frame_size=64, stride=1).collect()}
    assert sorted(rows2) == [0, 1]
    assert rows2[1] == hashlib.md5(short[64:]).hexdigest()
