"""Multimodal-column queries (operators/multimodal.py).

The binary payload pipeline is real Spark plumbing (binary columns,
Arrow-batched ``mapInPandas`` decode); the codec is a deterministic
fake (container lacks image libs), which makes even the decode step
oracle-checkable — the oracle re-states the fake codec arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.multimodal import (
    decode_image_meta,
    to_binary_docs,
)
from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import table


@register(
    "qm1_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS byte_len,
           sha256(text) AS digest
    FROM documents
    """,
)
def qm1_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column basics: pack text as an opaque payload, compute
    byte length + content digest JVM-side (no Python)."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("digest"),
    )


@register(
    "qm2_image_decode_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS byte_len,
           (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
           (octet_length(encode(text)) % 480 + 1)::BIGINT AS height,
           ((octet_length(encode(text)) % 640 + 1)
            * (octet_length(encode(text)) % 480 + 1))::BIGINT AS n_pixels
    FROM documents
    """,
)
def qm2_image_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-metadata extraction through the Arrow-batched
    ``mapInPandas`` kernel (FakeImageCodec) — exercises the full
    binary-payload pipeline: pack -> batch -> per-payload decode ->
    typed metadata out."""
    docs = table(spark, sf_dir, "documents")
    return decode_image_meta(to_binary_docs(docs, "doc_id", "text"))


@register(
    "qm3_payload_features",
    oracle="""
    WITH ch AS (
      SELECT doc_id, ord(unnest(string_split(text, ''))) AS b
      FROM documents
    )
    SELECT doc_id,
    """
    + ",\n           ".join(
        f"sum(CASE WHEN b % 16 = {j} THEN 1 ELSE 0 END)::BIGINT AS f{j}"
        for j in range(16)
    )
    + """
    FROM ch GROUP BY doc_id
    """,
)
def qm3_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: 16-bin byte-class
    histogram per payload, computed in an Arrow/NumPy mapInPandas
    kernel on the raw bytes (the image-embedding shape — swap the
    histogram for a model forward pass, same plumbing). The payloads
    are UTF-8-packed ASCII text here, so the oracle reproduces the
    byte histogram character-wise with ord() — the kernel itself is
    byte-level and codec-agnostic."""
    from spotify_pipeline_gcp_spark.operators.multimodal import (
        extract_payload_features,
        to_binary_docs,
    )

    docs = table(spark, sf_dir, "documents")
    return extract_payload_features(to_binary_docs(docs, "doc_id", "text"))


@register(
    "qm4_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, text,
             unnest(range(0, (length(text) + 63) // 64, 2)) AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, (frame_idx * 64 + 1)::INT, 64)) AS frame_md5
    FROM f
    """,
)
def qm4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 2nd 64-byte frame of each payload with a
    content digest — the video frame-sampling fan-out (one row in,
    ceil(len/64)/2 rows out, partition-local, no shuffle). ASCII
    payloads make the byte slicing replayable as substr() text
    slicing in the oracle; a real decoder changes only the kernel."""
    from spotify_pipeline_gcp_spark.operators.multimodal import (
        sample_frames,
        to_binary_docs,
    )

    docs = table(spark, sf_dir, "documents")
    return sample_frames(
        to_binary_docs(docs, "doc_id", "text"), frame_size=64, stride=2
    )
