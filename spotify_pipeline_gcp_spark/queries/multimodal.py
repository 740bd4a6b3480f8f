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
