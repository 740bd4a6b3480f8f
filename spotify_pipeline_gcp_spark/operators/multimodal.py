"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a typed metadata struct alongside — the payload is never interpreted
by Catalyst, only moved, so all relational machinery (partitioning,
joins on metadata, predicate pushdown on metadata columns) applies
unchanged. Decode / feature-extraction runs in Arrow-batched
``mapInPandas`` kernels at partition granularity.

The actual codec libraries (PIL/ffmpeg/...) are NOT in this
container, so the decode step is a clearly-marked deterministic fake
behind the same interface (``FakeImageCodec``); the Spark-side
plumbing — schema, batching, UDF signature, partitioning — is real
and tested. Swapping in a real codec changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_DOC_SCHEMA = (
    "doc_id long, payload binary, media_type string, byte_len long"
)

IMAGE_META_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, n_pixels long"
)


def to_binary_docs(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Pack a text column as an opaque binary payload + metadata.

    Stand-in for ingesting real media bytes: downstream operators see
    exactly what they would with image/audio blobs — an uninterpreted
    ``binary`` column and typed metadata columns to filter/join on.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
    )


class FakeImageCodec:
    """Deterministic stand-in for an image decoder (PIL not installed).

    ``decode(payload) -> (width, height)`` derived arithmetically from
    the byte length, so tests and oracles are exact. A real codec
    implements the same method; everything else in the pipeline is
    codec-agnostic.
    """

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int]:
        n = len(payload)
        width = n % 640 + 1
        height = n % 480 + 1
        return width, height

    @staticmethod
    def resize(payload: bytes, width: int, height: int) -> bytes:
        raise NotImplementedError(
            "real image resize requires a codec library (PIL/opencv) "
            "not present in this environment; plumbing is exercised "
            "via decode metadata instead"
        )


def decode_image_meta(binary_docs: DataFrame) -> DataFrame:
    """Extract image metadata from binary payloads via ``mapInPandas``.

    Arrow-batched: the kernel sees pandas DataFrames of ~10k rows,
    decodes per payload, emits a typed metadata frame. This is the
    canonical shape for any per-payload media op (feature extraction,
    frame sampling, EXIF parse) — per-partition batching, no
    driver involvement, linear scale-out.
    """

    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(binary_docs.sparkSession)

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            dims = pdf["payload"].map(FakeImageCodec.decode)
            out = pdf[["doc_id", "byte_len"]].copy()
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["n_pixels"] = out["width"] * out["height"]
            yield out

    return binary_docs.mapInPandas(kernel, schema=IMAGE_META_SCHEMA)


FEATURE_CLASSES = 16

PAYLOAD_FEATURES_SCHEMA = "doc_id long, " + ", ".join(
    f"f{j} long" for j in range(FEATURE_CLASSES)
)


def extract_payload_features(binary_docs: DataFrame) -> DataFrame:
    """Per-payload feature vector via ``mapInPandas``: a 16-bin byte-
    value histogram (byte % 16 class counts) — REAL computation on
    the real bytes, the canonical shape for media feature extraction
    (an image-embedding model slots into the same kernel: NumPy in,
    fixed-width row out). Emitted as sibling long columns, not an
    array, so the result is directly hash-comparable and joinable;
    downstream ANN operators consume it via ``array(f0..f15)``.

    Batching: the kernel receives Arrow-backed pandas frames per
    partition; per-payload work is one ``np.frombuffer`` +
    ``np.bincount`` — no Python-level byte loops.
    """
    import numpy as np

    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(binary_docs.sparkSession)

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(arr % FEATURE_CLASSES, minlength=FEATURE_CLASSES)
                rows.append([int(doc_id), *counts.tolist()])
            import pandas as pd

            yield pd.DataFrame(
                rows, columns=["doc_id"] + [f"f{j}" for j in range(FEATURE_CLASSES)]
            )

    return binary_docs.mapInPandas(kernel, schema=PAYLOAD_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def sample_frames(
    binary_docs: DataFrame, frame_size: int = 64, stride: int = 2
) -> DataFrame:
    """Frame sampling over binary payloads: treat each payload as a
    sequence of ``frame_size``-byte frames and emit every
    ``stride``-th frame's index + content digest — the video
    frame-sampling shape (a real decoder yields pixel frames; the
    slicing/batching/fan-out plumbing is identical). One input row
    fans out to ceil(len/frame_size)/stride output rows inside the
    Arrow kernel; no shuffle — fan-out happens partition-locally.
    """
    import hashlib

    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(binary_docs.sparkSession)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, stride):
                    frame = data[idx * frame_size:(idx + 1) * frame_size]
                    rows.append(
                        (int(doc_id), idx, hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5"]
            )

    return binary_docs.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)
