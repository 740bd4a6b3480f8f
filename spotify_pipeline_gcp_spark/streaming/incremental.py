"""Structured Streaming parity for the reference's incremental load.

The reference hand-rolls incremental semantics in batch (SURVEY
§2.11): an API cursor (``after=midnight-yesterday``), anti-join dedup
across loads, and an append-only sink. Structured Streaming expresses
the same contract natively:

- cursor          -> file-source offset tracking + checkpoint
- anti-join dedup -> ``dropDuplicates`` stateful operator (+ watermark
                     to bound state)
- daily batch     -> ``Trigger.AvailableNow`` (process what exists,
                     then stop)

These helpers run the daily-batch-equivalent streaming pipelines over
a parquet directory and block until complete — the shape tests and
the driver can call synchronously.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming plan to completion into a memory sink and
    return the materialized result as a DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (ts omitted: the
    parquet TIMESTAMP(NANOS) physical type needs the batch-side
    loader's conversion; streaming demos use the value columns)."""
    # file footer still carries TIMESTAMP(NANOS) for ts even though the
    # declared schema omits it; allow nanos so footer validation passes
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        # the file stream source wants a directory; glob-filter to the
        # single events file inside the sf dir
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def streaming_dedup(
    spark: SparkSession, sf_dir: str, keys: list[str]
) -> DataFrame:
    """Stateful dedup across the stream — the reference's anti-join
    delta-load invariant (``playback_pipeline_curated.py:110``) as a
    ``dropDuplicates`` streaming operator. With a watermark the state
    store is bounded; with ``AvailableNow`` this reproduces the daily
    batch exactly."""
    deduped = stream_events(spark, sf_dir).dropDuplicates(keys)
    return _run_to_memory(deduped, "append")


def streaming_session_windows(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time sessionization as a native streaming operator:
    ``session_window(ts, gap)`` merges events into variable-length
    sessions closed after ``gap`` inactivity — the streaming twin of
    the batch lag+cumsum sessionizer (queries/relational.py::q30).
    Append-mode output emits a session once the watermark passes its
    close; state is bounded by the watermark."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def streaming_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming grouped aggregate (complete mode): per-event-type
    counts and sums, deterministic under AvailableNow."""
    agg = (
        stream_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("sum_value"),
        )
    )
    return _run_to_memory(agg, "complete")
