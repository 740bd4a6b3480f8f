"""Structured Streaming parity: dedup + rollup under AvailableNow."""

from __future__ import annotations

from spotify_pipeline_gcp_spark.streaming.incremental import (
    streaming_dedup,
    streaming_type_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_dedup_by_key(spark):
    out = streaming_dedup(spark, SF_DIR, ["event_id"])
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert out.count() == batch.select("event_id").distinct().count()


def test_streaming_rollup_equals_batch(spark):
    from pyspark.sql import functions as F

    stream = {
        r.event_type: (r.n, r.sum_value)
        for r in streaming_type_rollup(spark, SF_DIR).collect()
    }
    batch = {
        r.event_type: (r.n, r.sum_value)
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("sum_value"),
        )
        .collect()
    }
    assert stream == batch
