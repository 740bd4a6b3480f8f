"""Stream-static join: enrich a stream with a batch dimension —
the streaming twin of the broadcast dim join (no state, re-read per
micro-batch, dim updates picked up between batches)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.streaming.incremental import stream_events

SF_DIR = "/root/testdata/sf0.001"


def test_stream_static_enrichment(spark):
    # static dim: user tier derived from user_id (stand-in for a
    # customer-attributes table)
    tiers = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("tier"),
    )
    enriched = (
        stream_events(spark, SF_DIR)
        .join(tiers, "user_id", "left")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"enr_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.tier: r.n for r in spark.table(name).collect()}

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = {
        r.tier: r.n
        for r in batch.join(tiers, "user_id", "left")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
