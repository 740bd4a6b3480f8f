"""Stateful streaming: custom state operator + idempotent batch sink."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.sinks.writers import ParquetWarehouse
from spotify_pipeline_gcp_spark.streaming.incremental import stream_events
from spotify_pipeline_gcp_spark.streaming.stateful import (
    foreach_batch_delta_append,
    running_user_totals,
)

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_stateful(spark):
    """applyInPandasWithState totals equal the batch aggregate after
    the stream drains (update mode: keep each user's LAST emission)."""
    totals = running_user_totals(stream_events(spark, SF_DIR))
    name = f"totals_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.table(name).collect()
    }
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expected


def test_foreach_batch_delta_append_idempotent(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = stream_events(spark, SF_DIR)
    foreach_batch_delta_append(
        stream, wh, "events", ["event_id"], str(tmp_path / "ckpt1")
    )
    n1 = wh.scan("events").count()
    assert n1 == spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    # re-run with a FRESH checkpoint (simulated replay of all data):
    # anti-join makes the second full pass a no-op
    foreach_batch_delta_append(
        stream_events(spark, SF_DIR), wh, "events", ["event_id"],
        str(tmp_path / "ckpt2"),
    )
    assert wh.scan("events").count() == n1


def test_warehouse_delete_keys(spark, tmp_path):
    """K6 parity: distributed delete-by-key rewrite."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh2"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string"
    )
    wh.append(df, "t")
    deleted = wh.delete_keys("t", df.where(F.col("k") < 3), ["k"])
    assert deleted == 3
    assert sorted(r.k for r in wh.scan("t").collect()) == list(range(3, 10))
