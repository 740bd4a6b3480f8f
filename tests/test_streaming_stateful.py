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


def test_user_totals_event_time_ttl_expires_state(spark, tmp_path):
    # two microbatches (maxFilesPerTrigger=1): user 1's events arrive
    # in batch 1; batch 2 is 3 hours later (different user), so the
    # watermark (1h delay) passes user 1's timeout and the state
    # function runs once more with hasTimedOut -> a closed=True row
    # with the final totals, state removed.
    import datetime as dt

    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.streaming.incremental import _run_to_memory
    from spotify_pipeline_gcp_spark.streaming.stateful import user_totals_with_ttl

    src = tmp_path / "stream_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batch1 = spark.createDataFrame(
        [(1, t0, 2.0), (1, t0 + dt.timedelta(minutes=1), 3.0)],
        "user_id long, ts timestamp, value double",
    )
    batch2 = spark.createDataFrame(
        [(2, t0 + dt.timedelta(hours=3), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    batch2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = _run_to_memory(
        user_totals_with_ttl(stream, "ts", watermark="1 hour"), "update"
    )
    rows = [r.asDict() for r in out.orderBy("user_id", "closed").collect()]
    closed_1 = [r for r in rows if r["user_id"] == 1 and r["closed"]]
    assert closed_1, f"user 1 state never expired: {rows}"
    assert closed_1[0]["n_events"] == 2
    assert closed_1[0]["total_value"] == 5.0
    # user 1 also emitted a normal update row before expiry
    assert any(r["user_id"] == 1 and not r["closed"] for r in rows)


def test_update_totals_ttl_tolerates_empty_chunk():
    # the pandas iterator may deliver empty chunks; ts.max() on one is
    # NaT and the epoch conversion would raise. Drive the state fn
    # directly with a fake GroupState.
    import datetime as dt

    import pandas as pd

    from spotify_pipeline_gcp_spark.streaming.stateful import (
        _make_update_totals_ttl,
    )

    class FakeState:
        hasTimedOut = False
        exists = False

        def __init__(self):
            self.updated = None
            self.timeout = None

        def update(self, v):
            self.updated = v

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    fn = _make_update_totals_ttl(3_600_000)
    empty = pd.DataFrame({"user_id": [], "ts": [], "value": []}).astype(
        {"user_id": "int64", "ts": "datetime64[ns]", "value": "float64"}
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    full = pd.DataFrame({"user_id": [1, 1], "ts": [t0, t0], "value": [2.0, 3.0]})

    state = FakeState()
    [out] = list(fn((1,), iter([empty, full, empty]), state))
    assert state.updated == (2, 5.0)
    # timeout = last event epoch-ms + ttl, computed tz-naively from
    # the raw datetime64 payload (UTC-session contract)
    epoch_ms = int(pd.Timestamp(t0).value // 1_000_000)
    assert state.timeout == epoch_ms + 3_600_000
    assert out["n_events"].iloc[0] == 2

    # all-empty batch: no event time -> timeout floors at watermark+1
    state2 = FakeState()
    [out2] = list(fn((1,), iter([empty]), state2))
    assert state2.timeout == 1
    assert out2["n_events"].iloc[0] == 0


def test_transform_with_state_env_gate(spark):
    # the Spark 4 transformWithState API needs google.protobuf; in
    # this sandbox it is absent, so the operator must refuse at the
    # API boundary instead of crashing the streaming runner. When
    # protobuf IS present, the real path must equal the
    # applyInPandasWithState twin.
    import importlib.util

    import pytest

    from spotify_pipeline_gcp_spark.streaming.incremental import (
        _run_to_memory,
        stream_events,
    )
    from spotify_pipeline_gcp_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    sf = "/root/testdata/sf0.001"
    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            running_user_totals_tws(stream_events(spark, sf))
        return
    out = _run_to_memory(running_user_totals_tws(stream_events(spark, sf)), "update")
    assert out.count() > 0
