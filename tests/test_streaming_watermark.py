"""Watermark semantics: windowed append-mode aggregation emits a
window only once the watermark passes it; late rows beyond the
watermark are dropped."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows, mtime):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    # FileStreamSource orders files by modification time; pin mtimes so
    # batch order is deterministic (same-second writes would tie)
    import glob
    import os

    for f in glob.glob(f"{path}/*.parquet"):
        if os.stat(f).st_mtime > 10_000_000:  # untouched (real) mtime
            os.utime(f, (mtime, mtime))


def test_windowed_agg_with_watermark(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "stream_src")

    def t(minute, second=0):
        return dt.datetime(2026, 8, 13, 10, minute, second)

    # batch 1: two 5-minute windows' worth of on-time data
    _write_batch(
        spark,
        src,
        [(t(0, 10), "a", 1.0), (t(1), "a", 2.0), (t(6), "a", 4.0)],
        mtime=1_000_000,
    )
    # batch 2: advances event time to 10:20 -> eviction watermark
    # becomes 10:10 at batch end and the 10:00/10:05 windows close
    _write_batch(spark, src, [(t(20), "a", 8.0)], mtime=2_000_000)
    # batch 3: keeps the stream moving. Spark filters late events
    # with the PREVIOUS batch's watermark (watermarkForLateEvents
    # lags watermarkForEviction by one batch), so the drop threshold
    # only reaches 10:10 one batch after the advance.
    _write_batch(spark, src, [(t(21), "a", 9.0)], mtime=3_000_000)
    # batch 4: a LATE row for the already-closed 10:00 window —
    # now behind the late-event watermark (10:10) -> dropped
    _write_batch(spark, src, [(t(0, 30), "a", 100.0)], mtime=4_000_000)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "k")
        .agg(F.sum("v").alias("total"))
        .select(F.col("window.start").alias("wstart"), "k", "total")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.wstart.minute, r.k): r.total for r in spark.table(name).collect()}

    # the 10:00 and 10:05 windows closed when the watermark reached
    # 10:10; the late 100.0 row (event time 10:00:30, behind the
    # watermark) was DROPPED, so 10:00 totals 3.0 not 103.0
    assert got[(0, "a")] == 3.0
    assert got[(5, "a")] == 4.0
    # the 10:20 window never closed (stream ended) -> not emitted
    assert (20, "a") not in got
