"""Native streaming sessionization (session_window + watermark)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import uuid

from pyspark.sql import types as T

from spotify_pipeline_gcp_spark.streaming.incremental import (
    streaming_session_windows,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user", T.StringType()),
    ]
)


def _wb(spark, path, rows, mtime):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    for f in glob.glob(f"{path}/*.parquet"):
        if os.stat(f).st_mtime > 10_000_000:
            os.utime(f, (mtime, mtime))


def test_session_window_stream(spark, tmp_path):
    src = str(tmp_path / "sess_src")

    def t(h, m):
        return dt.datetime(2026, 8, 13, h, m)

    # session 1: three events within 30-min gaps; then a 2h silence;
    # session 2: one event. A final far-future batch closes both.
    _wb(spark, src, [(t(9, 0), "u1"), (t(9, 20), "u1"), (t(9, 45), "u1")], 1_000_000)
    _wb(spark, src, [(t(12, 0), "u1")], 2_000_000)
    _wb(spark, src, [(t(18, 0), "u1")], 3_000_000)
    _wb(spark, src, [(t(23, 0), "u1")], 4_000_000)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sess = streaming_session_windows(stream, "ts", "user", gap="30 minutes",
                                     watermark="10 minutes")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.session_start, r.n_events)
        for r in spark.table(name).collect()
    }
    # session 1: 09:00-10:15 (3 events, merged via 30-min gap chain)
    assert (t(9, 0), 3) in got
    # session 2: the noon singleton
    assert (t(12, 0), 1) in got
