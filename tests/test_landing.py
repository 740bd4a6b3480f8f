"""Landing-zone layout (K5) + timezone normalization (F7)."""

from __future__ import annotations

import datetime as dt

from spotify_pipeline_gcp_spark.schemas import PLAYBACK_DOC
from spotify_pipeline_gcp_spark.sinks.landing import (
    landing_path,
    write_doc_to_landing,
)
from spotify_pipeline_gcp_spark.sources.readers import read_json
from tests.conftest import playback_doc


def test_landing_layout_and_scan(spark, tmp_path):
    root = str(tmp_path / "00_landing_zone")
    day = dt.date(2026, 8, 12)
    dest = write_doc_to_landing(playback_doc(), root, day, "playback_hist.json")
    assert dest.endswith("00_landing_zone/2026/08/12/playback_hist.json")
    # glob scan over the partitioned layout (ref read one day by path
    # arithmetic; engine reads any date range with one glob)
    df = read_json(spark, f"{root}/*/*/*/playback_hist.json", PLAYBACK_DOC)
    assert df.count() == 1


def test_timezone_normalization(spark):
    """F7: the reference converts naive played_at strings to UTC in
    Python per row (curated.py:100); engine-side this is a column
    expression under the session's pinned UTC timezone."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    df = spark.createDataFrame(
        [("2026-08-12T17:03:21.123Z",), ("2026-08-12T17:03:21.123+02:00",)],
        "played_at string",
    )
    out = df.select(
        F.to_timestamp("played_at").alias("ts_utc"),
        F.to_utc_timestamp(F.to_timestamp("played_at"), "UTC").alias("ts_norm"),
    ).collect()
    assert out[0].ts_utc == dt.datetime(2026, 8, 12, 17, 3, 21, 123000)
    # offset-aware input lands in UTC wall time
    assert out[1].ts_utc == dt.datetime(2026, 8, 12, 15, 3, 21, 123000)
