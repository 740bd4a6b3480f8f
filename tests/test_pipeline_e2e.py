"""End-to-end pipeline: landing JSON -> clean zone -> curated ->
warehouse delta-load, twice (SURVEY §5 item 3: full lifecycle +
idempotency — the reference's E1-E3 chain)."""

from __future__ import annotations

import os

from spotify_pipeline_gcp_spark.operators.delta import delta_append
from spotify_pipeline_gcp_spark.operators.playback import curate, run_clean_zone
from spotify_pipeline_gcp_spark.sinks.writers import (
    ParquetWarehouse,
    write_csv,
    write_single_file,
)
from spotify_pipeline_gcp_spark.sources.readers import read_csv


def test_full_pipeline_roundtrip(spark, raw_playback, tmp_path):
    clean_dir = tmp_path / "01_clean_zone"
    curated_dir = tmp_path / "02_curated_zone"
    wh = ParquetWarehouse(spark, str(tmp_path / "warehouse"))

    # clean zone: normalize + CSV (ref playback_pipeline.py:318-320)
    tables = run_clean_zone(raw_playback)
    for name, df in tables.items():
        write_csv(df, str(clean_dir / name))

    # curated zone: CSV -> +audit/-dups/typed date -> parquet
    # (ref playback_pipeline_curated.py:168-179)
    hist = read_csv(spark, str(clean_dir / "playback_hist"))
    assert hist.count() == 4
    curated = curate(hist)
    curated.write.mode("overwrite").parquet(str(curated_dir / "playback_hist"))

    # warehouse delta load x2 (ref :185-215): second load appends 0
    batch = spark.read.parquet(str(curated_dir / "playback_hist")).drop(
        "upload_timestamp"
    )
    wh.append(batch, "playback_hist")
    again = delta_append(batch, wh.scan("playback_hist"), ["played_at"])
    assert again.count() == 0

    # new day with one overlapping timestamp -> only new rows land
    extra = batch.limit(1).unionByName(
        batch.limit(1).selectExpr(
            "'2026-08-13T07:00:00.000Z' AS played_at",
            *[c for c in batch.columns if c != "played_at"],
        )
    )
    delta = delta_append(extra, wh.scan("playback_hist"), ["played_at"])
    assert delta.count() == 1
    wh.append(delta, "playback_hist")
    assert wh.scan("playback_hist").count() == 5


def test_write_single_file(spark, raw_playback, tmp_path):
    """K4: stable-name single-file export (ref rename dance
    playback_pipeline.py:66-88)."""
    albums = run_clean_zone(raw_playback)["albums"]
    dest = str(tmp_path / "2026_08_12_albums.csv")
    write_single_file(albums, dest, fmt="csv")
    assert os.path.isfile(dest)
    back = read_csv(spark, dest)
    assert back.count() == albums.count()


def test_partitioned_write_prunes(spark, tmp_path):
    """Partitioned layout replaces path arithmetic (ref main.py:46);
    reading one partition touches only its files."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, "2026-08-11", 5.0), (2, "2026-08-12", 6.0), (3, "2026-08-12", 7.0)],
        "id long, day string, v double",
    )
    out = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    one_day = spark.read.parquet(out).where(F.col("day") == "2026-08-12")
    assert one_day.count() == 2
    plan = one_day.explain(mode="formatted") or ""
    # partition filter visible in the formatted plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        one_day.explain(mode="formatted")
    assert "PartitionFilters" in buf.getvalue()
