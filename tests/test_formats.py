"""Format round-trips: ORC read/write parity with parquet."""

from __future__ import annotations

from spotify_pipeline_gcp_spark.sinks.writers import write_orc
from spotify_pipeline_gcp_spark.sources.readers import read_orc


def test_orc_roundtrip(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    out = str(tmp_path / "nation_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_partitioned(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    out = str(tmp_path / "nation_orc_part")
    write_orc(src, out, partition_by=["n_regionkey"])
    from pyspark.sql import functions as F

    one = read_orc(spark, out).where(F.col("n_regionkey") == 0)
    assert one.count() == src.where(F.col("n_regionkey") == 0).count()
