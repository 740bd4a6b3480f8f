"""Native-expression replacements for the reference's UDFs (§2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.functions.exprs import (
    complete_year,
    json_values_from_key,
)


def test_complete_year(spark):
    df = spark.createDataFrame(
        [("1999",), ("2020-05-17",), ("2020-05",), (None,)], "d string"
    )
    out = [r.c for r in df.select(complete_year("d").alias("c")).collect()]
    # ref udf_complete_year (playback_pipeline.py:151-158): pad bare
    # years; pass everything else through (incl. month precision, null)
    assert out == ["1999-12-31", "2020-05-17", "2020-05", None]


def test_json_values_from_key(spark):
    bag = (
        '[{"artist_name":"Band B","artist_id":"a3"},'
        '{"artist_name":"Solo","artist_id":"a1"}]'
    )
    df = spark.createDataFrame([(bag,)], "j string")
    out = df.select(
        json_values_from_key("j", "artist_name").alias("names"),
        json_values_from_key("j", "artist_id").alias("ids"),
    ).collect()[0]
    assert out.names == "Band B, Solo"
    assert out.ids == "a3, a1"


def test_json_values_from_key_handles_quotes(spark):
    # the reference's regex (?<="key":").*?(?=") mis-parses embedded
    # escaped quotes; the from_json-based expression does not
    bag = '[{"artist_name":"Smith \\"JJ\\" John","artist_id":"a2"}]'
    df = spark.createDataFrame([(bag,)], "j string")
    out = df.select(json_values_from_key("j", "artist_name").alias("n")).collect()
    assert out[0].n == 'Smith "JJ" John'


def test_duration_cols(spark):
    from spotify_pipeline_gcp_spark.functions.exprs import duration_cols

    df = spark.createDataFrame([(123_456,)], "duration_ms long")
    r = df.select(*duration_cols("duration_ms")).collect()[0]
    assert (r.duration_s, r.duration_min) == (123.46, 2.06)
