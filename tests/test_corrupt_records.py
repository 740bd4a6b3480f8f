"""Malformed-input handling on the JSON scan — at 100 TB some records
WILL be broken; the scan must quarantine, not crash (PERMISSIVE), and
the strict mode must fail loudly when asked (FAILFAST)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@pytest.fixture()
def mixed_file(tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"a": 1, "b": "ok"}\n'
        "{broken json!!\n"
        '{"a": 3, "b": "fine"}\n'
    )
    return str(p)


def test_permissive_quarantines_corrupt_rows(spark, mixed_file):
    # Spark refuses queries that reference ONLY _corrupt_record (the
    # parser would need a wasteful re-parse); cache the parsed frame
    # first — the documented pattern for quarantine splits.
    df = (
        spark.read.schema(SCHEMA)
        .option("mode", "PERMISSIVE")
        .json(mixed_file)
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert sorted(r.a for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "{broken" in bad.collect()[0]._corrupt_record


def test_failfast_raises(spark, mixed_file):
    df = (
        spark.read.schema("a long, b string")
        .option("mode", "FAILFAST")
        .json(mixed_file)
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_dropmalformed_keeps_good_rows(spark, mixed_file):
    df = (
        spark.read.schema("a long, b string")
        .option("mode", "DROPMALFORMED")
        .json(mixed_file)
    )
    assert sorted(r.a for r in df.collect()) == [1, 3]
