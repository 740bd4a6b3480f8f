"""Salted aggregation / join correctness vs the unsalted plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.skew import (
    salted_agg_sum_count,
    salted_join_left_hot,
)


def _skewed(spark):
    # one hot key (90%) + tail
    rows = [(1, "hot", float(i % 7)) for i in range(900)]
    rows += [(i, f"k{i % 10}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.k: (r.sum_value, r.n_rows)
        for r in salted_agg_sum_count(df, ["k"], "v", buckets=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = sorted(
        (r.id, r.label) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r.id, r.label)
        for r in salted_join_left_hot(left, right, "k", buckets=8).collect()
    )
    assert salted == plain
    # left rows with unmatched keys preserved under left join
    lp = sorted(
        (r.id, r.label)
        for r in salted_join_left_hot(left, right, "k", buckets=8, how="left").collect()
    )
    lp_plain = sorted(
        (r.id, r.label) for r in left.join(right, "k", "left").collect()
    )
    assert lp == lp_plain
