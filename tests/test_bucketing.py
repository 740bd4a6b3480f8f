"""Bucketed co-located join: correctness + zero-shuffle plan."""

from __future__ import annotations

import pytest

from spotify_pipeline_gcp_spark.operators.bucketing import (
    co_located_join,
    write_bucketed,
)
from spotify_pipeline_gcp_spark.plans.inspect import exchange_count


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li = lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_by=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["o_orderkey"], 4, sort_by=["o_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the non-broadcast path so the shuffle-elimination is visible
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, left, right, ["o_orderkey"])
        assert exchange_count(joined) == 0  # buckets align: no Exchange
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert n == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
