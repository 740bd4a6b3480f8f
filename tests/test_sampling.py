"""Deterministic sampling / split-assignment units."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.sampling import (
    assign_splits,
    fraction_to_hex_threshold,
    hash_sample,
    split_column,
)


def test_threshold_encoding():
    assert fraction_to_hex_threshold(0.0) == "00000000"
    assert fraction_to_hex_threshold(0.25) == "40000000"
    assert fraction_to_hex_threshold(0.5) == "80000000"
    assert fraction_to_hex_threshold(1.0) == "g"  # above any hex digest
    with pytest.raises(ValueError):
        fraction_to_hex_threshold(1.5)


def _docs(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_hash_sample_matches_python_md5(spark):
    got = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.25, "s:").collect()}
    want = {
        i
        for i in range(2000)
        if hashlib.md5(f"s:{i}".encode()).hexdigest() < "40000000"
    }
    assert got == want
    assert 0.2 < len(got) / 2000 < 0.3  # roughly the asked fraction


def test_sample_stable_under_repartition(spark):
    df = _docs(spark)
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.1, "x").collect()}
    b = {r.doc_id for r in hash_sample(df.repartition(17), "doc_id", 0.1, "x").collect()}
    assert a == b


def test_salt_decorrelates(spark):
    df = _docs(spark)
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.5, "s1").collect()}
    b = {r.doc_id for r in hash_sample(df, "doc_id", 0.5, "s2").collect()}
    assert a != b
    overlap = len(a & b) / len(a)
    assert 0.3 < overlap < 0.7  # independent halves overlap ~50%


def test_split_partition_of_rows(spark):
    df = assign_splits(
        _docs(spark), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, "v:"
    )
    counts = {r.split: r.n for r in df.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # every row exactly one split
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_stable_under_growth(spark):
    # The first 1000 keys keep their split when 1000 more arrive.
    small = assign_splits(_docs(spark, 1000), "doc_id", {"a": 0.5, "b": 0.5})
    big = assign_splits(_docs(spark, 2000), "doc_id", {"a": 0.5, "b": 0.5})
    small_map = {r.doc_id: r.split for r in small.collect()}
    big_map = {r.doc_id: r.split for r in big.collect()}
    assert all(big_map[k] == v for k, v in small_map.items())


def test_split_column_single_bucket(spark):
    df = _docs(spark, 10).withColumn("s", split_column("doc_id", {"only": 1.0}))
    assert {r.s for r in df.collect()} == {"only"}


def test_stratified_sample_rates_and_determinism(spark):
    from spotify_pipeline_gcp_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 3 else "zh") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "doc_id", "lang", {"en": 0.2, "zh": 1.0}, salt="t:"
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in got}
    assert by_lang["zh"] == 1000  # fraction 1.0 keeps every row
    assert 300 < by_lang["en"] < 500  # ~20% of 2000
    # deterministic: second run identical membership
    again = {
        r.doc_id
        for r in stratified_sample(
            df, "doc_id", "lang", {"en": 0.2, "zh": 1.0}, salt="t:"
        ).collect()
    }
    assert again == {r.doc_id for r in out.collect()}
    # strata not in the map use default_fraction (0.0 -> dropped)
    df2 = spark.createDataFrame([(1, "fr")], "doc_id long, lang string")
    assert stratified_sample(df2, "doc_id", "lang", {"en": 1.0}).count() == 0


def test_domain_mixture_sample_proportions(spark):
    from spotify_pipeline_gcp_spark.operators.sampling import (
        domain_mixture_sample,
    )

    rows = [(i, f"src{i % 4}") for i in range(4000)]  # 1000 per domain
    df = spark.createDataFrame(rows, "doc_id long, source string")
    target = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = domain_mixture_sample(df, "doc_id", "source", target, salt="t:")
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # src3 is not in the target: dropped entirely
    assert "src3" not in counts
    # cap = min(1000/0.5, 1000/0.3, 1000/0.2) = 2000
    # expected keeps: src0 1000 (frac 1.0), src1 600, src2 400
    assert counts["src0"] == 1000
    assert abs(counts["src1"] - 600) < 80   # Bernoulli tolerance ~3 sigma
    assert abs(counts["src2"] - 400) < 80
    # deterministic: second draw identical row-for-row
    again = domain_mixture_sample(df, "doc_id", "source", target, salt="t:")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_temperature_plan_flattens_mixture(spark):
    from spotify_pipeline_gcp_spark.operators.sampling import temperature_plan

    # 1600 vs 100 docs: natural ratio 16:1, sqrt-temperature ratio 4:1
    rows = [(i, "big") for i in range(1600)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r.source: r for r in temperature_plan(
        df, "doc_id", "source", budget=500, salt="tp:"
    ).collect()}
    assert out["big"].n_docs == 1600 and out["small"].n_docs == 100
    # weight_q = floor(1e6 * sqrt(n)): 40e6 vs 10e6 -> 4:1
    assert out["big"].weight_q == 40_000_000
    assert out["small"].weight_q == 10_000_000
    assert out["big"].target_docs == 400 and out["small"].target_docs == 100
    # realized Bernoulli counts track targets (3-sigma-ish tolerance)
    assert abs(out["big"].kept_docs - 400) < 60
    assert abs(out["small"].kept_docs - 100) < 30
    # deterministic across invocations
    again = {r.source: r.kept_docs for r in temperature_plan(
        df, "doc_id", "source", budget=500, salt="tp:"
    ).collect()}
    assert again == {s: r.kept_docs for s, r in out.items()}


def test_exact_quota_sample_counts_and_determinism(spark):
    from spotify_pipeline_gcp_spark.operators.sampling import (
        exact_quota_sample,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = exact_quota_sample(df, "doc_id", "lang", quota=50, salt="q:")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # exact quota where the stratum is big enough, whole stratum else
    assert counts == {"big": 50, "small": 50}
    small_quota = exact_quota_sample(df, "doc_id", "lang", quota=200, salt="q:")
    c2 = {r["lang"]: r["n"] for r in small_quota.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert c2 == {"big": 200, "small": 100}
    # deterministic + nested: the 50-quota draw is a subset of the 200
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in small_quota.collect()}
    assert a < b
