"""Delta-load semantics: anti-join append, idempotency (FIXTURES §F3)."""

from __future__ import annotations

from spotify_pipeline_gcp_spark.operators.delta import delta_append
from spotify_pipeline_gcp_spark.sinks.writers import ParquetWarehouse


def _batch(spark, rows):
    return spark.createDataFrame(rows, "played_at string, track_id string, v long")


def test_delta_append_filters_existing(spark):
    existing = _batch(spark, [("t1", "a", 1), ("t2", "b", 2)])
    new = _batch(spark, [("t2", "b", 2), ("t3", "c", 3)])
    out = delta_append(new, existing, ["played_at"])
    assert [r.played_at for r in out.collect()] == ["t3"]


def test_delta_append_idempotent(spark):
    batch = _batch(spark, [("t1", "a", 1), ("t2", "b", 2)])
    assert delta_append(batch, batch, ["played_at", "track_id"]).count() == 0


def test_warehouse_roundtrip_idempotent(spark, tmp_path):
    """Full curated->warehouse cycle: second load appends 0 rows
    (ref playback_pipeline_curated.py:89-123, 207-208)."""
    wh = ParquetWarehouse(spark, str(tmp_path))
    batch = _batch(spark, [("t1", "a", 1), ("t2", "b", 2), ("t3", "c", 3)])

    first = (
        delta_append(batch, wh.scan("plays"), ["played_at"])
        if wh.exists("plays")
        else batch
    )
    wh.append(first, "plays")
    assert wh.scan("plays").count() == 3

    second = delta_append(batch, wh.scan("plays"), ["played_at"])
    assert second.count() == 0  # idempotent reload

    later = _batch(spark, [("t3", "c", 3), ("t4", "d", 4)])
    wh.append(delta_append(later, wh.scan("plays"), ["played_at"]), "plays")
    assert wh.scan("plays").count() == 4
    # predicate-pushdown scan path
    assert wh.scan("plays", "played_at = 't4'").count() == 1


def test_warehouse_auto_recovers_aside_rename(spark, tmp_path):
    # simulate a crash between delete_keys' rename-aside and the
    # move-in: the table exists only under <table>.old; the next
    # access must transparently rename it back.
    import os

    wh = ParquetWarehouse(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    wh.append(df, "t")
    os.rename(str(tmp_path / "t"), str(tmp_path / "t.old"))
    assert wh.exists("t")  # recovery happened
    assert wh.scan("t").count() == 2
    assert not os.path.isdir(str(tmp_path / "t.old"))


def test_merge_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.sinks.writers import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    # first merge on a missing table creates it
    wh.merge_upsert(base, "t", ["id"])
    assert wh.scan("t").count() == 3

    # update id=2, insert id=4; 1 and 3 untouched
    delta = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    wh.merge_upsert(delta, "t", ["id"])
    got = {r.id: (r.name, r.v) for r in wh.scan("t").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    # duplicate incoming keys are refused, table unchanged
    import pytest

    bad = spark.createDataFrame(
        [(5, "x", 1.0), (5, "y", 2.0)], "id long, name string, v double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        wh.merge_upsert(bad, "t", ["id"])
    assert wh.scan("t").count() == 4

    # idempotent: merging the same delta again is a no-op in effect
    wh.merge_upsert(delta, "t", ["id"])
    assert {r.id: (r.name, r.v) for r in wh.scan("t").collect()} == got


def test_compact_small_files(spark, tmp_path):
    import glob as g

    from spotify_pipeline_gcp_spark.sinks.writers import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    # ten tiny appends -> many small files (the incremental-load shape)
    for i in range(10):
        wh.append(
            spark.range(i * 100, (i + 1) * 100).selectExpr(
                "id", "id * 2 AS v"
            ).repartition(4),
            "t",
        )
    before = len(g.glob(str(tmp_path / "wh" / "t" / "*.parquet")))
    assert before >= 20
    total = wh.scan("t").count()
    after = wh.compact("t")
    assert after < before // 4
    # content unchanged
    assert wh.scan("t").count() == total
    assert wh.scan("t").agg({"v": "sum"}).first()[0] == sum(
        2 * i for i in range(1000)
    )


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    import pytest as _pytest

    from spotify_pipeline_gcp_spark.sinks.writers import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    # write a hive-partitioned table directly into the warehouse dir
    df = spark.range(100).selectExpr("id", "id % 3 AS part")
    df.write.partitionBy("part").parquet(str(tmp_path / "wh" / "t"))
    with _pytest.raises(ValueError, match="partitioned layout"):
        wh.compact("t")
    # layout untouched by the refusal
    assert wh.scan("t").count() == 100
