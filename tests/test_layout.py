"""Z-order layout: key properties + measured file-pruning benefit."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from spotify_pipeline_gcp_spark.operators.layout import (
    with_zorder_key,
    write_parquet_zordered,
)

SF_DIR = "/root/testdata/sf0.01"


def test_zorder_key_interleaves_and_orders(spark):
    # 2 cols, 2 bits: grid corners get the classic Morton codes
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.zkey
        for r in with_zorder_key(df, ["x", "y"], bits=2).collect()
    }
    # scaled values == raw values here (min 0, max 3, 2 bits);
    # x owns even bit positions, y odd: z(x,y) = interleave(x, y)
    assert got[(0, 0)] == 0b0000
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    assert got[(1, 2)] == 0b1001  # x=01, y=10 -> bits y1 x1 y0 x0

    # constant column drops out (zero-span guard), no division error
    const = spark.createDataFrame([(1, 7), (2, 7)], "x long, y long")
    ks = {r.x: r.zkey for r in with_zorder_key(const, ["x", "y"], bits=2).collect()}
    assert ks[1] < ks[2]


def test_zorder_key_guards(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="exceeds a signed long"):
        with_zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one column"):
        with_zorder_key(df, [])


def _file_span(md, col: str) -> tuple[float, float]:
    idx = next(
        j
        for j in range(md.num_columns)
        if md.row_group(0).column(j).path_in_schema == col
    )
    lo = min(
        md.row_group(i).column(idx).statistics.min
        for i in range(md.num_row_groups)
    )
    hi = max(
        md.row_group(i).column(idx).statistics.max
        for i in range(md.num_row_groups)
    )
    return lo, hi


def _files_matching(path: str, preds: list[tuple[str, float]]) -> tuple[int, int]:
    """(matching, total): files whose footer min/max spans cover EVERY
    (col, value) predicate — what a conjunctive filtered scan reads."""
    hits, total = 0, 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        total += 1
        ok = True
        for col, value in preds:
            lo, hi = _file_span(md, col)
            if not lo <= value <= hi:
                ok = False
                break
        if ok:
            hits += 1
    return hits, total


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    # events z-ordered by (user_id, event_id) — both ~uniform: a point
    # predicate on EITHER column must match far fewer files than a
    # hash-shuffled write of the same data into the same file count
    from spotify_pipeline_gcp_spark.queries.compat import table

    events = table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    z_path = str(tmp_path / "z")
    plain_path = str(tmp_path / "plain")
    write_parquet_zordered(events, z_path, ["user_id", "event_id"], n_files=16)
    events.repartition(16).write.mode("overwrite").parquet(plain_path)

    uid = events.selectExpr("percentile(user_id, 0.5)").first()[0]
    eid = events.selectExpr("percentile(event_id, 0.5)").first()[0]

    z_u, z_total = _files_matching(z_path, [("user_id", uid)])
    p_u, p_total = _files_matching(plain_path, [("user_id", uid)])
    z_e, _ = _files_matching(z_path, [("event_id", eid)])
    p_e, _ = _files_matching(plain_path, [("event_id", eid)])
    z_both, _ = _files_matching(z_path, [("user_id", uid), ("event_id", eid)])
    p_both, _ = _files_matching(plain_path, [("user_id", uid), ("event_id", eid)])

    # hash-shuffled files all span the full domain; z-ordered files
    # cover contiguous curve segments. Single-dim matches depend on
    # where sampled range boundaries fall (a fixed-coordinate plane
    # crosses ~sqrt(files) curve segments), so assert improvement per
    # dim and STRONG pruning on the conjunction — the selectivity
    # z-order exists for
    assert p_u == p_total and p_e == p_total and p_both == p_total
    assert z_u < p_u and z_e < p_e
    assert z_both <= z_total // 4

    # layout changes bytes-on-disk only, never content
    assert (
        spark.read.parquet(z_path).orderBy("event_id").collect()
        == events.orderBy("event_id").collect()
    )


def test_zorder_skewed_dim_prunes_weakly(spark, tmp_path):
    # the documented min/max-scaling limit: a heavily skewed column
    # (events.value, p50 ~7% of max) compresses into few codes, so
    # its pruning degrades while the uniform co-dimension keeps
    # pruning — the signal to pre-transform (log) or rank-scale a
    # skewed z-order column in production
    from spotify_pipeline_gcp_spark.queries.compat import table

    events = table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    z_path = str(tmp_path / "zskew")
    write_parquet_zordered(events, z_path, ["user_id", "value"], n_files=16)
    uid = events.selectExpr("percentile(user_id, 0.5)").first()[0]
    z_u, z_total = _files_matching(z_path, [("user_id", uid)])
    assert z_u < z_total  # uniform dim still prunes
