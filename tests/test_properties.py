"""Property-based tests (hypothesis) for engine invariants.

Spark-touching properties keep ``max_examples`` small (a Spark round
trip per example); pure-Python helpers get the full default budget.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from spotify_pipeline_gcp_spark.sinks.landing import landing_path
from spotify_pipeline_gcp_spark.sources.rest import (
    cursor_after_midnight,
    extract_track_ids,
)

# ---- pure helpers: full example budget ------------------------------


@given(st.dates(min_value=dt.date(1990, 1, 2), max_value=dt.date(2100, 1, 1)))
def test_cursor_is_midnight_utc_of_previous_day(day):
    ms = cursor_after_midnight(day)
    back = dt.datetime.fromtimestamp(ms / 1000, tz=dt.timezone.utc)
    assert back.date() == day - dt.timedelta(days=1)
    assert (back.hour, back.minute, back.second, ms % 1000) == (0, 0, 0, 0)


@given(st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2100, 1, 1)))
def test_landing_path_zero_padded_and_sortable(day):
    p = landing_path("/root_zone", day, "f.json")
    parts = p.split("/")
    assert parts[-4:] == [
        str(day.year), f"{day.month:02d}", f"{day.day:02d}", "f.json"
    ]


@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="abc123", min_size=1, max_size=4)),
        max_size=20,
    )
)
def test_extract_track_ids_dedup_order(ids):
    doc = {"items": [{"track": {"id": i}} for i in ids]}
    out = extract_track_ids(doc)
    non_null = [i for i in ids if i]
    # order-preserving dedup
    assert out == list(dict.fromkeys(non_null))


# ---- Spark properties: bounded example budget -----------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="0123456789-", min_size=0, max_size=10), max_size=8
    )
)
def test_complete_year_only_pads_4char(spark, values):
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.functions.exprs import complete_year

    df = spark.createDataFrame([(v,) for v in values] or [("x",)], "d string")
    out = df.select("d", complete_year("d").alias("c")).collect()
    for r in out:
        if r.d is not None and len(r.d) == 4:
            assert r.c == r.d + "-12-31"
        else:
            assert r.c == r.d


@settings(max_examples=6, deadline=None)
@given(
    new=st.lists(st.integers(0, 30), min_size=1, max_size=15, unique=True),
    existing=st.lists(st.integers(0, 30), max_size=15, unique=True),
)
def test_delta_append_set_semantics(spark, new, existing):
    from spotify_pipeline_gcp_spark.operators.delta import delta_append

    ndf = spark.createDataFrame([(k,) for k in new], "k long")
    edf = (
        spark.createDataFrame([(k,) for k in existing], "k long")
        if existing
        else spark.createDataFrame([], "k long")
    )
    got = sorted(r.k for r in delta_append(ndf, edf, ["k"]).collect())
    assert got == sorted(set(new) - set(existing))


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**12))
def test_index_sizing_replays_in_sql_at_any_scale(n):
    # The auto-sized indexes are hash-verified only at test corpora
    # sizes; this pins the CROSS-ENGINE sizing arithmetic itself —
    # Python operators vs the exact SQL the oracles embed — for
    # corpus counts up to 10^12 (the 100 TB regime), so a sizing
    # divergence can never appear only beyond the tested scales.
    import duckdb

    from spotify_pipeline_gcp_spark.operators.similarity import (
        imi_cells_for,
        sign_bits_for,
        trained_cells_for,
    )

    # the REAL shared oracle snippet (qs13/qs23/qs9/qs15/qd7b/qd10 all
    # embed it via compat.SIZED_BITS_SQL), rebased from the view's
    # count(*) onto the generated n — drift in the constant itself now
    # fails here, not only at oracle-compare time
    from spotify_pipeline_gcp_spark.queries.compat import SIZED_BITS_SQL

    bits_sql = SIZED_BITS_SQL.replace("count(*)", "n")
    k_sql = "greatest(1, CAST(floor(sqrt(n)) AS BIGINT))"
    imi_sql = "greatest(2, CAST(ceil(sqrt(n / 256.0)) AS BIGINT))"
    expected_sql = "(n + greatest(1, CAST(floor(sqrt(n)) AS BIGINT)) - 1) // greatest(1, CAST(floor(sqrt(n)) AS BIGINT))"
    row = duckdb.sql(
        f"SELECT {bits_sql} AS bits, {k_sql} AS k, {imi_sql} AS ki, "
        f"{expected_sql} AS expected FROM (SELECT {n}::BIGINT AS n)"
    ).fetchone()
    assert row[0] == min(32, sign_bits_for(n))
    assert row[1] == trained_cells_for(n)
    assert row[2] == imi_cells_for(n)
    k = trained_cells_for(n)
    assert row[3] == (n + k - 1) // k


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**12),
    st.integers(min_value=1, max_value=10**6),
)
def test_train_fraction_replays_in_sql_at_any_scale(n, k):
    # min(1, 32k/n) as computed by _train_frac vs the oracles'
    # least(1.0, (32.0 * k) / n) — same IEEE double on both engines
    import duckdb

    from spotify_pipeline_gcp_spark.queries.similarity import _train_frac

    row = duckdb.sql(
        f"SELECT least(1.0, (32.0 * {k}) / n) FROM (SELECT {n}::BIGINT AS n)"
    ).fetchone()
    assert row[0] == _train_frac(n, k)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=32),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_cell_means_partition_invariant(spark, rows):
    # the quantized-integer positional mean must be BITWISE identical
    # under any partitioning/combine order — the property every
    # trainer's oracle-replayability rests on (exact BIGINT partials
    # commute; a float mean would not)
    from spotify_pipeline_gcp_spark.operators.similarity import _cell_means

    df = spark.createDataFrame(
        [(int(c), [float(x) for x in v], i) for i, (c, v) in enumerate(rows)],
        "cid long, u array<double>, id long",
    )
    a = {
        r.cid: r.mv for r in _cell_means(df.repartition(1), "cid").collect()
    }
    b = {
        r.cid: r.mv for r in _cell_means(df.repartition(7), "cid").collect()
    }
    assert a == b  # exact equality, not approx


def test_qt_all_literal_tolerates_missing_codes(spark):
    # ADVICE r8: a sub-codebook missing a mid-range cid (empty Lloyd
    # cluster) must yield a 0 table slot, not a plan-build KeyError —
    # such codes can never appear in pq_encode output for that book
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.operators.similarity import (
        _qt_all_literal,
    )

    full = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0]), (3, [0.5, 0.5])],
        "cid long, c array<double>",
    )
    gappy = spark.createDataFrame(  # missing cid=1 and cid=2
        [(0, [1.0, 0.0]), (3, [0.25, 0.75])], "cid long, c array<double>"
    )
    df = spark.createDataFrame([([1.0, 0.0, 0.0, 1.0],)], "u array<double>")
    out = df.select(
        _qt_all_literal([full, gappy], m=2, d_sub=2).alias("qt")
    ).collect()[0]["qt"]
    assert len(out) == 2 and len(out[0]) == 4 and len(out[1]) == 4
    assert out[1][1] == 0 and out[1][2] == 0  # absent codes -> 0 sentinel
    assert out[0][0] != 0  # present codes still score


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**12))
def test_simhash_sizing_replays_in_sql_at_any_scale(n):
    # qd9b's adaptive fingerprint width vs the exact SQL its oracle
    # embeds — the same cross-engine pin as the ANN sizings
    import duckdb

    from spotify_pipeline_gcp_spark.operators.dedup import simhash_bits_for

    w_sql = (
        "least(15, greatest(8, CAST(ceil(log2(greatest(1, n // 4)))"
        " AS BIGINT)))"
    )
    row = duckdb.sql(
        f"SELECT {w_sql} AS w FROM (SELECT {n}::BIGINT AS n)"
    ).fetchone()
    assert 4 * row[0] == simhash_bits_for(n)
