"""Value-level tolerance checks for the q36 sketches' RAW estimates.

Since r10 the registered q36 is itself a HASH-VERIFIED tolerance
audit (it emits per-group booleans asserting each estimate inside its
bound; the oracle emits literal TRUEs). These tests pin the RAW
estimates — computed here with the same sketch expressions — at a
TIGHTER bound than the audit asserts, against the exact answer DuckDB
computes on the same parquet.

- ``approx_count_distinct`` (HLL++): default rsd = 0.05. The check
  asserts |est - exact| <= 5% of exact. Deterministic: the sketch
  hashes are fixed, so a pass is stable, and at these cardinalities
  HLL++'s sparse mode is near-exact anyway.
- ``percentile_approx`` (Greenwald-Khanna, accuracy = 10000): returns
  an actual data value whose RANK is within n/accuracy of the target
  rank. The check recomputes the returned value's rank interval
  exactly ([count(v < x), count(v <= x)]) and asserts it overlaps
  [0.9*n - n*eps - 1, 0.9*n + n*eps + 1] (±1 for the discrete rank
  floor at small n).
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.fixture(scope="module", params=SF_DIRS)
def q36_vs_exact(request, spark):
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.queries.compat import table

    sf_dir = request.param
    # the raw sketch estimates the registered q36 audits (same
    # expressions, same defaults)
    raw = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.9).alias("approx_p90"),
        )
    )
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_p90)
        for r in raw.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    return approx, con


def test_approx_count_distinct_within_rsd(q36_vs_exact):
    approx, con = q36_vs_exact
    exact = dict(
        con.execute(
            "SELECT l_returnflag, count(DISTINCT l_partkey)"
            " FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for flag, (est, _) in approx.items():
        tol = 0.05 * exact[flag]
        assert abs(est - exact[flag]) <= tol, (
            f"{flag}: approx_count_distinct={est} vs exact={exact[flag]} "
            f"(tolerance ±{tol:.1f})"
        )


def test_percentile_approx_within_rank_error(q36_vs_exact):
    approx, con = q36_vs_exact
    eps = 1.0 / 10_000  # percentile_approx default accuracy
    for flag, (_, p90) in approx.items():
        n, lt, le, eq = con.execute(
            """
            SELECT count(*),
                   count(*) FILTER (l_extendedprice < ?),
                   count(*) FILTER (l_extendedprice <= ?),
                   count(*) FILTER (l_extendedprice = ?)
            FROM lineitem WHERE l_returnflag = ?
            """,
            [p90, p90, p90, flag],
        ).fetchone()
        assert eq >= 1, f"{flag}: approx p90 {p90} is not a data value"
        target = 0.9 * n
        slack = eps * n + 1
        # the value's true rank interval must overlap the target±slack
        assert lt <= target + slack and le >= target - slack, (
            f"{flag}: p90={p90} rank interval [{lt}, {le}] outside "
            f"target {target:.1f} ± {slack:.1f} (n={n})"
        )
