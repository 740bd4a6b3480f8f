"""Skew mitigation: explicit salting for hot keys.

AQE's skew-join splitting (on in `session.py`) handles most cases at
runtime; explicit salting remains necessary for (a) skewed
*aggregations* (AQE does not split agg partitions) and (b) joins where
one key dominates so heavily that even split partitions overwhelm a
task. These helpers implement the standard two-level pattern with
deterministic pseudo-random salt (hash of the full row key-set, not
``rand()`` — reproducible across retries, which matters for
exactly-once sinks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) derived from row content."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_agg_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-level aggregation for skewed group keys.

    Level 1 groups on (keys + salt) — the hot key's rows spread over
    ``buckets`` partitions; level 2 merges the partials. Output:
    (keys..., sum_value, n_rows). Algebraic aggregates (sum/count/min/
    max, and avg as sum/count) re-associate exactly; holistic ones
    (median) need different machinery (t-digest sketches).
    """
    all_cols = [c for c in df.columns]
    lvl1 = (
        df.withColumn("_salt", _salt(all_cols, buckets))
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return lvl1.groupBy(*keys).agg(
        F.sum("_psum").alias("sum_value"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join_left_hot(
    left: DataFrame,
    right: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when ``left`` has hot keys and ``right`` is
    small-per-key (dimension-like).

    Left rows get a deterministic salt in [0, buckets); right rows are
    replicated once per salt value (explode over a literal range).
    The join key becomes (key, salt), so a hot key's rows land on
    ``buckets`` different reducers instead of one. Right-side
    replication cost = |right| × buckets — apply only when right is
    small (else prefer AQE skew split or broadcast).

    ``how`` is restricted to left-preserving types: under right/full
    outer joins every unmatched REPLICA of a right row would survive,
    emitting ``buckets`` duplicates per unmatched right row.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join_left_hot supports {sorted(allowed)}; got {how!r} "
            "(right/full outer would duplicate unmatched right rows "
            "once per salt replica)"
        )
    salted_left = left.withColumn("_salt", _salt(left.columns, buckets))
    salted_right = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    out = salted_left.join(salted_right, on=[key, "_salt"], how=how)
    return out.drop("_salt")
