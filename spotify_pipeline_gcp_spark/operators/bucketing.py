"""Bucketed tables: co-located joins and aggregations without shuffle.

At 100 TB the dominant recurring cost is re-shuffling the same fact
table on the same key for every join/aggregate. Bucketing pays that
shuffle ONCE at write time: both sides of a same-key join read
pre-hashed buckets, and the join plans with zero Exchange. This is
the static twin of AQE — AQE optimizes a single query at runtime;
bucketing optimizes a *workload* at layout time.

Bucket count guidance: target ~128-512 MB per bucket-file at the
expected table size; the two join sides need equal (or multiple)
bucket counts on the same keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table in the
    session catalog. Sorting within buckets additionally enables
    merge-join without a sort step."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, keys[0], *keys[1:]
    )
    if sort_by:
        writer = writer.sortBy(sort_by[0], *sort_by[1:])
    writer.saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    plans as a zero-shuffle SortMergeJoin over aligned buckets."""
    return spark.table(left_table).join(
        spark.table(right_table), on=list(on), how=how
    )
