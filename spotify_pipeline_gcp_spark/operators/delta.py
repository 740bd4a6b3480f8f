"""Incremental (delta) load semantics — pure anti-join, no collect.

The reference's delta load (``/root/reference/spark_jobs/
playback_pipeline_curated.py:89-123``) collects the new batch's
``played_at`` keys to the driver, string-builds a ``WHERE played_at IN
(...)`` SQL pushed to the warehouse, then left-anti-joins new vs
existing. The driver collect is a scalability cliff: at 100 TB the key
set no longer fits in driver memory, and the IN-list no longer fits in
a SQL statement. Here the same semantics are one distributed plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def delta_append(
    new_batch: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Rows of ``new_batch`` whose key is absent from ``existing``.

    Ref J2 (``playback_pipeline_curated.py:110``):
    ``join(existing, ['played_at'], 'leftanti')`` — "only upload track
    if it doesn't already exist". Loading the same batch twice appends
    zero rows (idempotency, the pipeline's core invariant).

    Scale notes: the anti-join shuffles both sides on ``keys`` unless
    the existing-key side is small enough to broadcast — for a daily
    delta against a bounded recent window (the reference filters
    existing to exactly the incoming key range) AQE broadcasts it. For
    unbounded warehouses, partition the sink by ingest date and
    anti-join only the overlapping partitions.
    """
    return new_batch.join(existing.select(*keys), on=list(keys), how="left_anti")
