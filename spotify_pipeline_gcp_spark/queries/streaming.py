"""Structured Streaming queries (streaming/incremental.py).

``qst1`` runs a real streaming plan (file source -> stateful agg ->
memory sink) to completion under ``Trigger.AvailableNow`` and returns
the materialized result; because AvailableNow drains everything, the
result equals the batch GROUP BY and is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import sql_fixed
from spotify_pipeline_gcp_spark.streaming.incremental import (
    streaming_type_rollup,
)


@register(
    "qst1_streaming_type_rollup",
    oracle=f"""
    SELECT event_type, count(*)::BIGINT AS n,
           {sql_fixed('sum(value)')} AS sum_value
    FROM events GROUP BY event_type
    """,
)
def qst1_streaming_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming grouped aggregate over the events file source,
    complete mode, AvailableNow — the reference's daily batch cadence
    expressed as a stream (SURVEY §2.11)."""
    return streaming_type_rollup(spark, sf_dir)
