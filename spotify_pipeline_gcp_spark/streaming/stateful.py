"""Custom stateful streaming operators.

Two shapes beyond built-in streaming aggregates:

- ``running_user_totals``: arbitrary per-key state with
  ``applyInPandasWithState`` — the escape hatch for operators the
  built-in state machinery can't express (custom session logic,
  decaying counters, model state). State lives in the state store,
  partitioned by key: scales with distinct keys, not history.
- ``foreach_batch_delta_append``: exactly-once-effect incremental
  sink — each micro-batch anti-joins the warehouse before appending
  (the reference's delta-load invariant, applied per batch), so
  replayed batches after failure are idempotent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Cumulative per-user totals across micro-batches via
    ``applyInPandasWithState``. Each batch emits the updated totals
    for users seen in that batch; state persists between batches."""
    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(events_stream.sparkSession)
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_delta_append(
    stream_df: DataFrame,
    warehouse,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
) -> None:
    """Incremental warehouse load as a streaming sink: per micro-batch
    delta-append (anti-join against current warehouse state, then
    append). Idempotent under batch replay — the streaming twin of
    the reference's daily delta load."""
    from spotify_pipeline_gcp_spark.operators.delta import delta_append

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        fresh = (
            delta_append(batch_df, warehouse.scan(table), keys)
            if warehouse.exists(table)
            else batch_df
        )
        warehouse.append(fresh.dropDuplicates(keys), table)
        from spotify_pipeline_gcp_spark.streaming import lastplan

        lastplan.record_batch(fresh)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _make_update_totals_ttl(ttl_ms: int):
    def _update_totals_ttl(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "closed": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        max_ts_ms = None
        for pdf in pdfs:
            if len(pdf) == 0:
                # an empty chunk would make ts.max() return NaT and
                # the epoch conversion raise
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            # epoch ms straight from the datetime64[ns] payload
            # (Timestamp.value is the raw ns count): no float round
            # trip, and the naive value is interpreted as-is. Spark
            # rebases timestamps to spark.sql.session.timeZone before
            # Arrow transfer, so comparing against the (UTC epoch-ms)
            # watermark is only correct in a UTC session —
            # session.py pins it; see user_totals_with_ttl.
            batch_max = int(pdf["ts"].max().value // 1_000_000)
            max_ts_ms = (
                batch_max if max_ts_ms is None else max(batch_max, max_ts_ms)
            )
        state.update((n, total))
        # event-time TTL: expire once the WATERMARK passes the key's
        # last event time + ttl — a real idle gap, so a key that stays
        # active within its ttl keeps its totals across microbatches.
        # Spark rejects timeouts <= the current watermark, hence the
        # watermark+1 floor (a key already idle past its ttl closes at
        # the next watermark advance).
        wm = state.getCurrentWatermarkMs()
        timeout = wm + 1 if max_ts_ms is None else max(max_ts_ms + ttl_ms, wm + 1)
        state.setTimeoutTimestamp(timeout)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "closed": [False],
            }
        )

    return _update_totals_ttl


def user_totals_with_ttl(
    events_stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Per-user running totals whose state EXPIRES: event-time TTL via
    ``GroupStateTimeout.EventTimeTimeout`` — when the watermark passes
    a key's timeout timestamp, the function is invoked once more with
    ``hasTimedOut`` and emits a final ``closed=True`` row while
    removing the state. This is the bounded-state contract every
    long-running keyed aggregation needs at scale: state size tracks
    ACTIVE keys, not all keys ever seen. The timeout is the key's
    last event time + ``ttl_ms`` (floored at watermark+1, which Spark
    requires), so a key expires only after a real idle gap — and
    because it is watermark-driven (not wall clock), expiry is
    deterministic under replay and testable with AvailableNow.

    Requires a UTC session (``session.py`` pins
    ``spark.sql.session.timeZone=UTC``): Spark rebases event
    timestamps to the session zone before they reach pandas, while
    ``GroupState.getCurrentWatermarkMs`` is UTC epoch ms — in any
    other zone the TTL comparison would be skewed by the offset.
    """
    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(events_stream.sparkSession)
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_totals_ttl(ttl_ms),
            outputStructType=SESSION_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals on the Spark 4 ``transformWithState``
    API — the successor to ``applyInPandasWithState`` (typed state
    handles: ValueState/ListState/MapState + timers, state schema
    evolution, RocksDB-backed at scale). Same semantics as
    ``running_user_totals``; kept side-by-side so both state APIs
    stay covered — new deployments should prefer this one.

    Env-gated: the transformWithState Python runner speaks protobuf
    to the JVM state server, so ``google.protobuf`` must be
    installed (it is not bundled with PySpark). Without it the
    runner crashes deep in stream initialization — fail loudly at
    the API boundary instead (the same injected-seam policy as the
    HTTP fetcher and image codec).
    """
    import importlib.util

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        has_protobuf = False
    if not has_protobuf:
        raise NotImplementedError(
            "transformWithStateInPandas requires the google.protobuf "
            "package (PySpark's state-server protocol); install "
            "protobuf or use running_user_totals "
            "(applyInPandasWithState) which has identical semantics"
        )
    from pyspark.sql.streaming import StatefulProcessor

    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    ensure_package_on_workers(events_stream.sparkSession)
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        TotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
