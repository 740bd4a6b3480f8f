"""Executed micro-batch plan capture for streaming queries.

A streaming query's registered callable returns the DRAINED sink as a
batch DataFrame, so ``df.explain()`` on the result describes a
parquet/memory read — not the micro-batch execution (watermarks,
stateful operators, stream-static joins) that actually ran. PLANS.md
rows for qst queries were therefore blank (r6 verdict item #6).

This module is the capture point: every completed stream records its
executed plan text here under the rolling key ``LAST`` —
``StreamingQuery.explainInternal`` for writeStream sinks (the plan of
the LAST micro-batch, available after ``awaitTermination``), or the
executed batch plan of the sink-side DataFrame for foreachBatch
operators (where the real DAG runs in batch-land per batch).
``tools/plan_report.py`` runs each qst query and reads the capture;
tests assert on it (test_plans pins qst3's stream-static broadcast).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

LAST = "__last__"

_PLANS: dict[str, str] = {}


def record(name: str, text: str) -> None:
    _PLANS[name] = text


def get(name: str = LAST) -> str | None:
    return _PLANS.get(name)


def record_query(sq, name: str = LAST) -> None:
    """Capture the last micro-batch plan of a (terminated) streaming
    query. ``explainInternal(True)`` includes the physical plan with
    codegen markers; a query that processed zero batches raises
    inside Spark, which we swallow — no batch, no plan."""
    try:
        record(name, sq._jsq.explainInternal(True))  # noqa: SLF001
    except Exception:  # noqa: BLE001
        pass


def record_batch(df: DataFrame, name: str = LAST) -> None:
    """Capture the EXECUTED plan of a foreachBatch sink-side frame
    (call after the batch's writes ran)."""
    try:
        record(
            name,
            df._jdf.queryExecution().executedPlan().toString(),  # noqa: SLF001
        )
    except Exception:  # noqa: BLE001
        pass


def text_metrics(plan: str) -> dict[str, object]:
    """The PLANS.md metrics (exchanges / joins / codegen spans)
    computed from captured tree-format plan text — the streaming
    twin of ``plans/inspect.py``'s formatted-plan parsers, plus the
    stateful operators batch plans cannot have."""
    joins = sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        )
    )
    stateful = sorted(
        set(
            re.findall(
                r"(StateStoreSave|SessionWindowStateStoreSave|"
                r"FlatMapGroupsInPandasWithState|"
                r"TransformWithStateInPySpark\w*|StreamingDeduplicate\w*)",
                plan,
            )
        )
    )
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "joins": joins,
        "stateful": stateful,
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }
