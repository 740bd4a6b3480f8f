"""Query registry: every operator exposed through the driver contract.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
(optionally) an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. The driver compares row-count + schema + order-insensitive
value-hash, with columns sorted by name — so both sides must agree on
column NAMES and value REPRESENTATION exactly (see helpers in
``queries/compat.py`` for float-safe rounding shared by both sides).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}

# Registration order matters: the driver's correctness record keeps
# the FIRST 50 registered queries. The window ROTATES each round so
# every query gets a driver row at most one round stale: round 3
# leads with the relational/extra/relational2 breadth set (28
# queries — driver-verified in r01, but only selfcheck-verified in
# r02 while the extension families held the window), followed by the
# modules that changed or gained queries this round (dedup,
# streaming, corpus, then similarity ordered so the round's flagship
# new query qs7 sits inside the 50th slot). Round 3's new-query
# demand exceeded 50: outside the window sit the late additions
# (qs9, qe1, qm3, qm4 — selfcheck-green, first candidates for r4's
# window), the unchanged r02-green qs2/qs3/qs5 + multimodal/text/
# sampling/core tails, and the rows-only BLAS twins (qs4/qs6/qs8,
# fold agreement pytest-asserted). Run tools/window_check.py after
# any registration change; tools/selfcheck.py re-verifies the FULL
# registry against the same oracles every run regardless.
_MODULES = [
    "spotify_pipeline_gcp_spark.queries.relational",
    "spotify_pipeline_gcp_spark.queries.extra",
    "spotify_pipeline_gcp_spark.queries.relational2",
    "spotify_pipeline_gcp_spark.queries.dedup",
    "spotify_pipeline_gcp_spark.queries.streaming",
    "spotify_pipeline_gcp_spark.queries.corpus",
    "spotify_pipeline_gcp_spark.queries.similarity",
    "spotify_pipeline_gcp_spark.queries.multimodal",
    "spotify_pipeline_gcp_spark.queries.text",
    "spotify_pipeline_gcp_spark.queries.sampling",
    "spotify_pipeline_gcp_spark.queries.core",
]


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
