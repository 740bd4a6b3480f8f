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
# every query gets a driver row at most one round stale. Rotation is
# now an explicit list edit: ``_WINDOW_ORDER`` below is applied after
# module import, so module order no longer determines the window.
#
# Round-7 window (r6 verdict item #2 — retire the r4 staleness debt):
# leads with the 24 queries whose LAST driver row is r4 (q24–q28 and
# q30–q48 — by r7 those rows were three rounds stale), then the six
# queries CHANGED this round (the trained-ANN family re-pointed at
# the digest-sample trainer: qs14/qs17/qs18/qs19; the bounded-corpus
# recall audit qs21; the qd14 oracle coalesce fix) plus the NEW
# qs22 index-maintenance, qs23 sized-BLAS-IVF (rows-only by design —
# BLAS ulp) and qs24 IMI-multiprobe queries, then backfills with the
# oldest r5-green core (q00–q16). Out of window: the
# remaining r5-green breadth (q17–q22, qs1–qs12, qt2–qt8, qsp2–qsp4,
# qm3/qm4, qst2/qst4/qst5, qp4, qd9) and the untouched r6-green rows
# (qs13/qs15/qs16/qs20, qt9–qt11, qd13, qsp5/qsp6, qp5/qp6, q49,
# qe2, qst6, + the r6-window r4 re-greens) — first in line for r8.
# Run tools/window_check.py after any registration change;
# tools/selfcheck.py re-verifies the FULL registry every round.
_WINDOW_ORDER = [
    # r4-stale relational breadth — the rotation debt named in
    # VERDICT r6 "What's missing" #1
    "q24_cross_join",
    "q25_except",
    "q26_intersect",
    "q27_string_funcs",
    "q28_null_handling",
    "q30_sessionize",
    "q31_asof_last_click",
    "q32_scalar_subquery",
    "q33_conditional_agg",
    "q34_array_agg_ops",
    "q35_exact_percentiles",
    "q36_approx_aggregates",
    "q37_unpivot",
    "q38_map_ops",
    "q39_date_arith",
    "q40_json_bag",
    "q41_big_orders_having",
    "q42_above_group_avg",
    "q43_ratio_metric",
    "q44_flagship_partition_ready",
    "q45_cube",
    "q46_range_frame",
    "q47_range_join",
    "q48_rank_battery",
    # changed this round — sample-trained ANN convergence (verdict
    # #1), bounded recall audit (verdict #4), qd14 oracle hardening
    "qs14_cosine_topk_ivf_kmeans_sized",
    "qs17_cosine_topk_imi",
    "qs18_pq_adc_topk",
    "qs19_cosine_topk_ivfpq",
    "qs21_ann_recall_audit",
    "qd14_near_dup_export",
    "qs22_ann_index_maintenance",
    "qs23_cosine_topk_ivf_blas_sized",
    "qs24_cosine_topk_imi_multiprobe",
    # oldest r5-green core backfill (flagship + relational base)
    "q00_flagship_pipeline",
    "q01_project_derived",
    "q02_filter_isin",
    "q03_explode_tokens",
    "q04_bag_collect",
    "q05_bag_join",
    "q06_delta_anti_join",
    "q07_distinct",
    "q08_pricing_summary",
    "q09_top_orders",
    "q10_segment_revenue_topn",
    "q11_window_topk",
    "q12_window_running",
    "q13_union_distinct",
    "q14_semi_join",
    "q15_date_trunc_daily",
    "q16_date_format_monthly",
]

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


def _apply_window_order() -> None:
    """Reorder ``REGISTRY`` in place so ``_WINDOW_ORDER`` names lead.

    Names in ``_WINDOW_ORDER`` that are not registered are an error
    (a typo here would silently mis-compose the driver window); any
    registered query not named keeps its module-registration order
    after the windowed prefix. A name may be listed before its query
    lands only if the module that will define it is still in
    ``_MODULES`` — enforcement happens post-import, so a missing name
    means a genuine typo or a removed query.
    """
    missing = [n for n in _WINDOW_ORDER if n not in REGISTRY]
    if missing:
        raise ValueError(f"_WINDOW_ORDER names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _WINDOW_ORDER}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


def load_all() -> dict[str, QuerySpec]:
    for mod in _MODULES:
        importlib.import_module(mod)
    _apply_window_order()
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
