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
# Round-13 window (r12 verdict item #1 — retire the r10 staleness
# debt before it becomes the project's first >2-round breach):
# changed-code leads first — the SEVEN queries whose code changed
# this round (qd3b/qd8/qd12: the single-pass window rewrite of
# ``ngram_jaccard_pairs``' capped path; qd5/qd14: the n_docs
# count-probe hint + spool cleanup around ``minhash_lsh_pairs``;
# qst6: the bounded-gate (id, digest) verdict key in ``export_gate``;
# qst5: safety seat — its chain shares the minhash/store operators
# whose signatures changed) — then ALL 43 queries whose last
# driver row is r10 (the cross-round union in VERDICT r12 "What's
# missing" #1; at r13 they'd be 3 rounds stale). 7 + 43 = exactly 50.
# The 45 r11-latest queries are 2 rounds stale after this round —
# still inside policy — and form the r14 tranche. Run
# tools/window_check.py after any registration change;
# tools/selfcheck.py re-verifies the FULL registry every round.
_WINDOW_ORDER = [
    # changed-code leads (r12 verdict items #2/#6/#7 + ADVICE)
    "qd3b_ngram_jaccard_capped",
    "qd5_minhash_lsh_pairs",
    "qd8_dedup_components",
    "qd12_keep_best_per_cluster",
    "qd14_near_dup_export",
    "qst5_streaming_incremental_near_dup",
    "qst6_streaming_export_gate",
    # r10-stale breadth — VERDICT r12 "What's missing" #1 (all 43)
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
    "qs21_ann_recall_audit",
    "qs22_ann_index_maintenance",
]

# Pinned-size exactness baselines (r7 verdict item #5): kept
# registered — they anchor every sized/sampled variant's correctness —
# but DEMOTED to the end of the registry order so a user scanning
# ``queries()`` reaches the production-shaped sibling (qs13, qs16,
# qs14, qd3b, qd9b) first; each docstring fronts the same cross-link.
_PINNED_BASELINES = [
    "qs3_cosine_topk_bucketed",
    "qs7_cosine_topk_ivf_kmeans",
    "qs11_cosine_topk_ivf_kmeans_multiprobe",
    "qd3_ngram_jaccard_pairs",
    "qd9_simhash_pairs",
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
        if name not in ordered and name not in _PINNED_BASELINES:
            ordered[name] = spec
    for name in _PINNED_BASELINES:
        if name in REGISTRY and name not in ordered:
            ordered[name] = REGISTRY[name]
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
