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
# Round-11 window (r10 verdict item #3 — retire the r8 staleness
# debt): qd6/qt6 lead (their CODE changed in r10 — simhash translate
# parity / NULL-gram coalesce — but their last driver row is r9;
# selfcheck-verified post-change, now recorded), then ALL 41 queries
# whose LAST driver row is r8 (the cross-round union in VERDICT r10;
# at r11 they'd be 3 rounds stale), then the queries THIS round's
# work touches: qs19b (first-ever driver row — the persisted IVFPQ
# store, HASH-VERIFIED as of r11: its dgemm assignment is
# quantized-exact, so the oracle replays it), qs25 (the
# factor1000 crash re-run, r10 verdict item #2), qst7 + qs22b (their
# shared ensure_ivfm_manifest build routes assignment through the
# quantized-exact dgemm kernel this round, item #4; oracles drain the
# SAME manifest state), qst8 (serves the same store family), and
# qs20/qs29 (1000x rung extension heads, item #7). Run
# tools/window_check.py after any registration change;
# tools/selfcheck.py re-verifies the FULL registry every round.
_WINDOW_ORDER = [
    # changed-code leads (r10 NOTES rotation plan)
    "qd6_simhash",
    "qt6_repetition_filter",
    # r8-stale breadth — VERDICT r10 "What's missing" #3 (all 41)
    "q17_json_extract",
    "q18_complete_year",
    "q19_distinct_count",
    "q20_pivot_event_types",
    "q21_rollup",
    "q22_regional_revenue",
    "q50_feature_trend",
    "q51_genre_affinity",
    "qst2_streaming_sessionize",
    "qst4_streaming_stateful_totals",
    "qst5_streaming_incremental_near_dup",
    "qst6_streaming_export_gate",
    "qs1_embed_norms",
    "qs2_cosine_topk",
    "qs3_cosine_topk_bucketed",
    "qs5_cosine_topk_multiprobe",
    "qs7_cosine_topk_ivf_kmeans",
    "qs8_cosine_topk_ivf_kmeans_blas",
    "qs10_ann_full_blas",
    "qs11_cosine_topk_ivf_kmeans_multiprobe",
    "qs12_embedding_quantize",
    "qs14_cosine_topk_ivf_kmeans_sized",
    "qs16_cosine_topk_ivf_sample_trained",
    "qs17_cosine_topk_imi",
    "qs24_cosine_topk_imi_multiprobe",
    "qs26_cosine_topk_imi_blas",
    "qe1_label_centroids",
    "qe2_knn_label_vote",
    "qd9_simhash_pairs",
    "qt2_quality_score",
    "qt3_token_stats",
    "qt4_fingerprint",
    "qt5_token_bpeish",
    "qt7_contamination",
    "qt8_pii_scrub",
    "qsp2_split_assign",
    "qsp3_stratified_sample",
    "qsp4_domain_mixture",
    "qp4_curriculum_buckets",
    "qm3_payload_features",
    "qm4_frame_sample",
    # touched by this round's verdict items (#1/#2/#4/#7)
    "qs19b_cosine_topk_ivfpq_store",
    "qs25_cosine_topk_imi_adc",
    "qst7_streaming_index_maintenance",
    "qs22b_ann_index_maintenance_manifest",
    "qst8_streaming_ann_serving",
    "qs20_hybrid_rrf",
    "qs29_imi_recall_audit",
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
