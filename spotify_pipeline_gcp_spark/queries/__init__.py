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
# Round-14 window (r13 verdict item #1 — rotate to the 45 queries
# whose last driver row is r11; at r14 they sit at the 2-round policy
# edge and this window is the only mechanism keeping "all green"
# attestable): changed/new-code leads first — qd7c (NEW: the
# quantized-dgemm per-bucket pair kernel, never driver-verified),
# qd9r (NEW: the SimHash recall audit, r13 verdict item #3), qd10
# (edge kernel switched to the dgemm AND its oracle's np CTE now
# replays quantized dots), qt10 (probs join switched to SHUFFLE_HASH
# — the dictionary-encoding A/B measured worse and was reverted, see
# operators/text.py:390 — oracle unchanged), qd3b (the capped path now
# count-caps BEFORE collect_list — same oracle, new plan) — then ALL
# 45 r11-latest queries. 5 + 45 = exactly 50. qd8/qd12 share qd3b's
# changed path but keep their r13 rows (1 round old) and identical
# oracles; the full-registry selfcheck re-verifies them (and
# everything else) every round. The 43 r12-latest queries form the
# r15 tranche. Run tools/window_check.py after any registration
# change.
_WINDOW_ORDER = [
    # changed/new-code leads (r13 verdict items #2/#3/#5 + ADVICE)
    "qd7c_embedding_near_dup_blas",
    "qd9r_simhash_recall_audit",
    "qd10_semantic_dedup_components",
    "qt10_ngram_lm_score",
    "qd3b_ngram_jaccard_capped",
    # r11-stale breadth — VERDICT r13 "Next round" #1 (all 45)
    "q17_json_extract",
    "q18_complete_year",
    "q19_distinct_count",
    "q20_pivot_event_types",
    "q21_rollup",
    "q22_regional_revenue",
    "q50_feature_trend",
    "q51_genre_affinity",
    "qd6_simhash",
    "qd9_simhash_pairs",
    "qe1_label_centroids",
    "qe2_knn_label_vote",
    "qm3_payload_features",
    "qm4_frame_sample",
    "qp4_curriculum_buckets",
    "qs11_cosine_topk_ivf_kmeans_multiprobe",
    "qs12_embedding_quantize",
    "qs14_cosine_topk_ivf_kmeans_sized",
    "qs16_cosine_topk_ivf_sample_trained",
    "qs17_cosine_topk_imi",
    "qs19b_cosine_topk_ivfpq_store",
    "qs1_embed_norms",
    "qs20_hybrid_rrf",
    "qs22b_ann_index_maintenance_manifest",
    "qs24_cosine_topk_imi_multiprobe",
    "qs25_cosine_topk_imi_adc",
    "qs29_imi_recall_audit",
    "qs2_cosine_topk",
    "qs3_cosine_topk_bucketed",
    "qs5_cosine_topk_multiprobe",
    "qs7_cosine_topk_ivf_kmeans",
    "qsp2_split_assign",
    "qsp3_stratified_sample",
    "qsp4_domain_mixture",
    "qst2_streaming_sessionize",
    "qst4_streaming_stateful_totals",
    "qst7_streaming_index_maintenance",
    "qst8_streaming_ann_serving",
    "qt2_quality_score",
    "qt3_token_stats",
    "qt4_fingerprint",
    "qt5_token_bpeish",
    "qt6_repetition_filter",
    "qt7_contamination",
    "qt8_pii_scrub",
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
