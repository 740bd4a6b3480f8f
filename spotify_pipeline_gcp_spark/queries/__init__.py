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
# Round-8 window (r7 verdict item #1 — retire the r5 staleness debt):
# leads with ALL 33 queries whose LAST driver row is r5 (by r8 those
# rows are three rounds stale: q17–q22, qd9, qe1, qm3/qm4, qp4,
# qs1–qs3/qs5/qs8–qs12, qsp2–qsp4, qst2/qst4/qst5, qt2–qt8), then
# the queries whose CODE changed this round (qst6 — the export-gate
# replay fix — plus any new registrations), then backfills with
# r6-green rows, prioritizing the ones the r7 verdict asks to
# re-measure (qs20/qe2 shared gram helpers; qd11 whose stored-store
# pattern the new manifest maintenance reuses; qs16 which shares the
# 'ivf:' model with qs23) and the promoted capped defaults
# (qd3b/qd9b). Out of window: the remaining r6-green rows (2 rounds
# stale at r8 — first in line for r9) and everything r7-green.
# Run tools/window_check.py after any registration change;
# tools/selfcheck.py re-verifies the FULL registry every round.
_WINDOW_ORDER = [
    # r5-stale breadth — the rotation debt named in VERDICT r7
    # "What's missing" #1 (all 33)
    "q17_json_extract",
    "q18_complete_year",
    "q19_distinct_count",
    "q20_pivot_event_types",
    "q21_rollup",
    "q22_regional_revenue",
    "qd9_simhash_pairs",
    "qe1_label_centroids",
    "qm3_payload_features",
    "qm4_frame_sample",
    "qp4_curriculum_buckets",
    "qs1_embed_norms",
    "qs2_cosine_topk",
    "qs3_cosine_topk_bucketed",
    "qs5_cosine_topk_multiprobe",
    "qs8_cosine_topk_ivf_kmeans_blas",
    "qs9_filtered_ann",
    "qs10_ann_full_blas",
    "qs11_cosine_topk_ivf_kmeans_multiprobe",
    "qs12_embedding_quantize",
    "qsp2_split_assign",
    "qsp3_stratified_sample",
    "qsp4_domain_mixture",
    "qst2_streaming_sessionize",
    "qst4_streaming_stateful_totals",
    "qst5_streaming_incremental_near_dup",
    "qt2_quality_score",
    "qt3_token_stats",
    "qt4_fingerprint",
    "qt5_token_bpeish",
    "qt6_repetition_filter",
    "qt7_contamination",
    "qt8_pii_scrub",
    # changed this round: the streaming export gate's replay fix;
    # new manifest-backed maintenance (r7 verdict #2); the cell-local
    # / two-level top-k rewrite (qs14/qs17/qs24 — qs3/qs5/qs9/qs11/
    # qs7/qs13/qs16/qe2 share it and already sit in the window above)
    # and the unrolled-ADC rewrites (qs18/qs19/qs25)
    "qst6_streaming_export_gate",
    "qs22b_ann_index_maintenance_manifest",
    "qst7_streaming_index_maintenance",
    "q50_feature_trend",
    "q51_genre_affinity",
    "qs25_cosine_topk_imi_adc",
    "qs14_cosine_topk_ivf_kmeans_sized",
    "qs17_cosine_topk_imi",
    "qs24_cosine_topk_imi_multiprobe",
    "qs18_pq_adc_topk",
    "qs19_cosine_topk_ivfpq",
    "qs26_cosine_topk_imi_blas",
    "qs27_cosine_topk_ivfpq_gather",
    # r6-green backfill: the re-measure set's entries whose CODE
    # changed this round. (qs15/qp5/qt1/qd3b/qd9b/qd11/qs20 —
    # r6-green, UNCHANGED this round — gave up their slots to the
    # changed/new-code set above; they lead the r9 rotation.)
    "qe2_knn_label_vote",
    "qs16_cosine_topk_ivf_sample_trained",
    "qs7_cosine_topk_ivf_kmeans",
    "qs13_cosine_topk_bucketed_sized",
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
