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
# Round-9 window (r8 verdict item #2 — retire the r6 staleness debt):
# leads with ALL 39 queries whose LAST driver row is r6 (the
# cross-round union in VERDICT r8; at r9 they'd be 3 rounds stale),
# then the queries whose CODE changed this round — the trained-model
# memoization path (qs18/qs19/qs25/qs27 share memoized 'pqtr:'/
# 'ivfpq:'/'imi:' literals now), the content-sensitive manifest
# fingerprint (qs22b/qst7), and the new streaming ANN serving
# (qst8) — then backfills with r7-green rows led by the flagship
# and qs22b's self-contained sibling. Out of window: the remaining
# r7-green rows (2 rounds stale at r9 — first in line for r10) and
# everything r8-green. Run tools/window_check.py after any
# registration change; tools/selfcheck.py re-verifies the FULL
# registry every round.
_WINDOW_ORDER = [
    # r6-stale breadth — VERDICT r8 "What's missing" #2 (all 39)
    "q23_full_outer_join",
    "q29_window_lag_lead",
    "q49_grouping_sets",
    "qd10_semantic_dedup_components",
    "qd11_incremental_near_dup",
    "qd12_keep_best_per_cluster",
    "qd13_duplicated_spans",
    "qd1_dedup_exact_groups",
    "qd2_dedup_exact_keep",
    "qd3_ngram_jaccard_pairs",
    "qd3b_ngram_jaccard_capped",
    "qd4_minhash_signatures",
    "qd5_minhash_lsh_pairs",
    "qd6_simhash",
    "qd7_embedding_near_dup",
    "qd7b_embedding_near_dup_pruned",
    "qd8_dedup_components",
    "qd9b_simhash_pairs_capped",
    "qk1_salted_agg",
    "qm1_binary_meta",
    "qm2_image_decode_meta",
    "qp1_corpus_prep",
    "qp2_token_shard_packing",
    "qp3_token_budget_selection",
    "qp5_export_manifest",
    "qp6_pack_manifest",
    "qs15_query_corpus_topk",
    "qs20_hybrid_rrf",
    "qs4_cosine_topk_blas",
    "qs6_cosine_topk_ivf_blas",
    "qsp1_hash_sample",
    "qsp5_temperature_resample",
    "qsp6_exact_quota_sample",
    "qst1_streaming_type_rollup",
    "qst3_streaming_static_enrich",
    "qt10_ngram_lm_score",
    "qt11_vocab_stats",
    "qt1_lang_id",
    "qt9_chunk_windows",
    # changed this round: trained-model memoization (values identical,
    # physical model-prep path changed), manifest fingerprint, and
    # the new streaming ANN serving query
    "qs18_pq_adc_topk",
    "qs19_cosine_topk_ivfpq",
    "qs25_cosine_topk_imi_adc",
    "qs27_cosine_topk_ivfpq_gather",
    "qs22b_ann_index_maintenance_manifest",
    "qst7_streaming_index_maintenance",
    "qst8_streaming_ann_serving",
    "qs28_cosine_topk_imi_multiprobe_blas",
    "qs29_imi_recall_audit",
    # changed late-r9: the full-registry 100x sweep caught qs9's
    # pinned-4-bit sign bucket quadratic (same bug as qd7b/qd10, both
    # already in the r6-stale set above) and qt6's interpreted
    # transform-built grams (294.6 s -> 17.3 s at 100x after the
    # regex-gram swap); changed code must be driver-verified this round
    "qs9_filtered_ann",
    "qt6_repetition_filter",
    # the r7-green backfills q00/qs22 gave their slots to the two
    # changed queries above (the driver's entry() smoke still runs the
    # flagship pipeline every round); with qs21/qd14 they lead the r10
    # rotation
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
