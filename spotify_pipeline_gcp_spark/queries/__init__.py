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
# Round-15 window (r14 verdict "Next round" item #2): the r14
# round's heaviest rewrites were NOT in r14's driver-verified window
# — their correctness rested on builder selfcheck + pytest pins — so
# they LEAD here exactly as the verdict lists them: qs28 (probe
# kernel + raw packing), qs30 (new sized bucketed-BLAS), qp5/qst6
# (export-gate gram source), qs4/qs6/qs8/qs10/qs23/qs26 (raw-float32
# packing wave + this round's data-derived block sizing), qs18/qs27
# (ADC literal tables), qd9c/qd9r2 (collapse audit pair, never
# driver-verified). qt10 follows (its prefix-count shape changed
# AGAIN this round — window-derived — so it re-leads despite a fresh
# r14 row). Then the entire remaining r12-stale tranche (31), then 4
# r13-stale heavies whose shared code paths moved in r14/r15 (qd8/
# qd12 capped-jaccard + components, qd14 composition, qs22 trainer
# path). 15 + 31 + 4 = exactly 50. The trainer-loop AQE revert and
# block-count sizing are result-invariant by contract and every
# registered query passed the full builder selfcheck this round; the
# r14-verified trainer family (qs7/qs11/qs14/qs16/qs17/qs24/...)
# keeps its 1-round-old rows. Run tools/window_check.py after any
# registration change.
_WINDOW_ORDER = [
    # r14's driver-unverified rewrites (VERDICT r14 item #2, verbatim)
    "qs28_cosine_topk_imi_multiprobe_blas",
    "qs30_cosine_topk_bucketed_blas_sized",
    "qp5_export_manifest",
    "qst6_streaming_export_gate",
    "qs4_cosine_topk_blas",
    "qs6_cosine_topk_ivf_blas",
    "qs8_cosine_topk_ivf_kmeans_blas",
    "qs10_ann_full_blas",
    "qs23_cosine_topk_ivf_blas_sized",
    "qs26_cosine_topk_imi_blas",
    "qs18_pq_adc_topk",
    "qs27_cosine_topk_ivfpq_gather",
    "qd9c_simhash_pairs_collapsed",
    "qd9r2_simhash_recall_audit_collapsed",
    # r15-changed lead (window-derived prefix counts)
    "qt10_ngram_lm_score",
    # r12-stale tranche — every query whose last driver row is r12
    "q23_full_outer_join",
    "q29_window_lag_lead",
    "q49_grouping_sets",
    "qd11_incremental_near_dup",
    "qd13_duplicated_spans",
    "qd1_dedup_exact_groups",
    "qd2_dedup_exact_keep",
    "qd3_ngram_jaccard_pairs",
    "qd4_minhash_signatures",
    "qd7_embedding_near_dup",
    "qd7b_embedding_near_dup_pruned",
    "qd9b_simhash_pairs_capped",
    "qk1_salted_agg",
    "qm1_binary_meta",
    "qm2_image_decode_meta",
    "qp1_corpus_prep",
    "qp2_token_shard_packing",
    "qp3_token_budget_selection",
    "qp6_pack_manifest",
    "qs13_cosine_topk_bucketed_sized",
    "qs15_query_corpus_topk",
    "qs19_cosine_topk_ivfpq",
    "qs9_filtered_ann",
    "qsp1_hash_sample",
    "qsp5_temperature_resample",
    "qsp6_exact_quota_sample",
    "qst1_streaming_type_rollup",
    "qst3_streaming_static_enrich",
    "qt11_vocab_stats",
    "qt1_lang_id",
    "qt9_chunk_windows",
    # r13-stale heavies on r14/r15-changed shared paths
    "qd8_dedup_components",
    "qd12_keep_best_per_cluster",
    "qd14_near_dup_export",
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
