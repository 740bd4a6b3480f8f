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
# Round-6 window: leads with the nine queries NEW this round — the
# auto-sized ANN shapes qs13/qs14 (r5 verdict #1), qt9 chunking, the
# serving-shape qs15, sample-trained qs16, two-level IMI qs17, the
# linear duplicated-span dedup qd13, PQ ADC qs18, and the composed
# IVF+PQ qs19 — then the six r2-stale queries displaced in r5
# (qs4/qs6/qm1/qm2/qt1/qsp1), then the r4-green set now two rounds
# stale: the qd dedup family (incl. qd11/qd8, both touched this
# round), qst1/qst3, qp1–qp3, qs7, qk1, and the q23/q29–q41
# relational breadth. Out of window this round: everything
# driver-green in r05 (50 rows), plus q24–q28 and q42–q48 (r4-green,
# trivial unchanged modules — first in line for the r7 rotation).
# Run tools/window_check.py after any registration change;
# tools/selfcheck.py re-verifies the FULL registry every round.
_WINDOW_ORDER = [
    # new this round — the auto-sized ANN shapes (r5 verdict #1),
    # token-window chunking, and the two-table serving-shape ANN
    "qs13_cosine_topk_bucketed_sized",
    "qs14_cosine_topk_ivf_kmeans_sized",
    "qt9_chunk_windows",
    "qs15_query_corpus_topk",
    "qs16_cosine_topk_ivf_sample_trained",
    "qs17_cosine_topk_imi",
    "qd13_duplicated_spans",
    "qs18_pq_adc_topk",
    "qs19_cosine_topk_ivfpq",
    "qt10_ngram_lm_score",
    "qsp5_temperature_resample",
    "qs20_hybrid_rrf",
    "qs21_ann_recall_audit",
    "qp5_export_manifest",
    "q49_grouping_sets",
    "qe2_knn_label_vote",
    "qsp6_exact_quota_sample",
    "qt11_vocab_stats",
    "qp6_pack_manifest",
    "qst6_streaming_export_gate",
    "qd14_near_dup_export",
    # r2-stale (displaced from the r5 window)
    "qs4_cosine_topk_blas",
    "qs6_cosine_topk_ivf_blas",
    "qm1_binary_meta",
    "qm2_image_decode_meta",
    "qt1_lang_id",
    "qsp1_hash_sample",
    # dedup family (r4-green; qd11/qd8 touched this round)
    "qd11_incremental_near_dup",
    "qd8_dedup_components",
    "qd1_dedup_exact_groups",
    "qd2_dedup_exact_keep",
    "qd3_ngram_jaccard_pairs",
    "qd3b_ngram_jaccard_capped",
    "qd4_minhash_signatures",
    "qd5_minhash_lsh_pairs",
    "qd6_simhash",
    "qd7_embedding_near_dup",
    "qd7b_embedding_near_dup_pruned",
    "qd9b_simhash_pairs_capped",
    "qd10_semantic_dedup_components",
    "qd12_keep_best_per_cluster",
    # streaming + corpus + similarity + skew (r4-green)
    "qst1_streaming_type_rollup",
    "qst3_streaming_static_enrich",
    "qp1_corpus_prep",
    "qp2_token_shard_packing",
    "qp3_token_budget_selection",
    "qs7_cosine_topk_ivf_kmeans",
    "qk1_salted_agg",
    # relational breadth (r4-green)
    "q23_full_outer_join",
    "q29_window_lag_lead",
    # q30_sessionize / q31_asof_last_click / q32_scalar_subquery
    # rotate out with the list below (r4-green, unchanged; q30 also
    # has 10x/100x scale rows) to fit qp6/qst6/qd14
    # q33_conditional_agg / q34_array_agg_ops / q35_exact_percentiles
    # rotate out with the list below (r4-green, unchanged) to fit the
    # late-round additions qe2/qsp6/qt11
    # q36_approx_aggregates (rows-only driver row; its value bounds
    # live in the tolerance pytests) / q37_unpivot / q38_map_ops /
    # q39_date_arith / q40_json_bag / q41_big_orders_having /
    # q42_above_group_avg / q43_ratio_metric /
    # q44_flagship_partition_ready / q45_cube / q46_range_frame /
    # q47_range_join / q48_rank_battery rotate out (r4-green, modules
    # unchanged) to make room for the twenty-one queries NEW this round
    # (qt9/qs15–qs21/qd13/qd14/qt10/qt11/qsp5/qsp6/qp5/qp6/q49/qe2/
    # qst6) — first in line for r7 alongside q24–q28
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
