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
# Round-5 window: leads with the six oracle-bearing queries that have
# NEVER had a driver row (qs11, qe1, qs9, qm3, qm4, qsp3 — the r3 and
# r4 verdicts' #1 item), then the six queries NEW this round
# (qt6/qt7/qt8/qsp4/qs12/qp4), then the queries changed this round (qst5 new, qst2
# oracle tie-break fix, qst4 TTL tz fix, qd9 precondition guard),
# then the q00–q22 breadth set (driver-stale since r02), then the
# r02-stale extension tails (qs1/qs2/qs3/qs5, qt1–qt5, qsp1/qsp2,
# qm2) and the never-driver-checked rows-only BLAS twins qs8/qs10.
# Out of window this round: everything driver-green in r04
# (relational q23–q48 breadth, the dedup family, qst1/qst3, qp1–qp3,
# qk1, qs7), rows-only q36 (which gained value-level pytest
# tolerance checks this round), and qs4/qs6/qm1/qt1/qsp1/qm2 (r2
# driver rows, modules unchanged — displaced by the six new queries).
# Run
# tools/window_check.py after any registration change;
# tools/selfcheck.py re-verifies the FULL registry every round.
_WINDOW_ORDER = [
    # never driver-checked (r4 verdict #1)
    "qs11_cosine_topk_ivf_kmeans_multiprobe",
    "qe1_label_centroids",
    "qs9_filtered_ann",
    "qm3_payload_features",
    "qm4_frame_sample",
    "qsp3_stratified_sample",
    # new this round (never driver-checked, oracle-bearing)
    "qt6_repetition_filter",
    "qt7_contamination",
    "qt8_pii_scrub",
    "qsp4_domain_mixture",
    "qs12_embedding_quantize",
    "qp4_curriculum_buckets",
    # changed this round
    "qst5_streaming_incremental_near_dup",
    "qst2_streaming_sessionize",
    "qst4_streaming_stateful_totals",
    "qd9_simhash_pairs",
    # q00–q22 breadth set, driver-stale since r02
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
    "q17_json_extract",
    "q18_complete_year",
    "q19_distinct_count",
    "q20_pivot_event_types",
    "q21_rollup",
    "q22_regional_revenue",
    # r02-stale extension tails
    "qs1_embed_norms",
    "qs2_cosine_topk",
    "qs3_cosine_topk_bucketed",
    "qs5_cosine_topk_multiprobe",
    "qt2_quality_score",
    "qt3_token_stats",
    "qt4_fingerprint",
    "qt5_token_bpeish",
    "qsp2_split_assign",
    # rows-only BLAS twins that never had ANY driver row (qs4/qs6 and
    # qm1 rotate out this round — each has an r2 driver row and its
    # module is unchanged — to make room for qt6/qt7/qsp4)
    "qs8_cosine_topk_ivf_kmeans_blas",
    "qs10_ann_full_blas",
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
