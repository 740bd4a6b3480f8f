"""Round-9 scale ladder: clean re-measure of the whole ANN family.

Why a full re-measure: r9's first stageprof capture showed qs19 at
the 100x point running in ~115 s end-to-end (stage walls sum to
105 s) where SCALE_BENCH_r08 recorded 818.0 s — and re-running the
EXACT r8 harness (tools/scale_r8.py, same 4 g session, same
measure path) reproduced 89.8 s. The ~830 s "unattributed floor"
the r8 close-out flagged (qs19/qs27/qs22b-build) was a MEASUREMENT
artifact, not a plan cost: the late-r8 ladder rows were captured
while other heavy close-out work shared the 32 cores (the
operational note already warned concurrent runs distort ladder
numbers — late r8 violated it at ~9x, not ~5%). Every r8 100x row
is therefore suspect until re-measured serialized.

Methodology (tightened from r7/r8):
- ONE fresh JVM, queries strictly serialized, nothing else running
  on the machine (verify with `ps` before launching).
- 4 g driver ALWAYS (the r8 memory contract, now an enforced
  invariant: this tool refuses to run with SPARK_GRAFT_DRIVER_MEM
  set higher, and records `driver_memory` + per-query `heap_mb` /
  `gc_sec` deltas in the JSON so an OOM-adjacent regression shows
  up as numbers, not vibes).
- base (sf0.1) min-of-2; scaled min-of-2 when the first run < 120 s
  (one-shot above that — a 10-minute query's variance is visible in
  the GC column instead).
- per-query JVM probes: heap-used delta and total GC-time delta
  (ManagementFactory beans via py4j) — the attribution columns the
  r8 "unexplained wall" debate lacked.

Fills SCALE_BENCH_r09.json incrementally (one JSON rewrite per
measured query). Usage:
    python tools/scale_r9.py [factor10|factor100|both] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALED_10 = "/tmp/spark_graft_sf1"
SCALED_100 = "/tmp/spark_graft_sf10"
# documents + embeddings ONLY (selective 10x of the 100x dir via the
# same structure-preserving transforms; TPC-H tables intentionally
# absent — the third decade exists to test the auto-sizing formulas
# where they bend: sign_bits_for(2M)=13, simhash width, IMI grid)
SCALED_1000 = "/tmp/spark_graft_sf100"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r09.json",
)
DRIVER_MEM = "4g"  # the r8 memory contract — pinned, not configurable

WARM_BUILD = {"qs22b_ann_index_maintenance_manifest"}

# cheap rows first so partial progress lands early; the two
# n^1.5-fold anchors (qs14/qs16) run last
FACTOR100 = [
    "qs18_pq_adc_topk",
    "qs13_cosine_topk_bucketed_sized",
    "qs26_cosine_topk_imi_blas",
    "qs25_cosine_topk_imi_adc",
    "qs17_cosine_topk_imi",
    "qs24_cosine_topk_imi_multiprobe",
    "qs19_cosine_topk_ivfpq",
    "qs27_cosine_topk_ivfpq_gather",
    "qs22b_ann_index_maintenance_manifest",
    "qs16_cosine_topk_ivf_sample_trained",
    "qs14_cosine_topk_ivf_kmeans_sized",
]
FACTOR10 = [
    "qs19_cosine_topk_ivfpq",
    "qs22b_ann_index_maintenance_manifest",
]
# The 1000x rung (2M vectors / 5M docs, 4 g): doc/embedding flagships
# only — every query here reads documents and/or embeddings alone.
FACTOR1000 = [
    "qt2_quality_score",
    "qt6_repetition_filter",
    "qd1_dedup_exact_groups",
    "qsp5_temperature_resample",
    "qs15_query_corpus_topk",
    "qs18_pq_adc_topk",
    "qd5_minhash_lsh_pairs",
    "qd3b_ngram_jaccard_capped",
    "qd9b_simhash_pairs_capped",
    "qd7b_embedding_near_dup_pruned",
    "qs13_cosine_topk_bucketed_sized",
    "qs26_cosine_topk_imi_blas",
    "qp5_export_manifest",
]

# ---------------------------------------------------------------------------
# Full-registry sweep (late r9): the 4 g ladder extended past the ANN
# family caught three scale bugs the oracles could not see (qd8/qd12
# OOM, qst2 OOM, qd9b zero recall — see PERFORMANCE.md); this sweep
# finishes the job for every remaining registered query. Exclusions,
# each deliberate and documented:
#   - pinned exactness baselines qs3/qs7/qs11/qd3/qd9 (registry-demoted
#     anchors; invoking them at 100x measures the documented all-pairs
#     shape, not the engine) and qd7 (exact pairwise twin of qd7b);
#   - brute-force BLAS twins qs2/qs4/qs5/qs6/qs8 (qs10 is the
#     representative full-scan kernel row);
#   - qs22 (known n*k recount, superseded by qs22b; its 100x cost is
#     recorded in SCALE_BENCH_r08 and COVERAGE.md's decision table);
#   - queries already measured in this file's FACTOR100/r9 rows.
SWEEP_DRAIN = {
    # data-sized outputs: draining through a noop DSv2 write keeps the
    # full plan (nothing pruned by count()) while nothing data-sized
    # ever reaches the Python driver — collect() here would measure
    # py4j serialization, not the engine.
    "q00_flagship_pipeline",
    "q01_project_derived",
    "q02_filter_isin",
    "q03_explode_tokens",
    "q04_bag_collect",
    "q05_bag_join",
    "q06_delta_anti_join",
    "q07_distinct",
    "q12_window_running",
    "q14_semi_join",
    "q17_json_extract",
    "q18_complete_year",
    "q25_except",
    "q27_string_funcs",
    "q28_null_handling",
    "q29_window_lag_lead",
    "q30_sessionize",
    "q31_asof_last_click",
    "q32_scalar_subquery",
    "q34_array_agg_ops",
    "q37_unpivot",
    "q38_map_ops",
    "q39_date_arith",
    "q40_json_bag",
    "q44_flagship_partition_ready",
    "q46_range_frame",
    "q47_range_join",
    "q48_rank_battery",
    "q50_feature_trend",
    "qd2_dedup_exact_keep",
    "qd4_minhash_signatures",
    "qm2_image_decode_meta",
    "qm3_payload_features",
    "qm4_frame_sample",
    "qp1_corpus_prep",
    "qs12_embedding_quantize",
    "qsp1_hash_sample",
    "qsp2_split_assign",
    "qsp3_stratified_sample",
    "qsp6_exact_quota_sample",
    "qst2_streaming_sessionize",
    # near-dup PAIRS at 100x are data-sized output (7.9M rows on the
    # noisy scaled corpus) — collect() measured py4j, not the engine
    "qd7b_embedding_near_dup_pruned",
    "qt5_token_bpeish",
    "qt6_repetition_filter",
    "qt8_pii_scrub",
    "qt9_chunk_windows",
}
SWEEP100 = [
    # relational aggregates (small outputs, collect)
    "q08_pricing_summary",
    "q09_top_orders",
    "q10_segment_revenue_topn",
    "q11_window_topk",
    "q13_union_distinct",
    "q15_date_trunc_daily",
    "q16_date_format_monthly",
    "q19_distinct_count",
    "q20_pivot_event_types",
    "q21_rollup",
    "q22_regional_revenue",
    "q23_full_outer_join",
    "q24_cross_join",
    "q26_intersect",
    "q33_conditional_agg",
    "q35_exact_percentiles",
    "q36_approx_aggregates",
    "q41_big_orders_having",
    "q42_above_group_avg",
    "q43_ratio_metric",
    "q45_cube",
    "q49_grouping_sets",
    "q51_genre_affinity",
    "qk1_salted_agg",
    # relational / pipeline data-sized (noop drain)
    "q00_flagship_pipeline",
    "q01_project_derived",
    "q02_filter_isin",
    "q03_explode_tokens",
    "q04_bag_collect",
    "q05_bag_join",
    "q06_delta_anti_join",
    "q07_distinct",
    "q12_window_running",
    "q14_semi_join",
    "q17_json_extract",
    "q18_complete_year",
    "q25_except",
    "q27_string_funcs",
    "q28_null_handling",
    "q29_window_lag_lead",
    "q30_sessionize",
    "q31_asof_last_click",
    "q32_scalar_subquery",
    "q34_array_agg_ops",
    "q37_unpivot",
    "q38_map_ops",
    "q39_date_arith",
    "q40_json_bag",
    "q44_flagship_partition_ready",
    "q46_range_frame",
    "q47_range_join",
    "q48_rank_battery",
    "q50_feature_trend",
    # dedup
    "qd1_dedup_exact_groups",
    "qd2_dedup_exact_keep",
    "qd4_minhash_signatures",
    "qd6_simhash",
    "qd7b_embedding_near_dup_pruned",
    "qd10_semantic_dedup_components",
    "qd11_incremental_near_dup",
    # similarity (rows not yet measured in r9)
    "qs1_embed_norms",
    "qs9_filtered_ann",
    "qs12_embedding_quantize",
    "qs15_query_corpus_topk",
    "qs23_cosine_topk_ivf_blas_sized",
    "qs28_cosine_topk_imi_multiprobe_blas",
    "qs29_imi_recall_audit",
    "qs10_ann_full_blas",
    "qe1_label_centroids",
    # corpus prep + sampling
    "qp1_corpus_prep",
    "qp3_token_budget_selection",
    "qp4_curriculum_buckets",
    "qp6_pack_manifest",
    "qsp1_hash_sample",
    "qsp2_split_assign",
    "qsp3_stratified_sample",
    "qsp4_domain_mixture",
    "qsp5_temperature_resample",
    "qsp6_exact_quota_sample",
    # text
    "qt1_lang_id",
    "qt2_quality_score",
    "qt3_token_stats",
    "qt4_fingerprint",
    "qt5_token_bpeish",
    "qt6_repetition_filter",
    "qt8_pii_scrub",
    "qt9_chunk_windows",
    "qt11_vocab_stats",
    # multimodal
    "qm1_binary_meta",
    "qm2_image_decode_meta",
    "qm3_payload_features",
    "qm4_frame_sample",
    # streaming
    "qst1_streaming_type_rollup",
    "qst3_streaming_static_enrich",
    "qst4_streaming_stateful_totals",
    "qst5_streaming_incremental_near_dup",
    "qst6_streaming_export_gate",
    "qst7_streaming_index_maintenance",
    "qst8_streaming_ann_serving",
]


def _load() -> dict:
    if os.path.exists(OUT):
        with open(OUT) as fh:
            return json.load(fh)
    return {}


def _save(doc: dict) -> None:
    tmp = OUT + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, OUT)


def _jvm_probe(spark) -> tuple[float, float, float]:
    """(heap_used_mb, total_gc_sec, code_cache_used_mb) from the
    driver JVM (local mode: the driver IS every executor, so this
    sees all task memory). The code-cache column exists because a
    FULL ReservedCodeCacheSize silently disables JIT — the 10-30x
    late-session slowdown the session factory's 512m guards against
    (see session.py); literal-table-heavy ANN plans (qs19/qs27) emit
    large codegen classes, so this is the first suspect whenever a
    long measurement session shows an unexplained shared floor."""
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.management.ManagementFactory
    mem = rt.getMemoryMXBean().getHeapMemoryUsage()
    gc_ms = 0
    it = rt.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc_ms += it.next().getCollectionTime()
    cc = 0.0
    pools = rt.getMemoryPoolMXBeans().iterator()
    while pools.hasNext():
        p = pools.next()
        if "CodeHeap" in p.getName() or "Code Cache" in p.getName():
            cc += p.getUsage().getUsed()
    return mem.getUsed() / 1048576.0, gc_ms / 1000.0, cc / 1048576.0


# Per-query watchdog (late r9): both sweep stalls (qd7b, qs9 — pinned
# sign buckets gone quadratic) sat >14 min before a human noticed.
# An unattended ladder should fail the QUERY loudly and keep going:
# the watchdog cancels the query's job group after MAX_QUERY_SEC and
# the row records {"timeout": N} instead of silently blocking the
# remaining rows. 600 s is ~4x the slowest legitimate row (qs14).
MAX_QUERY_SEC = int(os.environ.get("SPARK_GRAFT_LADDER_TIMEOUT", "600"))


class QueryTimeout(Exception):
    pass


def run_one(spark, fn, sf_dir: str, drain: bool = False) -> tuple[float, int]:
    import threading

    group = f"ladder-{time.time_ns()}"
    spark.sparkContext.setJobGroup(group, "scale ladder query", True)
    fired = threading.Event()

    def _kill():
        fired.set()
        spark.sparkContext.cancelJobGroup(group)

    timer = threading.Timer(MAX_QUERY_SEC, _kill)
    timer.daemon = True
    timer.start()
    t0 = time.time()
    try:
        df = fn(spark, sf_dir)
        if drain:
            # noop DSv2 write: full materialization (nothing pruned the
            # way count() would prune), zero bytes to the Python driver.
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            return dt, df.count()  # rows recorded untimed
        n = len(df.collect())
        return time.time() - t0, n
    except Exception:
        if fired.is_set():
            raise QueryTimeout(
                f"query exceeded {MAX_QUERY_SEC}s and was cancelled"
            ) from None
        raise
    finally:
        timer.cancel()
        spark.sparkContext.setJobGroup("", "")


def measure(spark, fn, sf_dir: str, reps: int, drain: bool = False) -> tuple[float, int]:
    best, rows = run_one(spark, fn, sf_dir, drain)
    for _ in range(reps - 1):
        t, _n = run_one(spark, fn, sf_dir, drain)
        best = min(best, t)
    return best, rows


def ladder(spark, registry, names, scaled_dir, factor_key, factor):
    from bench import _calibration

    doc = _load()
    sec = doc.setdefault(
        factor_key,
        {
            "base": BASE,
            "scaled": scaled_dir,
            "factor": factor,
            "driver_memory": DRIVER_MEM,
            "queries": {},
        },
    )
    try:
        scaled_cal = _calibration(spark, scaled_dir)
    except Exception:
        # the selective 1000x dir carries only documents/embeddings —
        # no lineitem for the scan probe; cpu drift is still captured
        # via the base calibration in the same session
        scaled_cal = {"note": "no lineitem in selective scaled dir"}
    sec["_calibration"] = {
        "base": _calibration(spark, BASE),
        "scaled": scaled_cal,
    }
    _save(doc)
    for name in names:
        fn = registry[name].fn
        # at the 1000x rung EVERYTHING drains: per-doc outputs are 5M+
        # rows there, and the rung's first run showed two 5M-row
        # collects leaving enough retained JVM state to OOM the NEXT
        # query's aggregate (qd1 ran clean solo at 10.8s). For tiny
        # outputs the noop write costs the same as collect, so the
        # rung stays internally comparable.
        drain = name in SWEEP_DRAIN or factor >= 1000
        extra = {"drain": "noop"} if drain else {}
        try:
            if name in WARM_BUILD:
                t0 = time.time()
                run_one(spark, fn, BASE)
                extra["base_build_sec"] = round(time.time() - t0, 3)
            tb, nb = measure(spark, fn, BASE, reps=2, drain=drain)
        except QueryTimeout as ex:
            sec["queries"][name] = {"timeout_sec": MAX_QUERY_SEC, "err": str(ex)}
            print(f"[{factor_key}] {name}: TIMEOUT at base ({ex})", flush=True)
            doc = _load()
            doc[factor_key] = sec
            _save(doc)
            continue
        if name in WARM_BUILD:
            h0, g0, _c0 = _jvm_probe(spark)
            t0 = time.time()
            run_one(spark, fn, scaled_dir)
            extra["scaled_build_sec"] = round(time.time() - t0, 3)
            extra["build_gc_sec"] = round(_jvm_probe(spark)[1] - g0, 1)
        h0, g0, _c0 = _jvm_probe(spark)
        try:
            ts, ns = run_one(spark, fn, scaled_dir, drain)
            if ts < 120:
                t2, _ = run_one(spark, fn, scaled_dir, drain)
                ts = min(ts, t2)
        except QueryTimeout as ex:
            sec["queries"][name] = {
                "base_sec": round(tb, 3),
                "base_rows": nb,
                "timeout_sec": MAX_QUERY_SEC,
                "err": str(ex),
            }
            print(f"[{factor_key}] {name}: TIMEOUT at scaled ({ex})", flush=True)
            doc = _load()
            doc[factor_key] = sec
            _save(doc)
            continue
        h1, g1, c1 = _jvm_probe(spark)
        sec["queries"][name] = {
            "base_sec": round(tb, 3),
            "scaled_sec": round(ts, 3),
            "ratio": round(ts / tb, 2),
            "base_rows": nb,
            "scaled_rows": ns,
            "gc_sec": round(g1 - g0, 1),
            "heap_mb": round(h1 - h0),
            "code_cache_mb": round(c1),
            **extra,
        }
        print(
            f"[{factor_key}] {name}: {tb:.2f}s -> {ts:.2f}s "
            f"(x{ts / tb:.1f}; rows {nb} -> {ns}; gc {g1 - g0:.1f}s; "
            f"cc {c1:.0f}MB) {extra}",
            flush=True,
        )
        doc = _load()
        doc[factor_key] = sec
        _save(doc)


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit(
            "scale_r9 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM (r8 removed the 16g need — this "
            "tool exists to keep it removed)"
        )
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r9",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        run_one(spark, registry["q08_pricing_summary"].fn, BASE)  # warm session
    except QueryTimeout:
        pass  # cold-session warmup may trip a tight test timeout; harmless
    if which in ("factor10", "both"):
        ladder(spark, registry, names or FACTOR10, SCALED_10, "factor10", 10)
    if which in ("factor100", "both"):
        ladder(
            spark, registry, names or FACTOR100, SCALED_100, "factor100", 100
        )
    if which == "sweep":
        done = _load().get("factor100", {}).get("queries", {})
        todo = [n for n in (names or SWEEP100) if n not in done]
        ladder(spark, registry, todo, SCALED_100, "factor100", 100)
    if which == "factor1000":
        ladder(
            spark,
            registry,
            names or FACTOR1000,
            SCALED_1000,
            "factor1000",
            1000,
        )
    if which == "sweep10":
        # the 10x mid-rung of the same full-registry sweep: with both
        # rungs recorded, sub/super-linear scaling curves are visible
        # (a x10->x100 ratio pair distinguishes linear from n^1.5 from
        # n^2 empirically, not by asymptotic argument)
        done = _load().get("factor10", {}).get("queries", {})
        full = FACTOR100 + [n for n in SWEEP100 if n not in FACTOR100]
        todo = [n for n in (names or full) if n not in done]
        ladder(spark, registry, todo, SCALED_10, "factor10", 10)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
