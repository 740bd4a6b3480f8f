"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}``

Each query is executed to completion with a count-style terminal
action (``df.count()`` after the full plan — no driver materialization
of result payloads, mirroring how a warehouse sink would consume the
plan). A warmup query absorbs session/JIT startup so per-query numbers
reflect plan execution, not JVM spin-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_pipeline_gcp_spark.queries import load_all  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

# Headline set: the flagship DAG + the shapes that dominate real
# workloads (scan-agg, star join, window, bag+join, dedup, similarity,
# text). Names must exist in the registry.
HEADLINE = [
    "q00_flagship_pipeline",
    "q04_bag_collect",
    "q05_bag_join",
    "q06_delta_anti_join",
    "q08_pricing_summary",
    "q10_segment_revenue_topn",
    "q11_window_topk",
    "q12_window_running",
    "q19_distinct_count",
    "q22_regional_revenue",
]
# Extension headliners appended once implemented (registry-gated below).
HEADLINE_EXT = [
    "q29_window_lag_lead",
    "q30_sessionize",
    "q31_asof_last_click",
    "qd1_dedup_exact_groups",
    "qd3_ngram_jaccard_pairs",
    "qd4_minhash_signatures",
    "qd5_minhash_lsh_pairs",
    "qd6_simhash",
    "qs3_cosine_topk_bucketed",
    "qs4_cosine_topk_blas",
    "qs6_cosine_topk_ivf_blas",
    "qs7_cosine_topk_ivf_kmeans",
    "qs11_cosine_topk_ivf_kmeans_multiprobe",
    "qs8_cosine_topk_ivf_kmeans_blas",
    "qs10_ann_full_blas",
    "qd9_simhash_pairs",
    "qst2_streaming_sessionize",
    "qst3_streaming_static_enrich",
    "qd11_incremental_near_dup",
    "qt2_quality_score",
    "qt4_fingerprint",
    "qm3_payload_features",
    "qm4_frame_sample",
    "qsp1_hash_sample",
    "qp1_corpus_prep",
    "qp2_token_shard_packing",
    "qp3_token_budget_selection",
    "qs9_filtered_ann",
    "qe1_label_centroids",
    "qt6_repetition_filter",
    "qt7_contamination",
    "qt8_pii_scrub",
    "qsp4_domain_mixture",
    "qs12_embedding_quantize",
    "qst5_streaming_incremental_near_dup",
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
    "qs22_ann_index_maintenance",
    "qs23_cosine_topk_ivf_blas_sized",
    "qs24_cosine_topk_imi_multiprobe",
    "qs22b_ann_index_maintenance_manifest",
    "qs25_cosine_topk_imi_adc",
    "qst7_streaming_index_maintenance",
    "q50_feature_trend",
    "q51_genre_affinity",
    "qs26_cosine_topk_imi_blas",
    "qs27_cosine_topk_ivfpq_gather",
    "qst8_streaming_ann_serving",
    "qs28_cosine_topk_imi_multiprobe_blas",
    "qs29_imi_recall_audit",
    # r10: the production near-dup defaults (capped/banded forms), the
    # now-hash-verified sketch audit, and the fused export DAG
    "qd3b_ngram_jaccard_capped",
    "qd9b_simhash_pairs_capped",
    "qd7b_embedding_near_dup_pruned",
    "q36_approx_aggregates",
    # r14: the quantized-dgemm pair kernel (qd7b's throughput twin),
    # the SimHash recall audits (bounded eval — constant cost), and
    # the collapsed pairing they measure
    "qd7c_embedding_near_dup_blas",
    "qd9r_simhash_recall_audit",
    "qd9c_simhash_pairs_collapsed",
    "qd9r2_simhash_recall_audit_collapsed",
    "qs30_cosine_topk_bucketed_blas_sized",
]
# Not benched by design (all oracle-checked for correctness):
# - qd8_dedup_components / qd10_semantic_dedup_components: iterative
#   (one job per propagation round) — at toy SF the timing is all
#   per-round scheduling overhead, not throughput; meaningless to
#   extrapolate.
# - q44_flagship_partition_ready: its point is removing q00's global
#   sort at the SINK, but Catalyst's EliminateSorts removes a
#   top-level sort under this bench's count() action anyway — a
#   count-terminal bench is blind to the difference. The measured
#   partitioned-parquet WRITE delta is recorded in PERFORMANCE.md.


def _calibration(spark, sf_dir: str, reps: int = 3) -> dict[str, float]:
    """Fixed-work probes recorded as ``_calibration`` in every bench
    JSON so cross-round ratios can be normalized for box drift
    (BENCH_r04→r05 drifted ~1.4x uniformly, swallowing real wins).

    ``cpu_sec``: a pure-codegen range fold — constant work, no IO, no
    data dependence, the cleanest box-speed probe. ``scan_sec``: a
    lineitem scan+aggregate — same row count every round at a given
    sf, exercising the parquet read path the queries share. To
    drift-normalize round A vs round B, divide per-query times by the
    rounds' respective calibration times."""
    def cpu() -> None:
        spark.range(0, 1_000_000_000, 1, 32).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()

    def scan() -> None:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
            "sum(l_extendedprice * (1.0 - l_discount)) AS rev",
            "count(*) AS n",
        ).collect()

    def job() -> None:
        # r14: fixed per-JOB scheduler latency — 10 trivial actions.
        # cpu_sec/scan_sec measure throughput; neither captures the
        # per-job fixed cost, which varies ~5-10x across sandbox
        # classes (measured 0.10-0.16 s/job on the r14 box vs the
        # ~0.02-0.04 s/job the r13 numbers imply) and dominates
        # multi-job queries (Lloyd loops, streaming triggers, AQE
        # stage rounds) at toy SF. Recorded so cross-round per-query
        # deltas can be attributed to code vs box. ~(value/10 -
        # cheap-eval) approximates seconds per job.
        for _ in range(10):
            spark.range(1).selectExpr("count(*)").collect()

    out: dict[str, float] = {}
    for key, fn in (("cpu_sec", cpu), ("scan_sec", scan), ("job_sec", job)):
        fn()  # warm
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        out[key] = round(min(runs), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry = load_all()
    names = [n for n in HEADLINE + HEADLINE_EXT if n in registry]

    # 4g: measured sweet spot on this box — very large heaps (24g+) trigger
    # a ~20x G1 slowdown on collect_list-heavy plans (humongous allocations);
    # 1-4g are equivalent and fast. sf0.1 fits comfortably.
    spark = get_spark(
        "bench",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
        # keep stdout parseable: the only stdout line must be the JSON
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # Store-build / serve split (r9 verdict item #4): the
    # manifest/PQ-store queries (qs22b, qst7, qst8) conflate a
    # one-time persisted-store build with recurring serving when the
    # store root is cold — and the default root persists across
    # rounds, so whether a round paid the build depended on disk
    # state. The bench now pins the store root to a FRESH temp dir
    # (no cross-round disk dependence) and times the one-time builds
    # HERE, into the separate ``queries_build`` field; the timed reps
    # below then measure steady-state recurring cost for every row —
    # the qs22b ladder-row convention. (SPARK_GRAFT_MODEL_STORE is
    # deliberately NOT set: qs18/qs19/qs25/qs27 keep their in-process
    # memo path so their rows stay comparable to r9.)
    import tempfile

    from spotify_pipeline_gcp_spark.queries.similarity import (
        ensure_ivfm_manifest,
        ensure_pq_store,
    )

    os.environ["SPARK_GRAFT_MANIFEST_DIR"] = tempfile.mkdtemp(
        prefix="spark_graft_bench_stores_"
    )
    builds: dict[str, float] = {}
    for bname, ensure in (
        ("qs22b+qst7_ivfm_manifest_build", ensure_ivfm_manifest),
        ("qst8_pq_store_build", ensure_pq_store),
    ):
        t0 = time.time()
        ensure(spark, sf_dir)
        builds[bname] = round(time.time() - t0, 3)

    # Warmup pass: execute every plan once untimed. First execution pays
    # whole-stage-codegen compilation + JIT + page-cache fill (seconds of
    # fixed overhead, independent of data volume). The timed pass then
    # measures steady-state throughput — the number that extrapolates to
    # cluster scale, where per-plan compile cost is noise.
    for name in names:
        registry[name].fn(spark, sf_dir).count()

    # min of three timed runs: this box shows ±2-3x run-to-run
    # variance (shared machine); the minimum is the least-noisy
    # steady-state estimate and what extrapolates to per-row cluster
    # throughput. The median is recorded alongside so a regression
    # can be told apart from one noisy rep (min stable + median up =
    # noise; both up = real).
    reps = 3
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            registry[name].fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[reps // 2], 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_build": builds,
        "_calibration": _calibration(spark, sf_dir),
        "sf": sf,
    }
    # The driver captures only the LAST 2000 stdout characters and
    # parses them as JSON — r7's full 69-query line (~3.5 kB) lost
    # its head to that bound, leaving the driver record `parsed:
    # null`. The full result (min + median per query, calibration)
    # goes to BENCH.json; stdout gets a line GUARANTEED under the
    # tail window: totals + calibration + per-query mins added in
    # registry order only while the serialized line stays ≤1800
    # bytes, with a count of what was elided and the file that
    # carries it.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )
    with open(out_path, "w") as fh:
        json.dump(result, fh, separators=(",", ":"))
        fh.write("\n")

    stdout_budget = 1800
    compact = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "queries": {},
        "queries_elided": 0,
        "detail": "BENCH.json",
        "_calibration": result["_calibration"],
        "sf": sf,
    }
    for name in names:
        compact["queries"][name] = timings[name]
        compact["queries_elided"] = len(names) - len(compact["queries"])
        if len(json.dumps(compact, separators=(",", ":"))) > stdout_budget:
            del compact["queries"][name]
            compact["queries_elided"] = len(names) - len(compact["queries"])
            break
    # Last-ditch guard (ADVICE r8): if the FIXED payload alone ever
    # outgrows the budget (eliding every query is not enough), drop
    # _calibration — it is already persisted in BENCH.json — rather
    # than print a line the driver's 2000-char tail would truncate
    # into unparseable JSON.
    if (
        len(json.dumps(compact, separators=(",", ":"))) > stdout_budget
        and "_calibration" in compact
    ):
        del compact["_calibration"]
    print(json.dumps(compact, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
