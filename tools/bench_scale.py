"""Scale bench: the headline queries at sf0.1 AND an N-fold scale-up.

Runs a representative slice of the registry (heavy hitters from every
family) against the driver's sf0.1 dir and the 10x dir produced by
``tools/make_scale_data.py``, and reports per-query seconds plus the
scale ratio. With ~10x the rows, a healthy distributed plan lands
near-linear (ratio ~<=12 with fixed overheads amortizing); a
super-linear ratio marks a scale cliff (quadratic candidate blowup,
single-reducer stage, spill) to fix.

Usage: python tools/bench_scale.py [base_dir] [scaled_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q08_pricing_summary",       # full-scan aggregate
    "q10_segment_revenue_topn",  # customer x orders x lineitem join
    "q22_regional_revenue",      # dim-chain join
    "q30_sessionize",            # event-time windows
    "q48_rank_battery",          # window battery
    "qd2_dedup_exact_keep",      # exact dedup
    "qd4_minhash_signatures",    # wide hash aggregation
    "qd5_minhash_lsh_pairs",     # band join + verify
    "qd9_simhash_pairs",         # bit-band join + popcount
    "qd8_dedup_components",      # iterative label propagation
    "qp2_token_shard_packing",   # two-level prefix sums
    "qt2_quality_score",         # text scoring scan
    "qs3_cosine_topk_bucketed",  # sign-bucket ANN (pinned 16 buckets — known x77 cliff, kept as the cautionary row)
    "qs13_cosine_topk_bucketed_sized",  # AUTO-SIZED sign-bucket ANN — the production shape
    "qs7_cosine_topk_ivf_kmeans",  # trained IVF (train + search; pinned k=16)
    "qs14_cosine_topk_ivf_kmeans_sized",  # AUTO-SIZED trained IVF
    "qs17_cosine_topk_imi",      # two-level IMI — n^(1/4) quantizer cost
    "qs18_pq_adc_topk",          # PQ ADC compressed-domain search
    "qs19_cosine_topk_ivfpq",    # composed IVF+PQ index
    "qd13_duplicated_spans",     # linear substring-level dedup
    "qd11_incremental_near_dup", # incremental near-dup (the every-batch ingest path)
    "qst2_streaming_sessionize", # streaming sessionization
    "qe1_label_centroids",       # wide positional means
    "qsp1_hash_sample",          # digest-threshold sampling
]


def run(spark, fn, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    n = len(fn(spark, sf_dir).collect())
    return time.time() - t0, n


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE_BENCH.json"

    import __spark_entry__ as e

    qs = e.queries()
    # 10x data in one local JVM needs a real heap — the 1g JVM default
    # dies in qd8's checkpoint blocks (bench.py uses 4g at sf0.1)
    spark = get_spark(
        "bench_scale",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    )
    # warm the JVM/codegen on the base dir before timing anything
    run(spark, qs["q08_pricing_summary"], base)

    results = {}
    for name in QUERIES:
        t_base, n_base = run(spark, qs[name], base)
        t_scaled, n_scaled = run(spark, qs[name], scaled)
        ratio = t_scaled / t_base if t_base > 0 else float("inf")
        results[name] = {
            "base_sec": round(t_base, 3),
            "scaled_sec": round(t_scaled, 3),
            "ratio": round(ratio, 2),
            "base_rows": n_base,
            "scaled_rows": n_scaled,
        }
        print(
            f"{name}: {t_base:.2f}s -> {t_scaled:.2f}s "
            f"(x{ratio:.1f}; rows {n_base} -> {n_scaled})",
            flush=True,
        )

    from bench import _calibration  # repo-root bench.py (same sys.path insert)

    doc = {
        "base": base,
        "scaled": scaled,
        "factor": int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10")),
        "queries": results,
        "_calibration": {
            "base": _calibration(spark, base),
            "scaled": _calibration(spark, scaled),
        },
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"written": out_path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
