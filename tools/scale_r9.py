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


def run_one(spark, fn, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    n = len(fn(spark, sf_dir).collect())
    return time.time() - t0, n


def measure(spark, fn, sf_dir: str, reps: int) -> tuple[float, int]:
    best, rows = run_one(spark, fn, sf_dir)
    for _ in range(reps - 1):
        t, _n = run_one(spark, fn, sf_dir)
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
    sec["_calibration"] = {
        "base": _calibration(spark, BASE),
        "scaled": _calibration(spark, scaled_dir),
    }
    _save(doc)
    for name in names:
        fn = registry[name].fn
        extra = {}
        if name in WARM_BUILD:
            t0 = time.time()
            run_one(spark, fn, BASE)
            extra["base_build_sec"] = round(time.time() - t0, 3)
        tb, nb = measure(spark, fn, BASE, reps=2)
        if name in WARM_BUILD:
            h0, g0, _c0 = _jvm_probe(spark)
            t0 = time.time()
            run_one(spark, fn, scaled_dir)
            extra["scaled_build_sec"] = round(time.time() - t0, 3)
            extra["build_gc_sec"] = round(_jvm_probe(spark)[1] - g0, 1)
        h0, g0, _c0 = _jvm_probe(spark)
        ts, ns = run_one(spark, fn, scaled_dir)
        if ts < 120:
            t2, _ = run_one(spark, fn, scaled_dir)
            ts = min(ts, t2)
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
    run_one(spark, registry["q08_pricing_summary"].fn, BASE)  # warm session
    if which in ("factor10", "both"):
        ladder(spark, registry, names or FACTOR10, SCALED_10, "factor10", 10)
    if which in ("factor100", "both"):
        ladder(
            spark, registry, names or FACTOR100, SCALED_100, "factor100", 100
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
