"""Round-8 scale ladder: the qs19 memory-bound rewrite under a 4 g
driver, the manifest-backed qs22b maintenance path (recurring cost),
and the r7 verdict's re-measure set (qd14/qs20/qe2 — oracle/shared-
helper changes since their r6 numbers), at 10x and 100x replicas of
sf0.1.

Fills SCALE_BENCH_r08.json incrementally (one JSON rewrite per
measured query, so partial progress survives interruption) with the
same row shape the r6/r7 ladders used: base_sec / scaled_sec / ratio
/ base_rows / scaled_rows, plus _calibration probes for both dirs.

Methodology (r7's): base (sf0.1) runs twice, min taken; scaled runs
once, re-run and min'd only when the first run is cheap (<30 s).
Heavier queries run last so cheap rows land early. For qs22b the
UNTIMED first call builds the index manifest; the timed reps then
measure the recurring maintenance path — exactly the cost split a
deployed maintainer sees (the build itself is qs22's measured
number).

Usage: python tools/scale_r8.py [factor10|factor100|both] [name ...]
(explicit names override the built-in lists for follow-up passes)
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
    "SCALE_BENCH_r08.json",
)

# queries whose manifest is built untimed before measuring (the
# recurring-path split the qs22b docstring documents)
WARM_BUILD = {"qs22b_ann_index_maintenance_manifest"}

FACTOR10 = [
    "qs22b_ann_index_maintenance_manifest",
    "qs19_cosine_topk_ivfpq",
]
FACTOR100 = [
    "qe2_knn_label_vote",
    "qs20_hybrid_rrf",
    "qd14_near_dup_export",
    "qs22b_ann_index_maintenance_manifest",
    "qs19_cosine_topk_ivfpq",
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
        {"base": BASE, "scaled": scaled_dir, "factor": factor, "queries": {}},
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
            t0 = time.time()
            run_one(spark, fn, scaled_dir)
            extra["scaled_build_sec"] = round(time.time() - t0, 3)
        ts, ns = run_one(spark, fn, scaled_dir)
        if ts < 30:
            t2, _ = run_one(spark, fn, scaled_dir)
            ts = min(ts, t2)
        sec["queries"][name] = {
            "base_sec": round(tb, 3),
            "scaled_sec": round(ts, 3),
            "ratio": round(ts / tb, 2),
            "base_rows": nb,
            "scaled_rows": ns,
            **extra,
        }
        print(
            f"[{factor_key}] {name}: {tb:.2f}s -> {ts:.2f}s "
            f"(x{ts / tb:.1f}; rows {nb} -> {ns}) {extra}",
            flush=True,
        )
        doc = _load()
        doc[factor_key] = sec
        _save(doc)


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r8",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    run_one(spark, registry["q08_pricing_summary"].fn, BASE)  # warm session
    if which in ("factor10", "both"):
        ladder(
            spark, registry, names or FACTOR10, SCALED_10, "factor10", 10
        )
    if which in ("factor100", "both"):
        ladder(
            spark,
            registry,
            names or FACTOR100,
            SCALED_100,
            "factor100",
            100,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
