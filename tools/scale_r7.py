"""Round-7 scale ladder: the re-pointed trained-ANN family + the
r6 100x holes, measured at 10x and 100x replicas of sf0.1.

Fills SCALE_BENCH_r07.json incrementally (one JSON rewrite per
measured query, so partial progress survives interruption) with the
same row shape the r6 ladder used: base_sec / scaled_sec / ratio /
base_rows / scaled_rows, plus _calibration probes for both dirs.

Methodology: base (sf0.1) runs twice, min taken (warm steady state —
the number that extrapolates); scaled runs once, re-run and min'd
only when the first run is cheap (<30 s), since the heavy trained
runs are the measurement itself. Heavier queries run LAST so cheap
rows land early.

Usage: python tools/scale_r7.py [factor10|factor100|both] [name ...]
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
    "SCALE_BENCH_r07.json",
)

# changed this round (re-measure) + the r6 100x holes, cheap first
FACTOR10 = [
    "qs16_cosine_topk_ivf_sample_trained",
    "qs17_cosine_topk_imi",
    "qs18_pq_adc_topk",
    "qs21_ann_recall_audit",
    "qs19_cosine_topk_ivfpq",
    "qs14_cosine_topk_ivf_kmeans_sized",
]
FACTOR100 = [
    "qt9_chunk_windows",
    "qsp5_temperature_resample",
    "qp6_pack_manifest",
    "qd13_duplicated_spans",
    "qs21_ann_recall_audit",
    "qs17_cosine_topk_imi",
    "qs18_pq_adc_topk",
    "qs16_cosine_topk_ivf_sample_trained",
    "qs19_cosine_topk_ivfpq",
    "qs14_cosine_topk_ivf_kmeans_sized",
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
        tb, nb = measure(spark, fn, BASE, reps=2)
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
        }
        print(
            f"[{factor_key}] {name}: {tb:.2f}s -> {ts:.2f}s "
            f"(x{ts / tb:.1f}; rows {nb} -> {ns})",
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
        "scale_r7",
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
            spark, registry, names or FACTOR100, SCALED_100, "factor100", 100
        )
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
