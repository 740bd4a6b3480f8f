"""Round-11 scale ladder: verify the r10 closers, extend the rung.

What changed since scale_r10 (whose methodology this inherits: one
fresh 4 g JVM per factor1000 row, strictly serialized, 600 s
watchdog, noop-drain + Observation row counts, fresh store dirs for
WARM_BUILD queries):

- **min-of-2 for EVERY scaled row** (r10 verdict item #5): r10
  re-measured only rows under 120 s, and qd9b's recorded 295.9 s row
  was ~1.85x its stageprof profile (160 s, same data, fresh JVM) —
  box-state variance became the recorded number. Policy now: every
  scaled row is the min of two runs, EXCEPT rows whose first run
  exceeds 450 s (watchdog-adjacent — a repeat risks burning 2x600 s
  for one row; such rows record ``"single_run": true`` so the reader
  knows the number is a one-shot).
- **The quantized-exact assignment builds** (this round): the ivfm
  manifest (qst7/qs22b) and the IVFPQ store (qs19b) route their n·k
  corpus assignment through ``assign_clusters_quant_blas`` — integer
  dots a dgemm computes bit-identically to the SQL fold, so the
  builds run at BLAS throughput AND stay hash-verified. This rung
  exists to measure that: qs19/qst7 were r10's two named >600 s
  build timeouts, qs25's build crashed (SparkContext shut down).
- **Rung extension** (r10 verdict item #7): the family heads not yet
  attempted at 1000x — qd14 (near-dup export DAG), qst5/qst6
  (streaming near-dup/export-gate over documents), qe2 (knn label
  vote), qs20 (hybrid RRF), qs29 (IMI recall audit).

factor100 refresh (r10 verdict item #6): the r9 full-registry sweep
rows predate the signed-permutation generator fix and the 32 MB scan
splits; ``factor100`` here re-runs the r9 FACTOR100 + SWEEP100 union
on the REGENERATED /tmp/spark_graft_sf10 so every recorded 100x row
is current-data vintage.

Fills SCALE_BENCH_r11.json incrementally (resumes by default; explicit
names re-measure). Usage:
    python tools/scale_r11.py [factor1000|factor100] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

import scale_r9  # noqa: E402
import scale_r10  # noqa: E402
from scale_r9 import (  # noqa: E402
    BASE,
    DRIVER_MEM,
    SCALED_100,
    SCALED_1000,
    QueryTimeout,
    _jvm_probe,
)
from scale_r10 import WARM_BUILD, _fresh_manifest_dir, run_one  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r11.json",
)

# Rows whose first run exceeds this are NOT repeated (watchdog-adjacent
# one-shots, marked "single_run": true); everything else is min-of-2.
SINGLE_RUN_ABOVE_SEC = 450

# The r11 1000x work-list: r10's unverified/failed closers first, the
# variance re-measure, then the never-attempted family heads. All read
# documents and/or embeddings only (the selective scaled dir has no
# TPC-H/events tables).
FACTOR1000 = [
    # r10 closers to verify (verdict items #1/#2/#4)
    "qs19b_cosine_topk_ivfpq_store",
    "qst7_streaming_index_maintenance",
    "qs22b_ann_index_maintenance_manifest",
    "qs25_cosine_topk_imi_adc",
    # variance re-measure under the min-of-2 policy (item #5)
    "qd9b_simhash_pairs_capped",
    # rung extension (item #7)
    "qe2_knn_label_vote",
    "qs20_hybrid_rrf",
    "qs29_imi_recall_audit",
    "qd14_near_dup_export",
    "qst5_streaming_incremental_near_dup",
    "qst6_streaming_export_gate",
]

# factor100 refresh: the r9 sweep union, re-run on regenerated data.
FACTOR100 = scale_r9.FACTOR100 + [
    n for n in scale_r9.SWEEP100 if n not in scale_r9.FACTOR100
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
            "policy": f"min-of-2, single-run above {SINGLE_RUN_ABOVE_SEC}s",
            "queries": {},
        },
    )
    try:
        scaled_cal = _calibration(spark, scaled_dir)
    except Exception:
        scaled_cal = {"note": "no lineitem in selective scaled dir"}
    sec["_calibration"] = {
        "base": _calibration(spark, BASE),
        "scaled": scaled_cal,
    }
    _save(doc)

    def _revive(spark):
        try:
            alive = not spark.sparkContext._jsc.sc().isStopped()
        except Exception:
            alive = False
        if alive:
            return spark
        print("[ladder] session died — restarting a fresh 4g JVM", flush=True)
        return get_spark(
            "scale_r11_revived",
            driver_memory=DRIVER_MEM,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )

    def _record(payload):
        sec["queries"][name] = payload
        d = _load()
        d[factor_key] = sec
        _save(d)

    for name in names:
        os.environ.pop("SPARK_GRAFT_MANIFEST_DIR", None)
        os.environ.pop("SPARK_GRAFT_MODEL_STORE", None)
        if factor >= 1000:
            # per-query JVM isolation (the r10 cross-contamination fix)
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            spark = get_spark(
                "scale_r11_q",
                driver_memory=DRIVER_MEM,
                extra_conf={"spark.ui.showConsoleProgress": "false"},
            )
        fn = registry[name].fn
        drain = name in scale_r9.SWEEP_DRAIN or factor >= 1000
        extra = {"drain": "noop"} if drain else {}
        try:
            if name in WARM_BUILD:
                _fresh_manifest_dir(f"{name}_base")
                t0 = time.time()
                # drain=True: the build pre-run exists to BUILD the
                # store — collect()ing the serve result here pushed a
                # 10M-row py4j fetch into the 4g build phase at the
                # 1000x rung (qs19b's reproduced build OOM; qs25's
                # 334s build row included the same hidden fetch)
                run_one(spark, fn, BASE, drain=True)
                extra["base_build_sec"] = round(time.time() - t0, 3)
            tb, nb = run_one(spark, fn, BASE, drain)
            t2, _ = run_one(spark, fn, BASE, drain)
            tb = min(tb, t2)
        except QueryTimeout as ex:
            _record({"timeout_sec": scale_r9.MAX_QUERY_SEC, "err": str(ex)})
            print(f"[{factor_key}] {name}: TIMEOUT at base", flush=True)
            continue
        except Exception as ex:  # noqa: BLE001
            _record({"err": f"base: {type(ex).__name__}: {ex}"[:400]})
            print(f"[{factor_key}] {name}: ERROR at base ({type(ex).__name__})", flush=True)
            spark = _revive(spark)
            continue
        if name in WARM_BUILD:
            _fresh_manifest_dir(f"{name}_f{factor}")
            h0, g0, _c0 = _jvm_probe(spark)
            t0 = time.time()
            try:
                run_one(spark, fn, scaled_dir, drain=True)
            except (QueryTimeout, Exception) as ex:  # noqa: B014
                _record(
                    {
                        "base_sec": round(tb, 3),
                        "base_rows": nb,
                        "err": f"build: {type(ex).__name__}: {ex}"[:400],
                        **(
                            {"timeout_sec": scale_r9.MAX_QUERY_SEC}
                            if isinstance(ex, QueryTimeout)
                            else {}
                        ),
                    }
                )
                print(f"[{factor_key}] {name}: FAILED in build ({type(ex).__name__})", flush=True)
                if not isinstance(ex, QueryTimeout):
                    spark = _revive(spark)
                continue
            extra["scaled_build_sec"] = round(time.time() - t0, 3)
            extra["build_gc_sec"] = round(_jvm_probe(spark)[1] - g0, 1)
        h0, g0, _c0 = _jvm_probe(spark)
        try:
            ts, ns = run_one(spark, fn, scaled_dir, drain)
            if ts <= SINGLE_RUN_ABOVE_SEC:
                t2, _ = run_one(spark, fn, scaled_dir, drain)
                ts = min(ts, t2)
            else:
                extra["single_run"] = True
        except QueryTimeout as ex:
            _record(
                {
                    "base_sec": round(tb, 3),
                    "base_rows": nb,
                    "timeout_sec": scale_r9.MAX_QUERY_SEC,
                    "err": str(ex),
                    **extra,
                }
            )
            print(f"[{factor_key}] {name}: TIMEOUT at scaled", flush=True)
            continue
        except Exception as ex:  # noqa: BLE001
            _record(
                {
                    "base_sec": round(tb, 3),
                    "base_rows": nb,
                    "err": f"scaled: {type(ex).__name__}: {ex}"[:400],
                    **extra,
                }
            )
            print(f"[{factor_key}] {name}: ERROR at scaled ({type(ex).__name__})", flush=True)
            spark = _revive(spark)
            continue
        h1, g1, c1 = _jvm_probe(spark)
        _record(
            {
                "base_sec": round(tb, 3),
                "scaled_sec": round(ts, 3),
                "ratio": round(ts / tb, 2),
                "base_rows": nb,
                "scaled_rows": ns,
                "gc_sec": round(g1 - g0, 1),
                # clamped at 0: the before/after used-heap delta goes
                # negative when a GC lands between the probes (r11
                # recorded qs22b at -740 MB) — a negative delta carries
                # no signal, only "a collection happened mid-row"
                "heap_mb": max(0, round(h1 - h0)),
                "code_cache_mb": round(c1),
                **extra,
            }
        )
        print(
            f"[{factor_key}] {name}: {tb:.2f}s -> {ts:.2f}s "
            f"(x{ts / tb:.1f}; rows {nb} -> {ns}; gc {g1 - g0:.1f}s) {extra}",
            flush=True,
        )


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit(
            "scale_r11 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM"
        )
    which = sys.argv[1] if len(sys.argv) > 1 else "factor1000"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r11",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        run_one(spark, registry["q08_pricing_summary"].fn, BASE)
    except QueryTimeout:
        pass
    if which == "factor1000":
        done = _load().get("factor1000", {}).get("queries", {})
        todo = names or [n for n in FACTOR1000 if n not in done]
        ladder(spark, registry, todo, SCALED_1000, "factor1000", 1000)
    if which == "factor100":
        done = _load().get("factor100", {}).get("queries", {})
        todo = [n for n in (names or FACTOR100) if n not in done]
        ladder(spark, registry, todo, SCALED_100, "factor100", 100)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
