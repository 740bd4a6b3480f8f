"""Round-10 scale ladder: make the 1000x rung a record, not a frontier.

r9 left three watchdog-cancelled rows at factor1000 (qd7b, qd9b,
qs13) and measured only 9 queries there. Round 10 changed what those
rows measure before re-measuring them:

- The scale GENERATOR was the real qd7b/qs13 culprit: per-replica
  additive noise left cross-replica cosines at ~0.999, so the scaled
  corpus had QUADRATIC near-dup structure (9.3e8 in-bucket pairs at
  factor1000) and the cancelled rows measured the data bug, not the
  engine. make_scale_data.py now applies a per-replica signed
  coordinate permutation (orthogonal — base pair structure copied
  exactly, cross-replica cosines ~0); the scaled dirs are REGENERATED,
  so r10 rows are not comparable to r9 rows for the near-dup family.
- Sign-bucket self-joins additionally drop hot buckets
  (MAX_SIGN_BUCKET = 4096, oracle-replayed) — worst-case candidates
  are linear even on adversarially skewed data.
- simhash bit extraction moved from per-(token,bit) instr scans to
  one translate pass per digest (4.7x on the fingerprint aggregate,
  values bit-identical) — qd9b's dominant stage.

Methodology is scale_r9's (one fresh JVM, strictly serialized, 4 g
pinned and REFUSED higher, min-of-2 under 120 s, 600 s per-query
watchdog, per-query gc/heap/code-cache probes), with one fix
(r9 verdict item #6): WARM_BUILD queries always build their
manifest/store into a FRESH round-scoped temp dir
(SPARK_GRAFT_MANIFEST_DIR), so recorded build_sec can never be a
staleness-probe NO-OP against cross-round disk state — the r9
factor100 qs22b row's confound.

Fills SCALE_BENCH_r10.json incrementally. Usage:
    python tools/scale_r10.py [factor10|factor100|factor1000|both] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

import scale_r9  # noqa: E402  (shared probes/watchdog)
from scale_r9 import (  # noqa: E402
    BASE,
    DRIVER_MEM,
    SCALED_10,
    SCALED_100,
    SCALED_1000,
    MAX_QUERY_SEC,
    QueryTimeout,
    _jvm_probe,
)


def run_one(spark, fn, sf_dir: str, drain: bool = False) -> tuple[float, int]:
    """r10 variant of scale_r9.run_one: the drained row count comes
    from an ``Observation`` attached to the SAME noop execution —
    scale_r9 re-ran the full query with count() (untimed) to get
    rows, and at the 1000x rung that second back-to-back execution
    inherited enough first-run JVM state (broadcast/AQE leftovers
    awaiting the context cleaner) to OOM queries that pass cleanly
    solo (qd5: two solo passes, two in-ladder count-rerun OOMs).
    One execution now produces both the timing and the row count."""
    import threading

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

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
            obs = Observation()
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.time() - t0
            return dt, int(obs.get["n"])
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

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r10.json",
)

# Queries whose first run builds a persisted manifest/store via
# ensure_*: build is timed separately (fresh dir — see module
# docstring), then the recorded row is the RECURRING cost.
WARM_BUILD = {
    "qs22b_ann_index_maintenance_manifest",
    "qst7_streaming_index_maintenance",
    "qst8_streaming_ann_serving",
    "qs19_cosine_topk_ivfpq",
    "qs25_cosine_topk_imi_adc",
    "qs27_cosine_topk_ivfpq_gather",
    "qs18_pq_adc_topk",
    "qs19b_cosine_topk_ivfpq_store",
}

# The r10 1000x rung (2 M vectors / 5 M docs, 4 g): every family's
# ladder head (r9 verdict item #5 — >= 15 completed rows, every
# cancellation a named weak item). All read documents and/or
# embeddings only (the selective scaled dir has no TPC-H tables;
# streaming event queries are excluded for the same reason).
FACTOR1000 = [
    # text
    "qt2_quality_score",
    "qt6_repetition_filter",
    "qt11_vocab_stats",
    # exact + near dedup
    "qd1_dedup_exact_groups",
    "qd3b_ngram_jaccard_capped",
    "qd5_minhash_lsh_pairs",
    "qd9b_simhash_pairs_capped",
    "qd7b_embedding_near_dup_pruned",
    "qd10_semantic_dedup_components",
    # ANN: sign-bucket, serving, PQ/IMI/IVFPQ heads
    "qs13_cosine_topk_bucketed_sized",
    "qs15_query_corpus_topk",
    "qs18_pq_adc_topk",
    "qs26_cosine_topk_imi_blas",
    "qs19_cosine_topk_ivfpq",
    "qs19b_cosine_topk_ivfpq_store",
    "qs25_cosine_topk_imi_adc",
    # sampling + corpus prep
    "qsp5_temperature_resample",
    "qsp6_exact_quota_sample",
    "qp5_export_manifest",
    # streaming lifecycle over embeddings (build split out)
    "qst7_streaming_index_maintenance",
    "qst8_streaming_ann_serving",
    # multimodal
    "qm3_payload_features",
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


def _fresh_manifest_dir(tag: str) -> str:
    """Round-scoped store root: every WARM_BUILD build lands in a new
    empty dir, so build_sec is a true fresh build (never a staleness
    NO-OP against a pre-existing manifest — the r9 qs22b confound).
    Also points SPARK_GRAFT_MODEL_STORE there, so the trained-model
    families (qs18/qs19/qs25/qs27) run the DURABLE store path: build
    row = train + persist, recurring row = fresh-session serving from
    the store (r9 verdict item #3's done criterion) instead of the
    in-process memo, which would measure a handle lookup."""
    d = tempfile.mkdtemp(prefix=f"spark_graft_r10_{tag}_")
    os.environ["SPARK_GRAFT_MANIFEST_DIR"] = d
    os.environ["SPARK_GRAFT_MODEL_STORE"] = d
    return d


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
        scaled_cal = {"note": "no lineitem in selective scaled dir"}
    sec["_calibration"] = {
        "base": _calibration(spark, BASE),
        "scaled": scaled_cal,
    }
    _save(doc)
    def _revive(spark):
        """A query OOM can take the whole local JVM down (executor ==
        driver); without this, one bad row aborts the remaining rung
        (the r10 qt11 crash lost 17 queued rows). Record the error,
        restart a fresh 4 g session, keep going."""
        try:
            alive = not spark.sparkContext._jsc.sc().isStopped()
        except Exception:
            alive = False
        if alive:
            return spark
        print("[ladder] session died — restarting a fresh 4g JVM", flush=True)
        return get_spark(
            "scale_r10_revived",
            driver_memory=DRIVER_MEM,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )

    for name in names:
        # store envs are per-query state: WARM_BUILD queries point them
        # at a fresh dir below; everything else must run the default
        # (memo) path or its row silently measures store-read serving
        os.environ.pop("SPARK_GRAFT_MANIFEST_DIR", None)
        os.environ.pop("SPARK_GRAFT_MODEL_STORE", None)
        if factor >= 1000:
            # PER-QUERY JVM ISOLATION at the 1000x rung: three drained
            # 5M-row queries left ~4 GB of used heap in one session and
            # the next four queries OOM'd back-to-back within seconds
            # (qd1 cascade, r10) — retained/uncollected state from one
            # row was degrading the next, which is exactly the
            # cross-contamination the serialized methodology exists to
            # prevent. ~15 s startup per row buys rows that are
            # independent and comparable; base (sf0.1) reps share the
            # fresh JVM with their scaled run.
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            spark = get_spark(
                "scale_r10_q",
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
                run_one(spark, fn, BASE)
                extra["base_build_sec"] = round(time.time() - t0, 3)
            tb, nb = measure(spark, fn, BASE, reps=2, drain=drain)
        except QueryTimeout as ex:
            sec["queries"][name] = {"timeout_sec": scale_r9.MAX_QUERY_SEC, "err": str(ex)}
            print(f"[{factor_key}] {name}: TIMEOUT at base ({ex})", flush=True)
            doc = _load()
            doc[factor_key] = sec
            _save(doc)
            continue
        except Exception as ex:  # noqa: BLE001 — one bad row must not abort the rung
            sec["queries"][name] = {"err": f"base: {type(ex).__name__}: {ex}"[:400]}
            print(f"[{factor_key}] {name}: ERROR at base ({type(ex).__name__})", flush=True)
            doc = _load()
            doc[factor_key] = sec
            _save(doc)
            spark = _revive(spark)
            continue
        if name in WARM_BUILD:
            _fresh_manifest_dir(f"{name}_f{factor}")
            h0, g0, _c0 = _jvm_probe(spark)
            t0 = time.time()
            try:
                run_one(spark, fn, scaled_dir)
            except (QueryTimeout, Exception) as ex:  # noqa: B014
                sec["queries"][name] = {
                    "base_sec": round(tb, 3),
                    "base_rows": nb,
                    "err": f"build: {type(ex).__name__}: {ex}"[:400],
                    **(
                        {"timeout_sec": scale_r9.MAX_QUERY_SEC}
                        if isinstance(ex, QueryTimeout)
                        else {}
                    ),
                }
                print(f"[{factor_key}] {name}: FAILED in build ({type(ex).__name__})", flush=True)
                doc = _load()
                doc[factor_key] = sec
                _save(doc)
                if not isinstance(ex, QueryTimeout):
                    spark = _revive(spark)
                continue
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
                "timeout_sec": scale_r9.MAX_QUERY_SEC,
                "err": str(ex),
            }
            print(f"[{factor_key}] {name}: TIMEOUT at scaled ({ex})", flush=True)
            doc = _load()
            doc[factor_key] = sec
            _save(doc)
            continue
        except Exception as ex:  # noqa: BLE001 — record, revive, continue
            sec["queries"][name] = {
                "base_sec": round(tb, 3),
                "base_rows": nb,
                "err": f"scaled: {type(ex).__name__}: {ex}"[:400],
            }
            print(f"[{factor_key}] {name}: ERROR at scaled ({type(ex).__name__})", flush=True)
            doc = _load()
            doc[factor_key] = sec
            _save(doc)
            spark = _revive(spark)
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
            "scale_r10 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM"
        )
    which = sys.argv[1] if len(sys.argv) > 1 else "factor1000"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r10",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        run_one(spark, registry["q08_pricing_summary"].fn, BASE)
    except QueryTimeout:
        pass
    if which in ("factor10", "both"):
        ladder(spark, registry, names or scale_r9.FACTOR10, SCALED_10, "factor10", 10)
    if which in ("factor100", "both"):
        ladder(
            spark, registry, names or scale_r9.FACTOR100, SCALED_100,
            "factor100", 100,
        )
    if which == "factor1000":
        done = _load().get("factor1000", {}).get("queries", {})
        # explicit names re-measure; the default list resumes (rows
        # land incrementally, so a second invocation finishes the
        # rung without re-paying completed queries)
        todo = names or [n for n in FACTOR1000 if n not in done]
        ladder(spark, registry, todo, SCALED_1000, "factor1000", 1000)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
