"""Same-data A/B: raw-float32 packing + in-kernel normalize (raw=True)
vs the JVM-fold unit-vector packing (raw=False) for the three packed-
block BLAS kernels, at the factor1000 rung.

Both sides are the SAME HEAD — ``raw=False`` reproduces the pre-change
plan exactly (the flag gates the old code path verbatim), so this is a
controlled same-session, same-data A/B per the r14 measurement policy.
Each (query, side, rep) runs in a fresh 4 g JVM, noop-drained; sides
are interleaved (B,A,B,A) so box drift cannot masquerade as a win.

Usage: python tools/probe_raw_pack_ab.py [qd7c|qd10|qs30 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALED = "/tmp/spark_graft_sf100"
DRIVER_MEM = "4g"
OUT = "/tmp/probe_raw_pack_ab.json"


def _fresh():
    from spotify_pipeline_gcp_spark.session import get_spark

    return get_spark(
        "probe_raw_ab",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


REG = {
    "qs23": "qs23_cosine_topk_ivf_blas_sized",
    "qs26": "qs26_cosine_topk_imi_blas",
    "qs28": "qs28_cosine_topk_imi_multiprobe_blas",
    "qs10": "qs10_ann_full_blas",
}
_ORIG: dict = {}


def _build_registered(spark, which: str, raw: bool):
    """Run the REGISTERED query fn with the wave-2 operators' ``raw``
    default forced to the requested side (the queries don't pass the
    flag, so patching the module attribute is the whole A/B — the
    query-side code is identical)."""
    import functools

    import spotify_pipeline_gcp_spark.operators.similarity as S
    from spotify_pipeline_gcp_spark.queries import load_all

    for nm in (
        "cosine_topk_kmeans_blas",
        "cosine_topk_imi_blas",
        "cosine_topk_imi_multiprobe_blas",
    ):
        if nm not in _ORIG:
            _ORIG[nm] = getattr(S, nm)
        orig = _ORIG[nm]

        @functools.wraps(orig)
        def forced(*a, _orig=orig, **kw):
            kw["raw"] = raw
            return _orig(*a, **kw)

        setattr(S, nm, forced)
    return load_all()[REG[which]].fn(spark, SCALED)


def _build(spark, which: str, raw: bool):
    if which in REG:
        return _build_registered(spark, which, raw)
    if which == "qs19benc":
        # the IVFPQ store build's fused assign+encode corpus pass
        # (training included — identical on both sides, so the A/B
        # delta is the kernel-input change)
        from spotify_pipeline_gcp_spark.operators.similarity import (
            _unit_vectors,
            ivfpq_assign_encode_quant_blas,
            trained_cells_for,
        )
        from spotify_pipeline_gcp_spark.queries.similarity import _ivfpq_model
        from spotify_pipeline_gcp_spark.pyfiles import (
            ensure_package_on_workers,
        )

        ensure_package_on_workers(spark)
        emb = spark.read.parquet(f"{SCALED}/embeddings.parquet")
        n = emb.count()
        cent, books = _ivfpq_model(
            spark, SCALED, emb, n, trained_cells_for(n)
        )
        if raw:
            return ivfpq_assign_encode_quant_blas(
                emb, cent, books, m=4, d_sub=16,
                id_col="vec_id", u_col="embedding", raw=True,
            )
        return ivfpq_assign_encode_quant_blas(
            _unit_vectors(emb, "vec_id", "embedding"),
            cent, books, m=4, d_sub=16,
        )
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.operators.dedup import dedup_components
    from spotify_pipeline_gcp_spark.operators.similarity import (
        MAX_SIGN_BUCKET,
        cosine_topk_bucketed_blas,
        sign_bits_for,
        sign_bucket_pairs_blas,
    )
    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(spark)
    emb = spark.read.parquet(f"{SCALED}/embeddings.parquet")
    if which == "qd7c":
        return sign_bucket_pairs_blas(emb, threshold=0.45, raw=raw)
    if which == "qd10":
        edges = sign_bucket_pairs_blas(emb, threshold=0.45, raw=raw).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
        comp = dedup_components(edges)
        return comp.select(F.col("doc_id").alias("vec_id"), "component")
    if which == "qs30":
        n_bits = sign_bits_for(emb.count())
        return cosine_topk_bucketed_blas(
            emb,
            k=5,
            n_bits=n_bits,
            quant=True,
            max_bucket=MAX_SIGN_BUCKET,
            raw=raw,
        ).withColumnRenamed("cosine", "cosine_q")
    raise SystemExit(f"unknown query {which}")


def _time_once(which: str, raw: bool) -> float:
    spark = _fresh()
    try:
        spark.sparkContext.setJobDescription(
            f"probe_raw_ab {which} raw={raw}"
        )
        # time build + drain together: qd10's dedup_components runs an
        # eager iterate-materialize loop at CONSTRUCTION time, so the
        # ladder-comparable number includes the fn() call
        t0 = time.time()
        df = _build(spark, which, raw)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        spark.stop()


def main() -> int:
    names = sys.argv[1:] or ["qd7c", "qs30", "qd10"]
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    for which in names:
        row = doc.setdefault(which, {})
        for rep in range(2):
            for raw in (False, True):
                key = "raw" if raw else "jvm_unit"
                t = _time_once(which, raw)
                row[key] = min(row.get(key, 1e9), t)
                row.setdefault(f"{key}_runs", []).append(round(t, 3))
                print(
                    f"[{which}] rep{rep} {key}: {t:.1f}s "
                    f"(min {row[key]:.1f}s)",
                    flush=True,
                )
                tmp = OUT + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(doc, fh, indent=1)
                os.replace(tmp, OUT)
    print(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
