"""r15 evidence probe (VERDICT r14 #3): BLAS block sizing from data
volume. Packs the 2 M-vector rung corpus with the OLD cores-derived
block count (8 at 32 cores) and the NEW data-derived default
(max(cores floor, scan_bytes/32MB) = 16 at this corpus), and records
per-block row counts / estimated payload bytes plus the pack+drain
wall time per side (fresh 4 g JVM per side, noop-drained).

Note on scope: brute-force SCORING at 2 M vectors is O(n^2·d) =
2.6e14 FLOPs — not a runnable row at ANY block count (qs4/qs8/qs10
are pinned sf0.1 demonstrations; their docstrings route scale use to
the sized paths). What the block count bounds is the PACKED BLOCK
itself — one collect_list row per block, one shuffle record, one
Arrow cell (2 GiB hard cap) — which is exactly what this probe
measures.

Usage: python tools/probe_blas_blocks_r15.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALED = "/tmp/spark_graft_sf100"
OUT = "/tmp/probe_blas_blocks_r15.json"


def _pack_stats(n_blocks: int) -> dict:
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.session import get_spark

    spark = get_spark(
        f"probe_blocks_{n_blocks}",
        driver_memory="4g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        spark.sparkContext.setJobDescription(f"pack B={n_blocks}")
        emb = spark.read.parquet(f"{SCALED}/embeddings.parquet")
        base = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        )
        packed = (
            base.withColumn(
                "blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks))
            )
            .groupBy("blk")
            .agg(F.collect_list(F.struct("id", "v")).alias("items"))
        )
        t0 = time.time()
        packed.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        rows = packed.select(
            "blk", F.size("items").alias("n")
        ).collect()
        sizes = sorted(r["n"] for r in rows)
        d = 64
        per_row_bytes = d * 4 + 8  # float32 payload + id
        return {
            "n_blocks": len(sizes),
            "rows_min": sizes[0],
            "rows_max": sizes[-1],
            "block_bytes_max_mb": round(
                sizes[-1] * per_row_bytes / 2**20, 1
            ),
            "pack_drain_sec": round(wall, 1),
        }
    finally:
        spark.stop()


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    out = {}
    for label, b in (("old_cores_derived", 8), ("new_data_derived", 16)):
        out[label] = _pack_stats(b)
        print(label, out[label], flush=True)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
