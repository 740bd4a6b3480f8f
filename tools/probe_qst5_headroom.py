"""qst5 headroom probe (r12 verdict item #5): a 2x micro-batch on the
near-dup stream at the factor1000 corpus.

At the 5 M-doc rung qst5's recorded row ran at heap 1953 MB of 4 g
with GC at 56% of wall — one rung or one 2x batch from death. The
recorded shape is a ~1.25 M-doc delta (sources src15-src19 of 20)
against a ~3.75 M-doc corpus. This probe runs the SAME machinery
(`run_near_dup_stream` via `streaming_incremental_near_dup`) with a
DOUBLED delta — src10-src19, ~2.5 M docs in one AvailableNow
micro-batch against the remaining ~2.5 M-doc corpus — under the rung
discipline (fresh 4 g JVM, solo, watchdog via wall timeout, heap/GC
probes). Outcome is written to SCALE_BENCH_r13.json under
"probes.qst5_batch2x": green means the operator has >=2x batch
headroom at the terminal rung; a death means the recorded batch size
IS the contract bound and run_near_dup_stream's docstring says so.

Usage: python tools/probe_qst5_headroom.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_r9 import DRIVER_MEM, SCALED_1000, _jvm_probe  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r13.json",
)
# the recorded qst5 rung row uses src15-19 (~1.25 M docs); the probe
# doubles the single micro-batch to src10-19 (~2.5 M docs)
BATCH_2X_SOURCES = [f"src{i}" for i in range(10, 20)]


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit("probe pins the 4g memory contract")
    from spotify_pipeline_gcp_spark.streaming.incremental import (
        streaming_incremental_near_dup,
    )

    spark = get_spark(
        "probe_qst5",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    store = tempfile.mkdtemp(prefix="qst5_probe_store_")
    try:
        h0, g0, _ = _jvm_probe(spark)
        t0 = time.time()
        out = streaming_incremental_near_dup(
            spark, SCALED_1000, BATCH_2X_SOURCES, store_dir=store
        )
        rows = out.count()
        wall = time.time() - t0
        h1, g1, _ = _jvm_probe(spark)
    finally:
        # the same /tmp-leak class qd14 fixed in r13: the store dir is
        # probe-scoped scratch, removed even on a mid-run death
        shutil.rmtree(store, ignore_errors=True)
    row = {
        "wall_sec": round(wall, 1),
        "rows": rows,
        "gc_sec": round(g1 - g0, 1),
        "heap_mb": max(0, round(h1 - h0)),
        "delta_sources": BATCH_2X_SOURCES,
        "note": "2x micro-batch (~2.5M docs) vs the recorded rung row's "
        "~1.25M-doc batch; same machinery, fresh 4g JVM, solo",
    }
    print(f"[probe] qst5_batch2x: {row}", flush=True)
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    doc.setdefault("probes", {})["qst5_batch2x"] = row
    # atomic replace (the scale_r11._save discipline): a crash mid-dump
    # must never truncate the shared bench file
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, OUT)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
