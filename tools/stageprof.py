"""Per-stage wall-clock attribution for one registered query.

The r8 close-out found qs19/qs27/qs22b-build all share an ~830 s
floor at the 100x ladder point while their isolated stage timings
(trainer ~100 s, assignment ~80 s, encode ~17 s, lookup-table folds
~15 s) sum to well under half of it -- the end-to-end runs pay a
large shared cost that per-stage count() probes do not reproduce.
This tool runs ONE query with the Spark UI enabled and dumps the
REST stage table (duration, task count, name) so the gap can be
attributed to real stages instead of estimates.

Usage: python tools/stageprof.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from spotify_pipeline_gcp_spark.queries import load_all
    from spotify_pipeline_gcp_spark.session import get_spark

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf10"
    spark = get_spark(
        "stageprof",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    fn = load_all()[name].fn
    t0 = time.time()
    df = fn(spark, sf_dir)
    t1 = time.time()
    print(f"plan-build (incl. trainer collects): {t1 - t0:.1f}s", flush=True)
    rows = len(df.collect())
    print(f"collect: {time.time() - t1:.1f}s rows={rows}", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    def dur(s):
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            b = datetime.strptime(s["completionTime"], fmt)
            return (b - a).total_seconds()
        except Exception:
            return 0.0

    ranked = sorted(stages, key=dur, reverse=True)
    total = sum(dur(s) for s in stages)
    print(f"sum of stage walls: {total:.1f}s over {len(stages)} stages")
    for s in ranked[:15]:
        print(
            f"{dur(s):8.1f}s stage {s['stageId']:4d} tasks={s['numTasks']:5d} "
            f"{s['name'][:80]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
