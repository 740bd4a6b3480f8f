"""Per-query job/stage census: wall seconds vs number of Spark jobs.

On boxes with high per-job scheduling latency (this sandbox: ~0.1 s
per job measured by the `_calibration.job_sec` probe), a query's
fixed overhead is ~(jobs x per-job latency); this tool attributes it.
Job counts are also a real scale signal: every job is a full barrier
(AQE shuffle materialization, Lloyd-iteration collects, micro-batch
triggers), so reducing them helps at any latency.

Usage: python tools/jobcount.py <sf_dir> <query> [...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.queries import load_all  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    registry = load_all()
    spark = get_spark(
        "jobcount",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    print(f"{'query':45s} {'wall_s':>7s} {'jobs':>5s} {'stages':>6s}")
    for name in names:
        fn = registry[name].fn
        fn(spark, sf_dir).count()  # warm
        group = f"jc_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(group)
        stages = 0
        for jid in jobs:
            info = tracker.getJobInfo(jid)
            if info is not None:
                stages += len(info.stageIds)
        print(f"{name:45s} {wall:7.2f} {len(jobs):5d} {stages:6d}")
    spark.stop()


if __name__ == "__main__":
    main()
