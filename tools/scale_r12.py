"""Round-12 scale ladder: verify the r11 failure fixes, extend the rung.

Methodology is scale_r11's verbatim (one fresh 4 g JVM per factor1000
row, strictly serialized, 600 s watchdog, noop-drain + Observation row
counts, fresh store dirs for WARM_BUILD queries, min-of-2 for every
scaled row except >450 s one-shots) — this module reuses its ``ladder``
with the output redirected to SCALE_BENCH_r12.json. One sampler fix
(r11 verdict item #8): ``heap_mb`` is clamped at 0 — the before/after
used-heap delta goes negative when a GC lands between the probes
(qs22b's r11 row recorded -740 MB).

The r12 1000x work-list:

- **r11's three named failures, re-run against their fixes** (verdict
  items #1/#2): qst5/qst6 (text-payload working sets in the streaming
  batch sinks) and qd14 (spill-merge OOM in the pair-scale verify
  sort).
- **qs25 clean re-measure** (item #4): its r11 330.0 s build_sec
  predates the WARM_BUILD noop-drain harness fix and carries a hidden
  10 M-row collect; qs19b's row was recorded after the fix and is
  clean.
- **Rung extension to never-attempted family heads** (item #7): qp2/
  qp3/qp6 (two-level prefix-sum packing/selection/assembly), qt7
  (broadcast benchmark contamination), qd8/qd12/qd13 (components /
  keep-best / duplicated spans), qst2 (streaming sessionize — the
  scaled dir now carries a 100 M-row events table for it).

Fills SCALE_BENCH_r12.json incrementally (resumes by default; explicit
names re-measure). Usage:
    python tools/scale_r12.py [factor1000|factor100] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_r9  # noqa: E402
import scale_r11  # noqa: E402
from scale_r9 import DRIVER_MEM, SCALED_100, SCALED_1000, QueryTimeout  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r12.json",
)
# scale_r11's ladder/_load/_save read the module-global OUT at call
# time; repointing it is the whole "new round" — the methodology is
# deliberately identical so rows stay comparable across rounds.
scale_r11.OUT = OUT

FACTOR1000 = [
    # r11 failures, fixed this round (verdict items #1/#2)
    "qd14_near_dup_export",
    "qst5_streaming_incremental_near_dup",
    "qst6_streaming_export_gate",
    # clean build re-measure post harness fix (item #4)
    "qs25_cosine_topk_imi_adc",
    # rung extension (item #7)
    "qp2_token_shard_packing",
    "qp3_token_budget_selection",
    "qp6_pack_manifest",
    "qt7_contamination",
    "qd8_dedup_components",
    "qd12_keep_best_per_cluster",
    "qd13_duplicated_spans",
    "qst2_streaming_sessionize",
]

FACTOR100 = scale_r11.FACTOR100


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit(
            "scale_r12 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM"
        )
    which = sys.argv[1] if len(sys.argv) > 1 else "factor1000"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r12",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        scale_r11.run_one(spark, registry["q08_pricing_summary"].fn, scale_r9.BASE)
    except QueryTimeout:
        pass
    if which == "factor1000":
        done = scale_r11._load().get("factor1000", {}).get("queries", {})
        todo = names or [n for n in FACTOR1000 if n not in done]
        scale_r11.ladder(
            spark, registry, todo, SCALED_1000, "factor1000", 1000
        )
    if which == "factor100":
        done = scale_r11._load().get("factor100", {}).get("queries", {})
        todo = [n for n in (names or FACTOR100) if n not in done]
        scale_r11.ladder(spark, registry, todo, SCALED_100, "factor100", 100)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
