"""Round-15 scale ladder: re-measure the rung rows whose code moved
this round (trainer AQE-scoping revert, data-derived BLAS block
sizing, the qt10 window-derived prefix counts), plus the heavy
serving/build rows the revert's trainer cost flows into.

Methodology is scale_r11's verbatim (one fresh 4 g JVM per factor1000
row, strictly serialized, 600 s watchdog, noop-drain + Observation row
counts, fresh store dirs for WARM_BUILD queries, min-of-2 for every
scaled row except >450 s one-shots) — this module reuses its ``ladder``
with the output redirected to SCALE_BENCH_r15.json.

Usage:
    python tools/scale_r15.py [factor1000] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_r9  # noqa: E402
import scale_r11  # noqa: E402
from scale_r9 import DRIVER_MEM, SCALED_1000, QueryTimeout  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r15.json",
)
scale_r11.OUT = OUT

FACTOR1000 = [
    # qt10: prefix counts via window (one corpus pass removed)
    "qt10_ngram_lm_score",
    # trainer-AQE revert + block-sizing flows (sized BLAS family)
    "qs23_cosine_topk_ivf_blas_sized",
    "qs26_cosine_topk_imi_blas",
    "qs28_cosine_topk_imi_multiprobe_blas",
    "qs30_cosine_topk_bucketed_blas_sized",
    "qd7c_embedding_near_dup_blas",
    # build/serve rows that pay the (now AQE-on) trainers in a fresh JVM
    "qst7_streaming_index_maintenance",
    "qs18_pq_adc_topk",
    "qs19b_cosine_topk_ivfpq_store",
    "qs25_cosine_topk_imi_adc",
]


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit(
            "scale_r15 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM"
        )
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r15",
        driver_memory=DRIVER_MEM,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        scale_r11.run_one(spark, registry["q08_pricing_summary"].fn, scale_r9.BASE)
    except QueryTimeout:
        pass
    done = scale_r11._load().get("factor1000", {}).get("queries", {})
    todo = names or [n for n in FACTOR1000 if n not in done]
    scale_r11.ladder(spark, registry, todo, SCALED_1000, "factor1000", 1000)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
