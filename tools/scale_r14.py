"""Round-14 scale ladder: quantized-dgemm pair kernel + capped-path
re-measures.

Methodology is scale_r11's verbatim (one fresh 4 g JVM per factor1000
row, strictly serialized, 600 s watchdog, noop-drain + Observation row
counts, fresh store dirs for WARM_BUILD queries, min-of-2 for every
scaled row except >450 s one-shots) — this module reuses its ``ladder``
with the output redirected to SCALE_BENCH_r14.json.

The r14 1000x work-list (r13 verdict items #2/#5 + ADVICE medium):

- qd7c embedding near-dup blas (NEW — the quantized-exact per-bucket
  dgemm pair kernel; r13 measured 177 s of qd7b's 199 s as interpreted
  HOF-fold dots, this row is the payoff)
- qd10 semantic dedup components (edge kernel switched to the dgemm —
  331.6 s r13 row is the baseline to beat)
- qd3b / qd8 / qd12 (capped-Jaccard path changed: the count-window
  cap now runs BEFORE collect_list, so over-cap groups never build
  arrays — same plan depth, re-measure to confirm no regression)
- qt10 ngram LM score (bigram dictionary-encoding shave — r13 row
  123.3 s with 32.3 s GC; target GC < 15% of wall)

Fills SCALE_BENCH_r14.json incrementally (resumes by default; explicit
names re-measure). Usage:
    python tools/scale_r14.py [factor1000|factor100] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_r9  # noqa: E402
import scale_r11  # noqa: E402
from scale_r9 import DRIVER_MEM, SCALED_100, SCALED_1000, QueryTimeout  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_BENCH_r14.json",
)
# scale_r11's ladder/_load/_save read the module-global OUT at call
# time; repointing it is the whole "new round" — the methodology is
# deliberately identical so rows stay comparable across rounds.
scale_r11.OUT = OUT

FACTOR1000 = [
    "qd7c_embedding_near_dup_blas",
    "qd10_semantic_dedup_components",
    "qd3b_ngram_jaccard_capped",
    "qd8_dedup_components",
    "qd12_keep_best_per_cluster",
    "qt10_ngram_lm_score",
]

FACTOR100 = scale_r11.FACTOR100


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit(
            "scale_r14 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM"
        )
    which = sys.argv[1] if len(sys.argv) > 1 else "factor1000"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r14",
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
        todo = names or [n for n in FACTOR100 if n not in done]
        scale_r11.ladder(spark, registry, todo, SCALED_100, "factor100", 100)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
