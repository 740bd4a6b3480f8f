"""Round-13 scale ladder: extend the rung to uncovered family heads.

Methodology is scale_r11's verbatim (one fresh 4 g JVM per factor1000
row, strictly serialized, 600 s watchdog, noop-drain + Observation row
counts, fresh store dirs for WARM_BUILD queries, min-of-2 for every
scaled row except >450 s one-shots) — this module reuses its ``ladder``
with the output redirected to SCALE_BENCH_r13.json.

The r13 1000x work-list (r12 verdict item #4 — the family heads users
would actually run at scale that have factor100 rows but no factor1000
row: the multimodal and sampling families had ZERO factor1000 coverage):

- qm3 payload features (multimodal decode plumbing over binary blobs)
- qsp4 domain mixture (temperature-weighted per-source sampling)
- qe2 knn label vote (embedding-space classification)
- qt10 ngram LM score (per-doc LM perplexity proxy)
- qst4 streaming stateful totals (applyInPandasWithState path)

plus re-measures of any closure-family row whose code changed this
round (pass names explicitly: qd8/qd12/qd14).

One tool fix vs scale_r12 (ADVICE r12): the factor100 branch now
honors explicit names the same way factor1000 does — ``names`` always
re-measures; only the no-args resume path skips already-recorded rows.

Fills SCALE_BENCH_r13.json incrementally (resumes by default; explicit
names re-measure). Usage:
    python tools/scale_r13.py [factor1000|factor100] [name ...]
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
    "SCALE_BENCH_r13.json",
)
# scale_r11's ladder/_load/_save read the module-global OUT at call
# time; repointing it is the whole "new round" — the methodology is
# deliberately identical so rows stay comparable across rounds.
scale_r11.OUT = OUT

FACTOR1000 = [
    # rung extension to uncovered family heads (r12 verdict item #4)
    "qm3_payload_features",
    "qsp4_domain_mixture",
    "qe2_knn_label_vote",
    "qt10_ngram_lm_score",
    "qst4_streaming_stateful_totals",
]

FACTOR100 = scale_r11.FACTOR100


def main() -> int:
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", DRIVER_MEM) != DRIVER_MEM:
        raise SystemExit(
            "scale_r13 pins the 4g memory contract; unset "
            "SPARK_GRAFT_DRIVER_MEM"
        )
    which = sys.argv[1] if len(sys.argv) > 1 else "factor1000"
    names = sys.argv[2:] or None
    from spotify_pipeline_gcp_spark.queries import load_all

    registry = load_all()
    spark = get_spark(
        "scale_r13",
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
        # explicit names re-measure (mirrors factor1000 — the r12
        # branch filtered named queries out if already recorded,
        # contradicting the docstring)
        done = scale_r11._load().get("factor100", {}).get("queries", {})
        todo = names or [n for n in FACTOR100 if n not in done]
        scale_r11.ladder(spark, registry, todo, SCALED_100, "factor100", 100)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
