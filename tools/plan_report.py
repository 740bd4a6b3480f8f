"""Generate PLANS.md: physical-plan summary of every registered query.

For each query: shuffle-exchange count, join strategies, pushed
filters, and codegen span count — the scale-relevant plan shape at a
glance. Run after adding operators; diff in review to catch plan
regressions (a new Exchange or a lost broadcast shows up here).

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.plans.inspect import (  # noqa: E402
    codegen_spans,
    exchange_count,
    join_strategies,
    pushed_filters,
)
from spotify_pipeline_gcp_spark.queries import load_all  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry = load_all()
    spark = get_spark("plan_report")

    lines = [
        "# PLANS — physical-plan shape per query (auto-generated)",
        "",
        f"`python tools/plan_report.py {sf_dir}` — regenerate after",
        "adding operators; diff to catch plan regressions.",
        "",
        "| query | exchanges | joins | pushed filters | codegen spans |",
        "|---|---|---|---|---|",
    ]
    for name, spec in sorted(registry.items()):
        try:
            if name.startswith("qst"):
                # streaming: the registered callable returns the
                # DRAINED sink, so explain the captured micro-batch
                # plan instead (streaming/lastplan.py records it at
                # stream completion — the executed plan, including
                # stateful operators and stream-static joins)
                from spotify_pipeline_gcp_spark.streaming import lastplan

                spec.fn(spark, sf_dir).collect()
                plan = lastplan.get()
                if not plan:
                    lines.append(f"| {name} | — | — | no batch ran | — |")
                    continue
                m = lastplan.text_metrics(plan)
                joins = ", ".join(m["joins"] + m["stateful"]) or "—"
                lines.append(
                    f"| {name} | {m['exchanges']} | {joins} | micro-batch | "
                    f"{m['codegen_spans']} |"
                )
                continue
            df = spec.fn(spark, sf_dir)
            # structural metrics from the pre-execution plan (the final
            # AQE plan nests per-stage subplans and double-counts
            # exchanges); codegen ids exist only post-execution
            exchanges = exchange_count(df)
            joins = ", ".join(sorted(set(join_strategies(df)))) or "—"
            pf = len(pushed_filters(df))
            df.collect()
            lines.append(
                f"| {name} | {exchanges} | {joins} | {pf} | "
                f"{codegen_spans(df)} |"
            )
        except Exception as ex:  # noqa: BLE001
            lines.append(f"| {name} | ERROR | {str(ex)[:60]} | | |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(registry)} queries)")


if __name__ == "__main__":
    main()
