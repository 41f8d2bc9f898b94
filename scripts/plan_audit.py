#!/usr/bin/env python
"""Physical-plan audit over the benched queries: one row per query with
the plan-health counters the engine optimizes for — shuffles (the
scale-limiting resource), broadcast joins, parquet scans, whole-stage
codegen spans, and nested-loop/cartesian red flags.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
Default sf_dir: /root/testdata/sf0.001 (plan shape is scale-
independent; building plans needs no data reads beyond footers).

This is the automated version of the per-round "plan audit" — the
plan pins in tests/test_plans.py FAIL on regressions; this script
shows the current numbers at a glance.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from dmds_spark.plans import physical_plan, plan_report  # noqa: E402
from dmds_spark.queries import all_queries  # noqa: E402
from dmds_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    import bench

    names = only or (bench.BASELINE_ORDER + bench.ADDITIONS)
    spark = get_spark(app_name="plan_audit")
    # AQE wraps the pre-execution plan in AdaptiveSparkPlan
    # (isFinalPlan=false) with no WholeStageCodegen spans materialized;
    # audit the static plan instead so the codegen column is real.
    # Queries EXECUTE with AQE on (bench.py / the driver) — this
    # toggle only affects the plans built below.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = all_queries()

    hdr = f"{'query':36s} {'shfl':>4} {'bcast':>5} {'scan':>4} {'cg':>3}  flags"
    print(hdr)
    print("-" * len(hdr))
    worst = []
    for name in names:
        if name not in qs:
            print(f"{name:36s} MISSING")
            continue
        try:
            df = qs[name](spark, sf_dir)
            r = plan_report(df)
            plan = physical_plan(df)
        except Exception as e:  # audit must show everything it can
            print(f"{name:36s} ERROR {type(e).__name__}: {e}")
            continue
        flags = []
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("NESTED-LOOP")
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if r["shuffles"] >= 8:
            flags.append("MANY-SHUFFLES")
        print(
            f"{name:36s} {r['shuffles']:>4} {r['broadcast_joins']:>5} "
            f"{r['scans']:>4} {r['codegen_spans']:>3}  {' '.join(flags)}"
        )
        worst.append((r["shuffles"], name))
    worst.sort(reverse=True)
    print("\nmost shuffle-heavy:", ", ".join(f"{n}({s})" for s, n in worst[:5]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
