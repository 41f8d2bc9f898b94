#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (default r16 —
optimization-round evidence, guide §1.1).

Usage: python scripts/capture_plans.py <tag> <query> [query ...]
       python scripts/capture_plans.py <tag> --top N   # N slowest from BENCH_DETAIL.json
Plans are built (not executed) at sf0.001 by default — plan shape is
scale-independent; override with SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from dmds_spark.queries import all_queries  # noqa: E402
from dmds_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--top":
        n = int(names[1])
        detail = json.load(open("BENCH_DETAIL.json"))
        names = [k for k, _ in sorted(
            detail["queries"].items(), key=lambda kv: -kv[1])[:n]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # noqa: BLE001 — record the failure
            txt = f"EXPLAIN FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
