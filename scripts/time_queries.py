#!/usr/bin/env python
"""Time individual registered queries with the bench's exact
methodology (warmup pass + min over N measured passes; comparable-21
names consume via count(), additions via the bit_xor(xxhash64) full
materialization) without paying for a full bench run — the
optimization round's inner loop (guide §1: measure, change, re-measure).

Usage: python scripts/time_queries.py <query> [query ...] [--runs N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from bench import BASELINE_ORDER  # noqa: E402
from dmds_spark.queries import all_queries  # noqa: E402
from dmds_spark.session import get_spark, release_materialized_state  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_queries")
    qs = all_queries()

    from pyspark.sql import functions as F

    def consume(name, df):
        if name in BASELINE_ORDER:
            df.count()
            return
        try:
            reducer = df.agg(F.expr(
                "bit_xor(xxhash64(struct("
                + ", ".join(f"`{c}`" for c in df.columns) + ")))"))
        except Exception:  # noqa: BLE001
            df.count()
            return
        reducer.collect()

    best: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"warmup {name}")
        t0 = time.perf_counter()
        consume(name, qs[name](spark, sf_dir))
        release_materialized_state(spark)
        print(f"warmup  {name} {time.perf_counter()-t0:.2f}s", file=sys.stderr)
        for i in range(runs):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"measure {name} #{i}")
            t0 = time.perf_counter()
            consume(name, qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            release_materialized_state(spark)
            best[name] = min(best.get(name, dt), dt)
            print(f"pass{i}   {name} {dt:.2f}s", file=sys.stderr)
    for name, dt in best.items():
        print(f"{dt:8.3f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
