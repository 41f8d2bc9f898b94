#!/usr/bin/env python
"""Step-level wall-clock profiler for the expensive store/lifecycle
queries (optimization round instrumentation, guide §1).

Monkeypatches the py4j call boundary to count JVM round trips, and —
more usefully — wraps every Spark ACTION entry point (DataFrameWriter
.parquet/.save, DataFrame.collect/count/toPandas) with a timer so one
query run prints an ordered step trace: what ran, in what order, how
long each action took. Read-only instrumentation: results unchanged.

Usage: python scripts/profile_steps.py <query_name> [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

STEPS: list[tuple[str, float, str]] = []


def _whence() -> str:
    # innermost repo frame that is not this file
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "dmds_spark" in fn or "queries" in fn:
            if "profile_steps" not in fn:
                return f"{os.path.basename(fn)}:{fr.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            dt = time.perf_counter() - t0
            STEPS.append((f"{cls.__name__}.{name}", dt, _whence()))

    setattr(cls, name, timed)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # Spark < 4
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("parquet", "save", "json", "csv"):
        _wrap(DataFrameWriter, m)
    for m in ("collect", "count", "toPandas", "localCheckpoint"):
        _wrap(DataFrame, m)

    from dmds_spark.queries import all_queries
    from dmds_spark.session import get_spark, release_materialized_state

    spark = get_spark(app_name="profile_steps")
    qs = all_queries()
    fn = qs[name]

    from pyspark.sql import functions as F

    def consume(df):
        try:
            red = df.agg(F.expr(
                "bit_xor(xxhash64(struct("
                + ", ".join(f"`{c}`" for c in df.columns) + ")))"))
        except Exception:
            df.count()
            return
        red.collect()

    for run in range(n_runs):
        STEPS.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        consume(df)
        t_consume = time.perf_counter() - t1
        release_materialized_state(spark)
        total = time.perf_counter() - t0
        print(f"\n=== run {run}: total {total:.2f}s "
              f"(build {t_build:.2f}s + consume {t_consume:.2f}s)")
        acc = 0.0
        for step, dt, site in STEPS:
            acc += dt
            print(f"  {dt:7.3f}s  {step:28s} {site}")
        print(f"  steps sum {acc:.2f}s / total {total:.2f}s "
              f"(untimed {total-acc:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
