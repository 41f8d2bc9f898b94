#!/usr/bin/env python
"""Run the DuckDB-oracle comparison over every registered query.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
Default sf_dir: /root/testdata/sf0.01 (the driver's t2 scale).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from dmds_spark.oracle import run_all  # noqa: E402
from dmds_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(app_name="oracle_check")
    results = run_all(spark, sf_dir, only=only)
    n_ok = sum(r.ok for r in results)
    for r in results:
        flag = "OK  " if r.ok else "FAIL"
        print(f"{flag} {r.name:32s} rows={r.spark_rows}")
        if not r.ok:
            print(f"     {r.detail}")
    print(f"\n{n_ok}/{len(results)} queries match the oracle")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
