#!/usr/bin/env python
"""Evidence freshness report: join the query registry against every
CORRECTNESS_r*.json and print each query's most recent driver result —
making the rotation protocol (queries/__init__.py ordering) auditable
at a glance.

Usage: python scripts/evidence_report.py [--stale-first]
No Spark session needed (registry import only loads query builders).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmds_spark.queries import all_queries, all_oracle_sql  # noqa: E402


def load_rounds(repo_root: str) -> dict[int, dict]:
    rounds = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            rounds[int(m.group(1))] = json.load(fh)
    return rounds


def status_of(entry: dict) -> str:
    if entry.get("hash_match") is True:
        return "green"
    if entry.get("err") == "no_oracle":
        return "rows-only"
    if entry.get("err"):
        return f"error:{entry['err'][:40]}"
    return "mismatch"


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = load_rounds(repo_root)
    names = list(all_queries())
    has_oracle = set(all_oracle_sql())

    report = []
    for name in names:
        last_round, last_status = None, None
        for rnd in sorted(rounds):
            if name in rounds[rnd]:
                last_round, last_status = rnd, status_of(rounds[rnd][name])
        report.append(
            {
                "query": name,
                "oracle": name in has_oracle,
                "last_round": last_round,
                "status": last_status or "never-checked",
            }
        )

    if "--stale-first" in sys.argv:
        report.sort(key=lambda r: (r["last_round"] is not None,
                                   r["last_round"] or 0, r["query"]))

    w = max(len(r["query"]) for r in report)
    for r in report:
        rnd = f"r{r['last_round']:02d}" if r["last_round"] else "---"
        kind = "oracle" if r["oracle"] else "rows  "
        print(f"{r['query']:{w}s}  {kind}  {rnd}  {r['status']}")

    n_green = sum(r["status"] == "green" for r in report)
    n_rows = sum(r["status"] == "rows-only" for r in report)
    n_never = sum(r["status"] == "never-checked" for r in report)
    n_bad = len(report) - n_green - n_rows - n_never
    print(
        f"\n{len(report)} queries: {n_green} hash-green, {n_rows} rows-only,"
        f" {n_never} never-checked, {n_bad} error/mismatch"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
