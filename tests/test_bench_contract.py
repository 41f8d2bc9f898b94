"""The bench harness's query sets must resolve against the registry:
a renamed query silently filtered out of the comparable set would
shrink the round-over-round "value" and masquerade as a speedup."""

import ast
import sys


def _bench_module():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_all_bench_names_registered():
    from dmds_spark.queries import all_queries

    bench = _bench_module()
    qs = all_queries()
    missing = [n for n in bench.BASELINE_ORDER + bench.ADDITIONS
               if n not in qs]
    assert missing == []


def test_comparable_set_matches_baseline_record():
    """BASELINE_ORDER must stay membership-identical to the 21-query
    set recorded in BENCH_r01 (the comparability contract)."""
    import json

    bench = _bench_module()
    r1 = json.load(open("/root/repo/BENCH_r01.json"))
    recorded = set(r1["parsed"]["queries"])
    assert set(bench.BASELINE_ORDER) == recorded


def test_bench_prints_one_json_line():
    """Static check: bench.main prints exactly one JSON line (the
    driver parses stdout as one JSON line). Multiple json.dumps calls
    are fine — the oversize-degrade path re-serializes a shrunken
    line — but only ONE print(out) may exist."""
    tree = ast.parse(open("/root/repo/bench.py").read())
    prints = [
        n for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name) and n.func.id == "print"
        and len(n.args) == 1
        and isinstance(n.args[0], ast.Name) and n.args[0].id == "out"
    ]
    assert len(prints) == 1


def test_final_line_fits_driver_tail():
    """The driver records only the last ~2000 chars of stdout and
    json-parses them; a final line carrying every per-query timing is
    ~4 KB, so BENCH_r05..r09 all recorded "parsed": null. The contract
    now: the printed line holds ONLY the comparable-21 timings (full
    detail goes to BENCH_DETAIL.json) and must stay under 1900 chars
    at worst-case value widths. Reconstruct the line exactly as
    bench.main builds it, with maximal-width timings."""
    import json

    bench = _bench_module()
    worst = 9999.9999  # 9 chars — wider than any plausible timing
    line = {
        "queries": {k: worst for k in bench.BASELINE_ORDER},
        "missing": [],
        "metric": "headline_queries_total",
        "unit": "sec",
        "value": worst * len(bench.BASELINE_ORDER),
        "value_full": worst * len(bench.BASELINE_ORDER + bench.ADDITIONS),
        "n_queries": len(bench.BASELINE_ORDER + bench.ADDITIONS),
        "sf": "0.1",
        "detail": "BENCH_DETAIL.json",
    }
    out = json.dumps(line)
    assert len(out) < 1900, len(out)
    parsed = json.loads(out)
    assert set(parsed["queries"]) == set(bench.BASELINE_ORDER)
