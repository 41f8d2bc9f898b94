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
    """Static check: bench.main ends with exactly one json.dumps print
    (the driver parses stdout as one JSON line)."""
    tree = ast.parse(open("/root/repo/bench.py").read())
    dumps = [n for n in ast.walk(tree)
             if isinstance(n, ast.Attribute) and n.attr == "dumps"]
    assert len(dumps) == 1


def test_totals_emitted_after_queries_dict():
    """The driver records only the last ~2000 chars of stdout; with
    85+ benched queries the per-query dict alone exceeds that, so the
    JSON must emit "queries" FIRST and metric/value/value_full/sf
    LAST — r5 lost its headline totals to tail truncation (verdict
    Missing #2). Static key-order check on the json.dumps literal."""
    import ast

    tree = ast.parse(open("/root/repo/bench.py").read())
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "dumps"
        ):
            keys = [k.value for k in node.args[0].keys]
            assert keys.index("queries") < keys.index("value")
            assert keys.index("queries") < keys.index("value_full")
            for tail_key in ("value", "value_full", "sf"):
                assert tail_key in keys[-4:], keys
            return
    raise AssertionError("no json.dumps dict literal found in bench.py")
