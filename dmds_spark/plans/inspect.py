"""Physical-plan inspection helpers.

The engine's performance contract is enforceable only if plans are
observable: these helpers extract the facts that matter at 100 TB —
did the filter reach the scan, did the projection prune columns, did
the small side broadcast, how many exchanges (shuffles) does the plan
pay, how wide are the whole-stage-codegen spans. tests/test_plans.py
pins these properties for the headline queries so a regression that
silently de-optimizes a plan fails CI, not the cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates pushed into the parquet scan (row-group pruning)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        if m.group(1):
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Predicates applied to partition directories (pruning before IO)."""
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df)):
        if m.group(1):
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — column pruning made visible."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", physical_plan(df))


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin") + physical_plan(df).count(
        "BroadcastNestedLoopJoin"
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators — each is a full shuffle of its
    input; the scale-limiting resource."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", physical_plan(df)))


def codegen_span_count(df: DataFrame) -> int:
    """Whole-stage-codegen regions (wider = more of the plan runs as
    generated JVM loops rather than interpreted operators). Spark's
    simple plan string marks a span operator with a ``*(N)`` prefix
    (the formatted/UI string spells it ``WholeStageCodegen (N)``);
    count distinct span ids across both notations. NOTE: with AQE on,
    the pre-execution plan is an AdaptiveSparkPlan with NO codegen
    materialized yet — this counter is only meaningful with
    ``spark.sql.adaptive.enabled=false`` (scripts/plan_audit.py) or on
    an executed plan."""
    plan = physical_plan(df)
    spans = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    spans |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(spans)


def scan_count(df: DataFrame) -> int:
    return physical_plan(df).count("FileScan parquet")


def _windowspec_args(spec: str) -> list[str]:
    """Split the top-level args of one ``windowspecdefinition(...)``."""
    args, depth, cur = [], 0, []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


_SORT_DIR = re.compile(r"\b(?:ASC|DESC) NULLS (?:FIRST|LAST)\s*$")


def unpartitioned_window_count(df: DataFrame) -> int:
    """Window execs with an EMPTY partition spec — each one sorts its
    entire input in ONE task, the single worst scale hazard a plan can
    carry (a corpus-sized input means one executor sorts 100 TB).

    Detection: the plan prints each window function's spec as
    ``windowspecdefinition(partCols..., orderCols..., frame)`` where
    partition columns have NO sort direction and order columns end in
    ``ASC|DESC NULLS FIRST|LAST`` (a bracket-group count on the Window
    line is ambiguous: a partitioned-but-unordered window also prints
    two groups). A spec is unpartitioned iff every pre-frame arg
    carries a sort direction (or there are no pre-frame args at all).
    Bounded-grain windows (post-limit top-k, day grids, ppm score
    grids, strata tables) still count here — the registry sweep in
    tests/test_plans.py allowlists those BY NAME with the bound stated,
    so any new corpus-sized window fails the sweep."""
    n = 0
    for line in physical_plan(df).splitlines():
        stripped = line.lstrip("+-*: (0123456789)")
        if not stripped.startswith("Window "):
            continue
        line_hit = False
        for m in re.finditer(r"windowspecdefinition\(", stripped):
            start = m.end()
            depth = 1
            i = start
            while i < len(stripped) and depth:
                if stripped[i] == "(":
                    depth += 1
                elif stripped[i] == ")":
                    depth -= 1
                i += 1
            args = _windowspec_args(stripped[start : i - 1])
            pre_frame = [
                a for a in args if not a.startswith("specifiedwindowframe(")
            ]
            if all(_SORT_DIR.search(a) for a in pre_frame):
                line_hit = True
        if line_hit:
            n += 1
    return n


# Tables whose row count grows with the scale factor. Broadcasting a
# RAW scan of one of these is a forced OOM at 100 TB (billions of rows
# on the build side); only region/nation (constant 5/25 rows), literal
# grids, and reduced derivations (aggregates, top-k limits) may carry
# an unconditional broadcast hint. SF-proportional dims go through
# core.engine.maybe_broadcast, which attaches the hint only under the
# size gate.
SF_PROPORTIONAL_TABLES: tuple[str, ...] = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)

# Logical nodes that bound the cardinality of everything above them:
# an Aggregate emits one row per group; limits emit <= k rows. A hint
# sitting above one of these is a derived-small-side broadcast, not a
# base-table broadcast.
_CARDINALITY_REDUCERS = frozenset({
    "Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate",
})


def _jchildren(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _unreduced_sf_scans(node) -> set[str]:
    """SF-proportional tables reachable from ``node`` WITHOUT crossing
    a cardinality reducer — i.e. the subtree's output row count still
    scales with the table."""
    if node.nodeName() in _CARDINALITY_REDUCERS:
        return set()
    try:
        paths = node.relation().location().rootPaths().toString()
    except Exception:
        paths = ""
    hits = {t for t in SF_PROPORTIONAL_TABLES if f"{t}.parquet" in paths}
    for ch in _jchildren(node):
        hits |= _unreduced_sf_scans(ch)
    return hits


def forced_broadcast_base_scans(df: DataFrame) -> list[str]:
    """Every broadcast JOIN HINT in the optimized logical plan whose
    hinted side reaches an SF-proportional parquet scan without a
    cardinality reducer in between — the signature of a hard
    ``F.broadcast(<base table>)``. Returns the offending table names
    (one entry per hinted side, comma-joined if several tables).

    Run this with the maybe_broadcast size gate disabled
    (``SPARK_GRAFT_BROADCAST_MAX_BYTES=-1``) so gated hints vanish and
    only unconditional hints remain — at test SF the gate would
    otherwise broadcast every small table and drown the signal."""
    offenders: list[str] = []

    def hinted_broadcast(opt_hint_info) -> bool:
        # typed JVM accessors (JoinHint.leftHint/rightHint:
        # Option[HintInfo]; HintInfo.strategy: Option[JoinStrategyHint])
        # instead of parsing hint().toString(): a toString format change
        # across Spark versions would make the string path silently
        # return no offenders — the lint would go dark, not loud
        if not opt_hint_info.isDefined():
            return False
        strategy = opt_hint_info.get().strategy()
        return strategy.isDefined() and (
            "broadcast" in strategy.get().toString().lower()
        )

    def walk(node) -> None:
        if node.nodeName() == "Join":
            hint = node.hint()
            kids = _jchildren(node)
            for side, opt in ((0, hint.leftHint()), (1, hint.rightHint())):
                if hinted_broadcast(opt):
                    raw = _unreduced_sf_scans(kids[side])
                    if raw:
                        offenders.append(",".join(sorted(raw)))
        for ch in _jchildren(node):
            walk(ch)

    walk(df._jdf.queryExecution().optimizedPlan())
    return offenders


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by bench diagnostics."""
    return {
        "pushed_filters": pushed_filters(df),
        "partition_filters": partition_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_joins": broadcast_join_count(df),
        "shuffles": shuffle_count(df),
        "codegen_spans": codegen_span_count(df),
        "scans": scan_count(df),
    }
