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
