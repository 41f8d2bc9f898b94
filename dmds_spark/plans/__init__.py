from dmds_spark.plans.inspect import (
    broadcast_join_count,
    codegen_span_count,
    forced_broadcast_base_scans,
    partition_filters,
    physical_plan,
    plan_report,
    pushed_filters,
    read_schemas,
    scan_count,
    shuffle_count,
    unpartitioned_window_count,
)

__all__ = [
    "forced_broadcast_base_scans",
    "unpartitioned_window_count",
    "physical_plan",
    "plan_report",
    "pushed_filters",
    "partition_filters",
    "read_schemas",
    "broadcast_join_count",
    "shuffle_count",
    "codegen_span_count",
    "scan_count",
]
