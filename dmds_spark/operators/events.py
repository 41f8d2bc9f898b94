"""Event-sequence operators: the N-step strict sequential funnel as
one fold-driven builder.

The reference has no event analytics (it is a chunk store —
/root/reference/src/lib.rs:26-49); this surface comes from the
product-analytics queries every events table serves. The funnel shape
here is the scale-correct one: per-step state is one row per surviving
user (never the raw stream), each step is a pre-filtered aggregate
joined to the previous step's state, and every shuffle is on the user
key so AQE reuses the partitioning down the funnel. A window-over-
the-stream funnel (collect each user's ordered events, walk them)
shuffles every event once per 100 TB run; this shape moves each event
once per step it can satisfy, and step inputs shrink monotonically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dmds_spark.core.engine import materialize as _materialize


def sequential_funnel(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    materialize: bool = True,
) -> DataFrame:
    """Strict sequential funnel over ``steps`` (each a literal
    ``type_col`` value or a boolean Column predicate): a user counts at
    step N only with a matching event STRICTLY after their step-N-1
    time (their earliest valid step-N-1 event). Returns one row per
    step: (step INT, users BIGINT).

    Fold shape: step N's state = events ⋈ state_{N-1} on the user key,
    filtered to the step predicate and ``ts > prev_ts``, min-aggregated
    back to one row per user. The fold makes 3-step and 12-step funnels
    the same plan family — no hand-chained copies to drift.

    ``materialize`` snapshots each step's per-user state: step N-1's
    subtree feeds BOTH its own count row and step N's join, and without
    a barrier Catalyst computes it once per consumer — the step-1
    aggregate (a full events scan) would run N+... times in an N-step
    funnel (measured 6 events scans for 3 steps). Per-step state is one
    row per surviving user, so the snapshot is small by construction;
    in production it is the written per-step audit table."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        pred = step if isinstance(step, Column) else (F.col(type_col) == step)
        if prev is None:
            s = events.filter(pred)
        else:
            s = events.join(prev, user_col).filter(
                pred & (F.col(ts_col) > F.col("__t"))
            )
        prev = s.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        if materialize:
            prev = prev.transform(_materialize)
        counts.append(
            prev.agg(
                F.lit(i).alias("step"),
                F.count(F.lit(1)).cast("bigint").alias("users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def funnel_step_times(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user completion detail for the same strict funnel: one row
    per user who completed ALL steps, with ``t1..tN`` = the time each
    step was satisfied. Same fold as ``sequential_funnel`` but keeping
    the per-step times (a conversion-latency analysis input)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    prev: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        pred = step if isinstance(step, Column) else (F.col(type_col) == step)
        if prev is None:
            prev = (
                events.filter(pred)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t1"))
            )
        else:
            prev = (
                events.join(prev, user_col)
                .filter(pred & (F.col(ts_col) > F.col(f"t{i - 1}")))
                .groupBy(user_col, *[f"t{j}" for j in range(1, i)])
                .agg(F.min(ts_col).alias(f"t{i}"))
            )
    return prev
