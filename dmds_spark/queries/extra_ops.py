"""Coverage completions for SURVEY.md §2b rows not yet oracle-visible:
window first/last values, exact interpolated percentiles, and a
driver-checkable CRUD round-trip through the World store (upsert +
relocation + delete -> snapshot == the equivalent SQL over the source
table). The CRUD query is the reference's write path (src/world.rs:
553-584, src/world/iter.rs:193-265) exercised end-to-end as a query.
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.relational import T


@register(
    "window_first_last",
    """
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value) OVER w AS last_val,
           NTH_VALUE(value, 2) OVER w AS second_val
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark, sf_dir):
    """first/last/nth value over an unbounded frame (§2b window row).
    Picks, not sums, so doubles are hash-safe given the (ts, event_id)
    total order. One shuffle on user_id; the user_id<50 filter pushes
    into the scan."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "agg_percentiles",
    """
    SELECT p_type,
           PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY p_size) AS median_size,
           PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY p_size) AS q1_size,
           PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY p_size) AS q3_size,
           MIN(p_size) AS min_size, MAX(p_size) AS max_size
    FROM part GROUP BY p_type
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (§2b aggregation row).
    Computed over the INTEGER p_size column so the linear interpolation
    (a + (b-a)*frac with frac in {0,.25,.5,.75}) is exact in doubles on
    both engines. Spark's percentile() is a sort-based exact aggregate —
    fine for bounded groups; the streaming-scale variant is
    approx_percentile (agg_approx_distinct covers the sketch family)."""
    part = T(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.expr("percentile(p_size, 0.5)").alias("median_size"),
        F.expr("percentile(p_size, 0.25)").alias("q1_size"),
        F.expr("percentile(p_size, 0.75)").alias("q3_size"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


@register(
    "dmds_crud_snapshot",
    """
    SELECT event_id, (user_id + 100) % 2048 AS user_id FROM events
    WHERE event_id < 100
    UNION ALL
    SELECT event_id, user_id FROM events
    WHERE event_id >= 200 AND event_id < 5000
    """,
)
def dmds_crud_snapshot(spark, sf_dir):
    """The reference's full write path as one oracle-checked query:
    seed a World from events[id<5000] (World::insert, src/world.rs:
    553-567), upsert a relocation batch that moves ids<100 to a new
    user_id chunk (Lazy::get_mut + close, src/world/iter.rs:193-252),
    delete ids 100..199 (Lazy::destroy, src/world/iter.rs:254-265),
    flush, and read back the snapshot. The oracle states the same
    end-state declaratively. Chunk-partitioned parquet + dynamic
    partition overwrite means the relocation rewrites only the source
    and target chunks, never the whole table."""
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.sources.registry import load_events
    from dmds_spark.world import World

    spec = WorldSpec(
        dims=(
            DimSpec("event_id", 0, 2**20 - 1, 4096),
            DimSpec("user_id", 0, 2047, 64),
        )
    )
    from dmds_spark.core.scratch import scratch_dir

    # per-invocation world dir (stale siblings swept): concurrent
    # evaluations (bench loop overlapping the correctness driver) must
    # not rmtree each other's live chunk tree mid-read
    root = scratch_dir("crud_world", sf_dir)
    world = World(spark, spec, root)

    ev = load_events(spark, sf_dir).select("event_id", "user_id")
    world.upsert(ev.filter(F.col("event_id") < 5000))
    world.flush()
    moved = (
        ev.filter(F.col("event_id") < 100)
        .withColumn("user_id", (F.col("user_id") + 100) % 2048)
    )
    world.upsert(moved)
    world.delete_ids(range(100, 200))
    world.flush()
    return world.snapshot().select("event_id", "user_id")
