"""Round-12 queries, batch four: zone-map data skipping through the
World store — min/max zones on a NON-dimension column prune chunk
directories before any file opens (core/zonemap.py; the reference's
hint negative-cache, src/world.rs hints, generalized from existence to
value bounds).

The demo exploits real layout locality: event_id is assigned in arrival
order, so a world keyed by event_id chunks has near-monotone ts per
chunk — a 3-day predicate out of the 30-day span skips ~90% of
partitions (pinned in tests/test_zonemap.py). The oracle is the plain
declarative range scan, so the hash-match certifies that skipping never
drops rows.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from dmds_spark.queries import register

_LO = "2024-01-10 00:00:00"
_HI = "2024-01-13 00:00:00"


def _us(s: str) -> int:
    return int(
        datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp()
        * 1_000_000
    )


@register(
    "dmds_zonemap_read",
    f"""
    SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
    FROM events
    WHERE ts >= TIMESTAMP '{_LO}' AND ts <= TIMESTAMP '{_HI}'
    """,
)
def dmds_zonemap_read(spark, sf_dir):
    """Ingest events into an event_id-chunked World, refresh ts zones,
    and answer a 3-day range query via ``read_where`` — the zone-pruned
    path (partition skip -> parquet pushdown -> exact predicate). The
    refresh is the dirty-only maintenance call a real deployment runs
    after each flush; pruning correctness never depends on it (stale
    partitions are conservatively scanned — see core/zonemap.py)."""
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.core.scratch import scratch_dir
    from dmds_spark.sources.registry import load_events
    from dmds_spark.world import World

    # 2048-wide chunks: ~49 partition dirs at sf0.1 (391 at 256-wide
    # cost 7.8 s mostly in small-file write overhead); the 3-day window
    # still prunes the non-overlapping id chunks
    spec = WorldSpec(dims=(DimSpec("event_id", 0, 2**20 - 1, 2048),))
    root = scratch_dir("zonemap_world", sf_dir)
    world = World(spark, spec, root)
    world.upsert(
        load_events(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value", "ts"
        )
    )
    world.flush()
    world.zonemap_refresh(["ts"])
    out = world.read_where({"ts": (_us(_LO), _us(_HI))})
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )


@register(
    "rollup_incremental_cdc",
    """
    WITH ev AS (
      SELECT user_id, event_type, value, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    last AS (
      SELECT user_id, event_type, value, ts, op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT user_id, event_type AS last_type, value AS last_value,
           epoch_us(ts) AS last_ts_us
    FROM last WHERE rn = 1 AND op = 'U'
    """,
)
def rollup_incremental_cdc(spark, sf_dir):
    """The streaming-CDC ingest loop proven against declarative truth:
    the month of change records arrives as three chronological
    micro-batches through ``apply_cdc_batch`` (the foreachBatch arm's
    body — seq-aware merge with TOMBSTONED deletes, per-batch flush),
    then the MIDDLE batch is redelivered (at-least-once replay after
    later batches have applied: every replayed record is a seq tie or
    older than stored — tombstones keep the seq memory of deleted keys,
    so even a replayed upsert for a later-deleted key cannot resurrect
    it), and finally tombstones behind the redelivery horizon are
    physically purged. Hash-equality of the serving view against
    latest-wins over ALL events certifies the multi-batch merge, replay
    immunity, and purge safety in one query.

    Per batch the stored-seq lookup broadcast-prunes the snapshot scan
    to the touched keys, so each trigger costs O(batch), never
    O(table) — the shape that holds when the world is 100 TB and a
    micro-batch is thousands of rows."""
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.core.scratch import scratch_dir
    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.cdc_apply import (
        apply_cdc_batch,
        current_state,
        purge_tombstones,
    )
    from dmds_spark.world import World

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts", "event_id"
    ).withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    cuts = ["2024-01-11 00:00:00", "2024-01-21 00:00:00"]
    b1 = ev.filter(F.col("ts") < cuts[0])
    b2 = ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]))
    b3 = ev.filter(F.col("ts") >= cuts[1])

    spec = WorldSpec(dims=(DimSpec("user_id", 0, 2**20 - 1, 64),))
    world = World(spark, spec, scratch_dir("cdc_stream_world", sf_dir))
    kw = dict(
        keys=["user_id"], seq=["ts", "event_id"],
        payload=["event_type", "value"],
    )
    for batch in (b1, b2, b3, b2):  # b2 twice: at-least-once redelivery
        apply_cdc_batch(world, batch, **kw)
    # reclaim tombstones behind the redelivery horizon (here: the b1/b2
    # window, already redelivered) — must not change the serving view
    purge_tombstones(world, F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
    return current_state(world).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
    )
