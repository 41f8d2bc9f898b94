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

    spec = WorldSpec(dims=(DimSpec("event_id", 0, 2**20 - 1, 256),))
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
