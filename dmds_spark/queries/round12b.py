"""Round-12 queries, batch two: change-data-capture application — the
ingestion front door of a warehouse-style pipeline. The event stream is
read as a Debezium/binlog-shaped changeset on key ``user_id``
(``event_type='error'`` is the tombstone op, everything else an
upsert; ``(ts, event_id)`` is the total commit order), split at
2024-01-21 into "already applied" (the base snapshot) and "incoming"
(the changeset), and three MERGE shapes run end to end:

1. ``cdc_apply_changeset`` — latest-wins MERGE into the base snapshot
   as ONE ``max_by`` hash aggregate (no window sort: the shuffle
   carries one candidate per key per map task, so it survives 100 TB
   where a `row_number` window would sort every change row).
2. ``cdc_net_changes`` — compact the changeset into the Delta-CDF-style
   NET per-key feed (I/U/D vs the base key set; insert+delete within
   the batch cancels) that downstream consumers replay instead of the
   raw op stream.
3. ``cdc_world_merge`` — apply the net feed to a persisted World TWICE
   (idempotent replay: the crash-retry a real ingest loop must
   survive) and read the snapshot back; hash-equality against the
   declarative end state certifies merge + replay + store round trip.

The oracles state each end state declaratively over the full event
table, so the hash-compare certifies the *algebra* (apply(base(early),
changes(late)) == latest_wins(all)) rather than replaying our
implementation.

Reference analogue: ordered upsert/remove application + dirty-only
flush (``World::insert`` src/world.rs:553-567, ``Lazy::destroy``
src/world/iter.rs:254-265, tokio-fs/src/lib.rs:207-235).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.operators.cdc import (
    OP_DELETE,
    OP_UPSERT,
    apply_changeset,
    latest_wins,
    merge_net_into_world,
    net_changes,
)
from dmds_spark.queries import register

_SPLIT = "2024-01-21 00:00:00"
_KEYS = ["user_id"]
_SEQ = ["ts", "event_id"]
_PAYLOAD = ["event_type", "value"]

# Shared oracle CTEs: the op-tagged changeset and the per-user last
# record over an arbitrary window (DuckDB).
_EV_SQL = f"""
    ev AS (
      SELECT user_id, event_type, value, ts, event_id,
             CASE WHEN event_type = 'error' THEN '{OP_DELETE}'
                  ELSE '{OP_UPSERT}' END AS op
      FROM events
    )
"""


def _changeset(spark, sf_dir):
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    return ev.withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit(OP_DELETE)).otherwise(
            F.lit(OP_UPSERT)
        ),
    )


def _base_and_late(spark, sf_dir):
    """Base snapshot = latest-wins state of the pre-split window
    (surviving upserts only, seq columns carried); late = the incoming
    changeset. The split predicate pushes into the parquet scan."""
    ev = _changeset(spark, sf_dir)
    split = F.lit(_SPLIT).cast("timestamp")
    early = ev.filter(F.col("ts") < split)
    late = ev.filter(F.col("ts") >= split)
    base = latest_wins(
        early, keys=_KEYS, seq=_SEQ, payload=_PAYLOAD
    ).filter(F.col("op") == OP_UPSERT)
    return base, late


@register(
    "cdc_apply_changeset",
    f"""
    WITH {_EV_SQL},
    last AS (
      SELECT user_id, event_type, value, ts, event_id, op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    ),
    nch AS (
      SELECT user_id, count(*) AS n FROM ev
      WHERE ts >= TIMESTAMP '{_SPLIT}' GROUP BY user_id
    )
    SELECT l.user_id, l.event_type AS last_type, l.value AS last_value,
           epoch_us(l.ts) AS last_ts_us,
           CAST(COALESCE(nch.n, 0) AS BIGINT) AS n_changes
    FROM last l LEFT JOIN nch ON l.user_id = nch.user_id
    WHERE l.rn = 1 AND l.op = '{OP_UPSERT}'
    """,
)
def cdc_apply_changeset(spark, sf_dir):
    """Latest-wins MERGE of the incoming changeset into the base
    snapshot; the oracle states latest-wins over ALL events, so the
    hash-match certifies apply(base, changes) == full recompute. One
    union + one hash aggregate (map-side partial ``max_by``), zero
    windows, zero joins on the Spark side — the scale shape."""
    base, late = _base_and_late(spark, sf_dir)
    merged = apply_changeset(
        base,
        late,
        keys=_KEYS,
        seq=_SEQ,
        payload=_PAYLOAD,
        count_col="n_changes",
    )
    return merged.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
        "n_changes",
    )


@register(
    "cdc_net_changes",
    f"""
    WITH {_EV_SQL},
    early AS (SELECT * FROM ev WHERE ts < TIMESTAMP '{_SPLIT}'),
    base AS (
      SELECT user_id FROM (
        SELECT user_id, op,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM early
      ) WHERE rn = 1 AND op = '{OP_UPSERT}'
    ),
    late AS (SELECT * FROM ev WHERE ts >= TIMESTAMP '{_SPLIT}'),
    last AS (
      SELECT user_id, event_type, value, ts, event_id, op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM late
    )
    SELECT l.user_id,
           CASE WHEN l.op = '{OP_DELETE}' THEN '{OP_DELETE}'
                WHEN b.user_id IS NOT NULL THEN '{OP_UPSERT}'
                ELSE 'I' END AS net_op,
           CASE WHEN l.op = '{OP_DELETE}' THEN NULL
                ELSE l.event_type END AS last_type,
           CASE WHEN l.op = '{OP_DELETE}' THEN NULL
                ELSE l.value END AS last_value,
           epoch_us(l.ts) AS last_ts_us,
           l.event_id AS last_event_id
    FROM last l LEFT JOIN base b ON l.user_id = b.user_id
    WHERE l.rn = 1 AND (b.user_id IS NOT NULL OR l.op = '{OP_UPSERT}')
    """,
)
def cdc_net_changes(spark, sf_dir):
    """Net-changes compaction (Delta-CDF semantics): the raw changeset
    collapses to one I/U/D row per touched key relative to the base key
    set; inside-batch insert+delete cancels; delete rows carry nulled
    payload (no stale data in the feed) but keep their seq. Compaction
    is the same single ``max_by`` aggregate; the base-key join ships
    keys only and broadcasts when under the size gate."""
    base, late = _base_and_late(spark, sf_dir)
    net = net_changes(
        late,
        base.select(*_KEYS),
        keys=_KEYS,
        seq=_SEQ,
        payload=_PAYLOAD,
    )
    return net.select(
        "user_id",
        "net_op",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("event_id").alias("last_event_id"),
    )


@register(
    "cdc_world_merge",
    f"""
    WITH {_EV_SQL},
    last AS (
      SELECT user_id, event_type, value, ts, event_id, op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT user_id, event_type AS last_type, value AS last_value,
           epoch_us(ts) AS last_ts_us
    FROM last WHERE rn = 1 AND op = '{OP_UPSERT}'
    """,
)
def cdc_world_merge(spark, sf_dir):
    """CDC ingest into the persisted store, replayed twice: seed a
    World with the base snapshot, apply the SAME net-changes batch two
    times (the at-least-once redelivery a real ingest loop must
    absorb), flush, read back. Hash-equality against the declarative
    latest-wins end state certifies merge semantics AND replay
    idempotence AND the store round trip in one query. Net deletes are
    one bounded per-batch key list (batch churn, never table size);
    upserts rewrite only the chunks they land in (dirty-only flush,
    tokio-fs/src/lib.rs:207-235)."""
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.core.scratch import scratch_dir
    from dmds_spark.world import World

    base, late = _base_and_late(spark, sf_dir)
    spec = WorldSpec(dims=(DimSpec("user_id", 0, 2**20 - 1, 64),))
    root = scratch_dir("cdc_world", sf_dir)
    world = World(spark, spec, root)
    world.upsert(base.select(*_KEYS, *_PAYLOAD, *_SEQ))
    world.flush()

    net = net_changes(
        late, base.select(*_KEYS), keys=_KEYS, seq=_SEQ, payload=_PAYLOAD
    )
    merge_net_into_world(world, net)
    world.flush()
    merge_net_into_world(world, net)  # at-least-once replay: same state
    world.flush()

    return world.snapshot().select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
    )
