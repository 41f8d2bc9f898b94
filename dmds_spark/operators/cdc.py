"""Change-data-capture application: MERGE an ordered changeset of
upserts/deletes into a base snapshot, compact a changeset into the NET
per-key effect, and replay changesets into a :class:`~dmds_spark.world.World`
idempotently.

This is the ingestion front door of every warehouse-style pipeline: a
Debezium/binlog-shaped stream of ``(key, seq, op, payload)`` records has
to become (a) the current-state table, (b) a minimal "net changes" feed
for downstream consumers, and (c) a durable store commit — without ever
sorting the whole table.

Scale notes (the whole point of the shapes chosen here):

- ``apply_changeset`` is ONE hash aggregate: ``max_by(payload-struct,
  seq-struct)`` per key. No window (a window would sort every partition
  by key+seq; ``max_by`` does a map-side partial reduce, so the shuffle
  carries one candidate row per key per map task — at 100 TB the
  shuffle payload is ~|keys|, not ~|changes|).
- ``net_changes`` joins the compacted per-key last-op against the base
  KEY SET only (key + nothing else on the build side), shuffled on the
  key both sides; the broadcast gate (`maybe_broadcast`) fires when the
  base key set is small enough to ship.
- Deletes surface as rows, never as driver-side lists, until the final
  ``World.delete_ids`` call, whose argument is the net-delete key set of
  ONE batch (bounded by batch churn, not table size).

Reference analogue: the reference's write path applies ordered
upsert/remove ops to the chunk store and flushes only dirty chunks
(``World::insert`` src/world.rs:553-567, ``Lazy::destroy``
src/world/iter.rs:254-265, dirty-only flush tokio-fs/src/lib.rs:207-235);
here the same op algebra is stated declaratively so Catalyst plans the
reduction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_UPSERT = "U"
OP_DELETE = "D"
OP_INSERT = "I"  # emitted by net_changes for keys absent from the base

_LAST = "__cdc_last"
_IS_CHANGE = "__cdc_is_change"


def _struct(cols: Sequence[str]) -> Column:
    return F.struct(*[F.col(c) for c in cols])


def latest_wins(
    changes: DataFrame,
    *,
    keys: Sequence[str],
    seq: Sequence[str],
    op_col: str = "op",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Compact a changeset to its per-key LAST record (op included),
    keeping the seq columns of that record. One hash aggregate; output
    columns: ``keys + payload + seq + [op_col]``.

    The seq struct must be a total order (caller supplies tie-break
    columns, e.g. ``("ts", "event_id")``) — ``max_by`` on a partial
    order would be nondeterministic across retries.
    """
    carried = [*payload, *seq, op_col]
    agg = changes.groupBy(*keys).agg(
        F.max_by(_struct(carried), _struct(seq)).alias(_LAST)
    )
    return agg.select(*keys, *[F.col(f"{_LAST}.{c}").alias(c) for c in carried])


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    *,
    keys: Sequence[str],
    seq: Sequence[str],
    op_col: str = "op",
    payload: Sequence[str] = (),
    count_col: str | None = None,
) -> DataFrame:
    """Latest-wins MERGE: apply an ordered changeset to a base snapshot
    and return the new current-state table.

    ``base`` must carry the same seq columns (a snapshot naturally has
    the seq of the write that produced each row) and is treated as an
    implicit upsert OLDER than every change: the merge orders by
    ``(generation, *seq)`` where base rows are generation 0 and change
    rows generation 1, so base/change ordering never depends on seq
    alone. Rows whose final op is a delete drop out.

    With ``count_col``, the output carries the number of CHANGE rows
    folded into each key (0 for untouched base keys) — the merge-stats
    column an incremental pipeline reports.
    """
    if op_col not in base.columns:
        base = base.withColumn(op_col, F.lit(OP_UPSERT))
    cols = [*keys, *payload, *seq, op_col]
    u = (
        base.select(*cols)
        .withColumn(_IS_CHANGE, F.lit(0).cast("long"))
        .unionByName(
            changes.select(*cols).withColumn(
                _IS_CHANGE, F.lit(1).cast("long")
            )
        )
    )
    carried = [*payload, *seq, op_col]
    agg = u.groupBy(*keys).agg(
        F.max_by(_struct(carried), F.struct(F.col(_IS_CHANGE), *seq)).alias(
            _LAST
        ),
        F.sum(_IS_CHANGE).alias(count_col or _IS_CHANGE),
    )
    out = agg.filter(F.col(f"{_LAST}.{op_col}") == OP_UPSERT).select(
        *keys,
        *[F.col(f"{_LAST}.{c}").alias(c) for c in [*payload, *seq]],
        *([count_col] if count_col else []),
    )
    return out


def net_changes(
    changes: DataFrame,
    base_keys: DataFrame,
    *,
    keys: Sequence[str],
    seq: Sequence[str],
    op_col: str = "op",
    payload: Sequence[str] = (),
    net_op_col: str = "net_op",
) -> DataFrame:
    """Compact a changeset into the NET per-key effect relative to a
    base key set (the Delta-CDF "net changes" feed a downstream consumer
    wants instead of the raw op stream):

    - key in base, last op U  -> ``U`` (update, last payload)
    - key in base, last op D  -> ``D`` (payload columns nulled)
    - key new,     last op U  -> ``I`` (insert, last payload)
    - key new,     last op D  -> dropped (insert+delete inside one
      batch is a no-op downstream)

    ``base_keys`` needs only the key columns. Output:
    ``keys + [net_op_col] + payload + seq`` — seq is kept even for
    deletes so consumers can order the feed.
    """
    from dmds_spark.core.engine import maybe_broadcast

    last = latest_wins(
        changes, keys=keys, seq=seq, op_col=op_col, payload=payload
    )
    marked = last.join(
        maybe_broadcast(
            base_keys.select(*keys).distinct().withColumn(
                "__in_base", F.lit(1)
            )
        ),
        on=list(keys),
        how="left",
    )
    in_base = F.col("__in_base").isNotNull()
    is_del = F.col(op_col) == OP_DELETE
    net = (
        marked.filter(in_base | ~is_del)
        .withColumn(
            net_op_col,
            F.when(is_del, OP_DELETE)
            .when(in_base, OP_UPSERT)
            .otherwise(OP_INSERT),
        )
        .select(
            *keys,
            net_op_col,
            *[
                F.when(~is_del, F.col(c)).alias(c) for c in payload
            ],  # null payload on deletes: the feed carries no stale data
            *seq,
        )
    )
    return net


def merge_net_into_world(world, net: DataFrame, *, net_op_col: str = "net_op"):
    """Apply a NET changeset (output of :func:`net_changes`) to a World:
    upserts/inserts go through ``World.upsert`` as one DataFrame write;
    net-deletes through ``World.delete_ids``. Replay-safe: applying the
    same net batch twice converges to the same state (upserts are
    idempotent by key; deleting an absent id is a no-op).

    The delete key list is collected to the driver — it is the net
    deletion set of ONE batch (bounded by per-batch churn, like the
    dirty-partition key lists World.flush already collects), never the
    table's key space.

    The net frame is materialized once up front: its lineage (scan +
    compaction aggregate + base-keys join) would otherwise execute
    twice — once for the upsert flush, once for the delete collect.
    """
    from dmds_spark.core.engine import materialize

    net = materialize(net)
    id_col = world.spec.id_dim.name
    ups = net.filter(F.col(net_op_col) != OP_DELETE).drop(net_op_col)
    world.upsert(ups)
    dels = [
        r[0]
        for r in net.filter(F.col(net_op_col) == OP_DELETE)
        .select(id_col)
        .collect()
    ]
    if dels:
        world.delete_ids(dels)
    return world
