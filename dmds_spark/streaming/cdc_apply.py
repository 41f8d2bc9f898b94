"""Streaming CDC apply: a ``writeStream.foreachBatch`` arm that merges
each micro-batch of (key, seq, op, payload) change records into a
persisted :class:`~dmds_spark.world.World` — the online twin of the
batch ``cdc_apply_changeset`` query (operators/cdc.py).

Conflict resolution is SEQ-AWARE, not arrival-aware: each batch is
compacted to latest-wins per key (one ``max_by`` aggregate), then
joined against the CURRENT stored seq of only the touched keys and
applied only where ``batch seq > stored seq``. Deletes are stored as
TOMBSTONE rows (the op column is part of the stored payload), never
physical removals — a tombstone keeps the key's seq memory, so a
replayed or out-of-order older upsert can never resurrect a deleted
key (the failure mode of delete-as-removal, which this module's first
draft had and the ``rollup_incremental_cdc`` oracle caught). This is
Kafka-compaction / Delta-CDF tombstone semantics. The serving view is
``current_state()`` (tombstones filtered); physical reclamation is the
explicit ``purge_tombstones`` maintenance call, safe once the
redelivery horizon has passed — the same deferred-reclaim discipline
as ``World.vacuum_snapshots``.

Scale shape per trigger: the micro-batch key set (small) broadcasts to
semi-join-prune the world snapshot scan, so the stored-seq lookup costs
one pruned read of the touched chunks, never the table; the merge then
upserts O(batch) rows and the flush rewrites only dirty chunks
(tokio-fs/src/lib.rs:207-235 discipline end to end).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dmds_spark.operators.cdc import OP_DELETE, latest_wins


def apply_cdc_batch(
    world,
    batch_df: DataFrame,
    *,
    keys: Sequence[str],
    seq: Sequence[str],
    op_col: str = "op",
    payload: Sequence[str] = (),
) -> None:
    """Merge ONE batch of change records into the world (seq-aware,
    replay-idempotent). Usable directly for batch ingest; the streaming
    sink wraps it per trigger."""
    from dmds_spark.core.engine import materialize

    # materialize the compacted batch ONCE: it feeds both the broadcast
    # key list (snapshot pruning) and the stored-seq join below —
    # un-pinned, each consumer re-ran the max_by aggregate per trigger
    lw = latest_wins(
        batch_df, keys=keys, seq=seq, op_col=op_col, payload=payload
    ).transform(materialize)
    snap = world.snapshot()
    if set(seq) <= set(snap.columns):
        stored = snap.join(
            F.broadcast(lw.select(*keys)), on=list(keys), how="left_semi"
        ).select(*keys, *[F.col(c).alias(f"__stored_{c}") for c in seq])
        j = lw.join(F.broadcast(stored), on=list(keys), how="left")
        newer = F.col(f"__stored_{seq[0]}").isNull() | (
            F.struct(*[F.col(c) for c in seq])
            > F.struct(*[F.col(f"__stored_{c}") for c in seq])
        )
        fresh = j.filter(newer).drop(*[f"__stored_{c}" for c in seq])
    else:
        # cold start: the world has never stored rows (its snapshot has
        # no seq columns yet) — every compacted record is fresh
        fresh = lw

    # tombstones ride along: deletes are upserts of an op='D' row (null
    # payload — no stale data retained), keeping the key's seq memory
    tomb = [
        F.when(F.col(op_col) != OP_DELETE, F.col(c)).alias(c)
        for c in payload
    ]
    world.upsert(fresh.select(*keys, *tomb, *seq, op_col))
    world.flush()


def current_state(world, op_col: str = "op") -> DataFrame:
    """The serving view: live rows only (tombstones filtered)."""
    return world.snapshot().filter(F.col(op_col) != OP_DELETE)


def purge_tombstones(world, horizon_pred, op_col: str = "op") -> int:
    """Physically remove tombstones older than the redelivery horizon
    (``horizon_pred``: a Column over the stored seq columns, e.g.
    ``F.col("ts") < F.lit(cutoff)``). Only call once no replay can
    deliver records older than the horizon — after this, a stale
    upsert for a purged key WOULD resurrect it; that is the operator's
    retention contract (Kafka compaction's delete.retention.ms).
    Returns the number of tombstones purged. The key list collected is
    one purge batch's tombstones, bounded by churn inside the horizon
    window, never the table."""
    dead = (
        world.snapshot()
        .filter((F.col(op_col) == OP_DELETE) & horizon_pred)
        .select(world.spec.id_dim.name)
        .collect()
    )
    if dead:
        world.delete_ids([r[0] for r in dead])
        world.flush()
    return len(dead)


def cdc_apply_sink(
    world,
    *,
    keys: Sequence[str],
    seq: Sequence[str],
    op_col: str = "op",
    payload: Sequence[str] = (),
):
    """``foreachBatch`` sink applying each micro-batch of change
    records to the world. Empty triggers are skipped without taking
    the writer lock."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_cdc_batch(
            world,
            batch_df,
            keys=keys,
            seq=seq,
            op_col=op_col,
            payload=payload,
        )

    return _sink
