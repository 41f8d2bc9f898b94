"""Streaming survivorship maintenance: a ``writeStream.foreachBatch``
arm that folds each micro-batch of entity observations into the
persisted :class:`~dmds_spark.operators.survivorship.
IncrementalSurvivorship` golden-record store — the online twin of the
batch ``survivorship_golden_record`` query.

Every survivorship rule family is MERGEABLE (persisted winning keys
for recency/precedence max_by, summed per-category counts for the
modal vote, plain extrema/count partials), so the accumulated store
after ANY micro-batch arrangement of the observation stream equals the
one-shot batch fold — row for row, pinned in
tests/test_streaming_survivorship.py. Replay safety rides the store's
batch-id high-water mark (foreachBatch delivers at-least-once; a
redelivered batch id is skipped, never double-counted).

Scale shape per trigger: ONE hash aggregate over the micro-batch
(max_by ships a single candidate per entity per map task) plus an
|entities|-row state merge behind an atomic pointer flip — history is
never re-scanned, and readers always resolve a committed version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def survivorship_sink(store):
    """The foreachBatch sink: ``stream.writeStream.foreachBatch(
    survivorship_sink(store))``. Thin by design — the store's
    fold_batch already carries the fencing, replay, and flip
    discipline; wrapping it keeps the streaming arm importable without
    constructing a store."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        store.fold_batch(batch_df, batch_id)

    return _sink
