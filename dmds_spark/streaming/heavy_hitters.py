"""Online heavy hitters via ``applyInPandasWithState`` — bounded-state
Misra–Gries summaries per stream key (e.g. "which users dominate each
event type", the abuse/hot-key detector a pipeline runs on its intake).

Per key the state is AT MOST ``k`` (item, count) pairs plus two
scalars — never the item universe and never the history. Each
micro-batch pre-aggregates its items (one ``value_counts``), merges the
weighted counts into the tracked set, then restores the k-bound by
repeatedly subtracting the minimum tracked count and dropping zeros
(the batched Misra–Gries reduction: one subtraction of ``m`` removes
``>= m*(k+1)`` total weight, so the classic guarantee survives
batching).

Guarantees after ``n_seen`` items with ``decrements`` total subtracted
(both carried in the emitted rows, so consumers can bound error
without trusting this docstring):

- undercount only: ``true_count - decrements <= est <= true_count``;
- ``decrements <= n_seen // (k + 1)``;
- therefore every item with ``true_count > n_seen // (k + 1)`` is
  still tracked (no heavy hitter is ever evicted silently).

Emission contract: every micro-batch appends the key's CURRENT summary
tagged with ``n_seen`` — consumers take the rows with the key's max
``n_seen`` for the freshest summary (append-mode-friendly; pinned in
tests/test_streaming_heavy_hitters.py against exact pandas counts).

At 100 TB of stream: state per key is k pairs (RocksDB-backed on a
cluster), merge cost per batch is the batch's distinct-item count, and
the guarantee degrades gracefully with k — the standard trade the
sketch makes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
        T.StructField("decrements", T.LongType()),
    ]
)

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("decrements", T.LongType()),
    ]
)


def misra_gries_merge(
    counters: dict[str, int], batch_counts: dict[str, int], k: int
) -> tuple[dict[str, int], int]:
    """Merge pre-aggregated ``batch_counts`` into a Misra–Gries summary
    bounded at ``k`` entries. Returns (new summary, weight subtracted
    in this merge). Pure function — the unit under the guarantee tests.
    """
    merged = dict(counters)
    for item, c in batch_counts.items():
        merged[item] = merged.get(item, 0) + int(c)
    removed = 0
    while len(merged) > k:
        m = min(merged.values())
        removed += m
        merged = {i: c - m for i, c in merged.items() if c > m}
    return merged, removed


def _make_update(k: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_key,) = key
        if state.hasTimedOut:  # no timeouts armed; defensive no-op
            return
        if state.exists:
            items, counts, n_seen, decrements = state.get
            counters = dict(zip(items, (int(c) for c in counts)))
        else:
            counters, n_seen, decrements = {}, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            vc = rows["item"].value_counts()
            n_seen += int(vc.sum())
            counters, removed = misra_gries_merge(
                counters, {str(i): int(c) for i, c in vc.items()}, k
            )
            decrements += removed
        state.update(
            (
                list(counters),
                [int(c) for c in counters.values()],
                int(n_seen),
                int(decrements),
            )
        )
        if counters:
            yield pd.DataFrame(
                [
                    {
                        "key": group_key,
                        "item": item,
                        "est_count": int(c),
                        "n_seen": int(n_seen),
                        "decrements": int(decrements),
                    }
                    for item, c in counters.items()
                ]
            )

    return _update


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 8,
) -> DataFrame:
    """Per-``key_col`` Misra–Gries heavy-hitter summaries over a stream
    of items; each micro-batch appends the current summary rows (see
    module docstring for the freshness/error contract)."""
    from pyspark.sql import functions as F

    return (
        events.select(
            F.col(key_col).alias("key"),
            F.col(item_col).cast("string").alias("item"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _make_update(k),
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
