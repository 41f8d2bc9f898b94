"""Streaming strict sequential funnel via ``applyInPandasWithState``:
per-user funnel progress maintained online across micro-batches.

Semantics: the ONLINE funnel — each user's state is (step_reached,
t_prev); every batch folds its events in ts order and advances the
step whenever the next step's event type appears strictly after the
time the previous step was satisfied. When events arrive in timestamp
order (per user) the final state equals the batch
``operators.events.sequential_funnel`` result — pinned by test. Under
out-of-order arrival the online funnel can only under-advance (it
never rewinds to a better/earlier step time the way the batch min-agg
does) — the standard realtime/backfill split: serve the online number
live, reconcile with the batch fold.

State is one small tuple per user (RocksDB-backed on a cluster) —
never the event history; each emitted row is the refreshed snapshot
for the keys the batch touched (update semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.LongType()),
        T.StructField("t_prev", T.TimestampType()),
    ]
)


def _make_update(steps: list[str]):
    n_steps = len(steps)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        step, t_prev = state.get if state.exists else (0, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        for ts, typ in zip(rows["ts"], rows["event_type"]):
            if step >= n_steps:
                break
            if typ == steps[step] and (t_prev is None or ts > t_prev):
                step += 1
                t_prev = ts
        state.update((int(step), t_prev))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "step_reached": int(step),
                    "t_last_step": t_prev,
                }
            ]
        )

    return _update


def streaming_funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """Per-user online funnel progress over a stream of
    (user_id, event_type, ts). Emits (user_id, step_reached,
    t_last_step) snapshots for every user touched by each batch.
    The user_id output type follows the input schema (string keys and
    integer keys both work, matching the batch fold)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    key_type = events.schema["user_id"].dataType
    output_schema = T.StructType(
        [
            T.StructField("user_id", key_type),
            T.StructField("step_reached", T.LongType()),
            T.StructField("t_last_step", T.TimestampType()),
        ]
    )
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(steps),
            outputStructType=output_schema,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
