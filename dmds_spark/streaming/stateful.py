"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2b streaming row; the "custom operator" escape hatch the
prompt reserves for semantics built-ins can't express).

``running_user_totals`` keeps an arbitrary per-key accumulator alive
across micro-batches — the general template: GroupState holds a small
tuple per key, each batch folds its rows in, and the operator emits the
updated snapshot. At 100 TB of stream history the state store holds
one row per key (RocksDB-backed on a real cluster), not the history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": int(user_id), "n_events": int(n), "total_value": float(total)}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across
    micro-batches. Emits the refreshed snapshot for every key touched
    by the batch (update semantics)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
