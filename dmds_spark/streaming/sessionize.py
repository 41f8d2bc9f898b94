"""Online sessionization via ``applyInPandasWithState`` with
EVENT-TIME TIMEOUT — the closed-session emitter the batch
``sessionize_10m`` query mirrors (same 10-minute-gap semantics as the
lag + gap-flag + running-sum window there).

Per user the state is ONE open session tuple (start, last_ts,
n_events) — never the event history. Each micro-batch folds its events
in ts order: a gap > ``gap`` closes the open session (emitted
immediately) and starts a new one; the open session is then registered
for an event-time timeout at last_ts + gap, so when the WATERMARK
passes that point with no further activity Spark calls the function
back with ``state.hasTimedOut`` and the final session flushes. Output
is append-shaped: every emitted row is a CLOSED session, exactly once.

Equivalence: fed the same events in timestamp order, the union of
emitted sessions equals the batch query's (user_id, session_start,
session_end, n_events) rows — pinned in
tests/test_streaming_sessionize.py. Out-of-order events WITHIN the
watermark are sorted inside their batch; events later than an
already-closed session boundary land in a fresh session (the standard
online/backfill split, same caveat as streaming/funnel.py).

At 100 TB of stream history: state is one row per ACTIVE key
(RocksDB-backed on a cluster) and the timeout reaps idle keys, so
state size tracks concurrent users, not total users ever seen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _closed_row(user_id, start, last_ts, n) -> dict:
    return {
        "user_id": user_id,
        "session_start": start,
        "session_end": last_ts,
        "n_events": int(n),
    }


def _make_update(gap_ms: int):
    gap = pd.Timedelta(milliseconds=gap_ms)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last_ts, n = state.get
            state.remove()
            yield pd.DataFrame([_closed_row(user_id, start, last_ts, n)])
            return
        start, last_ts, n = state.get if state.exists else (None, None, 0)
        closed: list[dict] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        for ts in rows["ts"]:
            if last_ts is not None and ts - last_ts > gap:
                closed.append(_closed_row(user_id, start, last_ts, n))
                start, n = ts, 0
            if start is None:
                start = ts
            last_ts = ts
            n += 1
        state.update((start, last_ts, int(n)))
        # flush the open session once the watermark passes last_ts+gap
        state.setTimeoutTimestamp(
            int(last_ts.timestamp() * 1000) + gap_ms
        )
        if closed:
            yield pd.DataFrame(closed)

    return _update


def streaming_sessionize(
    events: DataFrame, gap_ms: int = 600_000
) -> DataFrame:
    """Closed sessions (user_id, session_start, session_end, n_events)
    over a stream of (user_id, ts), 10-minute inactivity gap by
    default. The input stream MUST carry a watermark on ``ts`` —
    event-time timeout requires one (Spark raises otherwise), and the
    watermark is what flushes the final session of an idle user."""
    key_type = events.schema["user_id"].dataType
    output_schema = T.StructType(
        [
            T.StructField("user_id", key_type),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(gap_ms),
            outputStructType=output_schema,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
