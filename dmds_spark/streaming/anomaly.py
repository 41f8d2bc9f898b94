"""Online daily-count anomaly detection via ``applyInPandasWithState``
— the streaming mirror of the batch ``events_daily_anomalies`` query
(queries/llm_extra3.py): flag each CLOSED day whose event count
deviates > 3 sigma from the type's daily distribution, with the z-test
in EXACT integer arithmetic (same ``(n*c - s)^2 > 9*(n*q - s^2)``
identity; Python ints here, so no overflow bound at all).

Per event_type the state is FIVE scalars — (open_day, open_count,
n_closed, sum_c, sum_c2) — never the event history and never the
per-day table. Each micro-batch folds its events in ts order; a day
rollover closes the open day: the running stats absorb its count FIRST
and the flag is then computed against stats over ALL closed days so
far. That makes the online flag for day d bit-identical to running the
batch query over days 1..d — and for the final day, identical to the
batch query itself (prefix-equivalence, pinned in
tests/test_streaming_anomaly.py).

The open day flushes when the WATERMARK passes its end (event-time
timeout at midnight + the allowed lateness), so an idle type still
emits its last day. Late events older than the open day are dropped —
the same events the watermark already excluded from the batch rollup.

At 100 TB of stream: state is 5 scalars per event type (RocksDB-backed
on a cluster), emission is one row per (type, day) — the aggregation
happens IN the fold, so nothing rescans history and nothing grows with
stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DAY_MS = 86_400_000

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_day", T.TimestampType()),
        T.StructField("open_count", T.LongType()),
        T.StructField("n_closed", T.LongType()),
        T.StructField("sum_c", T.LongType()),
        T.StructField("sum_c2", T.LongType()),
    ]
)

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("is_anomaly", T.LongType()),
    ]
)


def integer_z_flag(n: int, c: int, s: int, q: int) -> int:
    """|z| > 3 test on day-count ``c`` against (n, sum, sum-of-squares)
    stats, all-integer: ``(n*c - s)^2 > 9*(n*q - s^2)``. Python ints —
    exact at any magnitude (the SQL twins share a documented ~1e19
    decimal(38,0) bound; the stream state never leaves Python)."""
    lhs = n * c - s
    return 1 if lhs * lhs > 9 * (n * q - s * s) else 0


def _close_day(event_type, day, c, n, s, q):
    """Absorb the closed day into the stats, then flag it against the
    updated (prefix) distribution — the order that makes day d's flag
    equal the batch query over days 1..d."""
    n += 1
    s += c
    q += c * c
    row = {
        "event_type": event_type,
        "day": day,
        "n_events": int(c),
        "is_anomaly": integer_z_flag(n, c, s, q),
    }
    return row, n, s, q


def _make_update(lateness_ms: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:
            open_day, c, n, s, q = state.get
            row, n, s, q = _close_day(event_type, open_day, c, n, s, q)
            state.update((None, 0, int(n), int(s), int(q)))
            # no open day left -> no timeout to re-arm; the next event
            # for this type re-opens a day and re-arms it
            yield pd.DataFrame([row])
            return
        open_day, c, n, s, q = (
            state.get if state.exists else (None, 0, 0, 0, 0)
        )
        closed: list[dict] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        for ts in rows["ts"]:
            day = ts.normalize()
            if open_day is not None and day < open_day:
                continue  # later than the watermark allowed: drop
            if open_day is not None and day > open_day:
                row, n, s, q = _close_day(event_type, open_day, c, n, s, q)
                closed.append(row)
                open_day, c = None, 0
            if open_day is None:
                open_day = day
            c += 1
        state.update((open_day, int(c), int(n), int(s), int(q)))
        if open_day is not None:
            # flush the open day once the watermark passes its end
            state.setTimeoutTimestamp(
                int(open_day.timestamp() * 1000) + DAY_MS + lateness_ms
            )
        if closed:
            yield pd.DataFrame(closed)

    return _update


def streaming_daily_anomalies(
    events: DataFrame, lateness_ms: int = 0
) -> DataFrame:
    """Closed-day anomaly rows (event_type, day, n_events, is_anomaly)
    over a stream of (event_type, ts). The input MUST carry a watermark
    on ``ts`` (event-time timeout requires one); ``lateness_ms`` pads
    the day-close timeout past midnight to match the watermark's slack."""
    return (
        events.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_update(lateness_ms),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
