"""Online OHLC bars via ``applyInPandasWithState`` — the streaming twin
of the batch ``events_ohlc_downsample`` query: per (event_type, hour)
bar, maintain open/high/low/close of ``value`` as events arrive.

The fold is ASSOCIATIVE AND COMMUTATIVE by construction: open/close
are argmin/argmax over a TOTAL-order key (zero-padded epoch micros ++
event_id, computed JVM-side in the pre-grouping projection so both
engines and every batch split agree), high/low are plain min/max, and
no double is ever summed — so any micro-batch arrival order folds to
the same bar, and the stream result equals the batch query exactly
(pinned in tests/test_streaming_ohlc.py). That associativity is the
whole design: late or out-of-order events within a bar need no
watermark to be CORRECT, only to bound state.

State per key is seven scalars (two order keys, four doubles, one
count) — constant, RocksDB-friendly. Emission contract: every
micro-batch that touches a bar appends the bar's CURRENT values
tagged with ``n_events``; consumers take the max-``n_events`` row per
bar for the freshest state (same append-mode contract as the
heavy-hitters/quantiles operators). Production would arm an event-time
timeout to retire bars past the lateness horizon and emit a final row;
the fold itself is timeout-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Width of one order key: two 20-digit sortable_int64 halves. Doubles
# as the state-format version marker — pre-r11 checkpoints stored
# 32-char lpad keys, and _update fails fast when a resumed state
# carries a key of any other width (cross-format lexicographic
# comparison would silently corrupt open/close selection).
OHLC_KEY_WIDTH = 40

OHLC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_k", T.StringType()),
        T.StructField("open_v", T.DoubleType()),
        T.StructField("close_k", T.StringType()),
        T.StructField("close_v", T.DoubleType()),
        T.StructField("high_v", T.DoubleType()),
        T.StructField("low_v", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

OHLC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bar_hour", T.StringType()),
        T.StructField("open_v", T.DoubleType()),
        T.StructField("high_v", T.DoubleType()),
        T.StructField("low_v", T.DoubleType()),
        T.StructField("close_v", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def ohlc_merge(state: tuple | None, batch: pd.DataFrame) -> tuple:
    """Merge a non-empty (ok, value) batch into an OHLC state tuple
    ``(open_k, open_v, close_k, close_v, high_v, low_v, n)``. Pure
    function — the unit under the associativity tests."""
    i_min = batch["ok"].idxmin()
    i_max = batch["ok"].idxmax()
    b = (
        str(batch["ok"][i_min]),
        float(batch["value"][i_min]),
        str(batch["ok"][i_max]),
        float(batch["value"][i_max]),
        float(batch["value"].max()),
        float(batch["value"].min()),
        int(len(batch)),
    )
    if state is None:
        return b
    ok, ov, ck, cv, hi, lo, n = state
    bok, bov, bck, bcv, bhi, blo, bn = b
    if bok < ok:
        ok, ov = bok, bov
    if bck > ck:
        ck, cv = bck, bcv
    return (ok, ov, ck, cv, max(hi, bhi), min(lo, blo), n + bn)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    event_type, bar_hour = key
    if state.hasTimedOut:  # no timeouts armed; defensive no-op
        return
    cur = tuple(state.get) if state.exists else None
    if cur is not None and (
        len(cur[0]) != OHLC_KEY_WIDTH or len(cur[2]) != OHLC_KEY_WIDTH
    ):
        # Fail fast instead of corrupting open/close selection: a
        # resumed state whose order keys aren't the current fixed
        # width comes from a pre-upgrade checkpoint (the r11 32-char
        # lpad format) — old and new keys are not mutually comparable.
        raise ValueError(
            f"OHLC state for {key} carries order keys of width "
            f"{len(cur[0])}, expected {OHLC_KEY_WIDTH}: this checkpoint "
            "predates the sortable_int64 key format. Restart the query "
            "with a FRESH checkpoint directory (see streaming_ohlc)."
        )
    for pdf in pdfs:
        pdf = pdf.dropna(subset=["value"])
        if len(pdf):
            cur = ohlc_merge(cur, pdf.reset_index(drop=True))
    if cur is None:
        return
    state.update(cur)
    ok, ov, ck, cv, hi, lo, n = cur
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "bar_hour": bar_hour,
                "open_v": ov,
                "high_v": hi,
                "low_v": lo,
                "close_v": cv,
                "n_events": n,
            }
        ]
    )


def streaming_ohlc(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per (event_type, hour) OHLC bars over a (streaming or batch)
    event frame; every micro-batch appends each touched bar's current
    values (see module docstring for the freshness contract). The
    total-order key and the bar column are computed JVM-side so the
    pandas fold only ever compares prebuilt strings — identical to the
    batch query's keys.

    STATE FORMAT NOTE (round 11): the key switched from 32-char lpad
    (which truncated wide ids and mis-ordered negatives) to the
    40-char shifted ``sortable_int64`` form. Old- and new-format keys
    are NOT mutually comparable, so a query restarting from a
    pre-change checkpoint must start a FRESH checkpoint directory.
    This is ENFORCED at runtime: the fold fails fast on a resumed
    state whose keys aren't ``OHLC_KEY_WIDTH`` wide, instead of
    silently corrupting open/close selection for bars spanning the
    upgrade."""
    from pyspark.sql import functions as F

    from dmds_spark.functions.keys import sortable_int64

    keyed = events.filter(F.col(value_col).isNotNull()).select(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", ts_col).cast("string").alias("bar_hour"),
        F.concat(
            sortable_int64(F.unix_micros(ts_col)),
            sortable_int64(F.col(id_col)),
        ).alias("ok"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("event_type", "bar_hour").applyInPandasWithState(
        _update,
        outputStructType=OHLC_OUTPUT_SCHEMA,
        stateStructType=OHLC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
