"""Online time-decayed top-k via ``applyInPandasWithState`` — "what's
hot RIGHT NOW per key", the trending-items primitive (heavy_hitters
answers all-time dominance; this answers recency-weighted dominance).

Model: every event contributes weight ``2^(-(ref - ts) / halflife)``
at reference time ``ref`` — an exponential decay in EVENT TIME, so the
decayed count of an item is a pure function of its event timestamps
and the reference instant, independent of batch boundaries or arrival
order. The state carries per tracked item its weight at ``last_ref``;
a new micro-batch advances ``ref`` to the max event time seen so far,
scales every stored weight by ``2^(-(ref - last_ref)/halflife)``
(exactly the same total exponent any split of the timeline produces,
up to float rounding), and adds the batch's per-item contribution.

Bounded state: after each merge, items below ``min_weight`` are
dropped and at most ``k`` items are kept (by weight, ties on the item
string). Pruning is UNDERCOUNT-ONLY — a dropped item that returns
restarts from zero — and the forfeited mass is tracked: every pruned
item forfeits its weight at drop time, which only decays afterwards,
so the emitted cumulative ``dropped_bound`` upper-bounds the total
mass missing from the summary. Consumers get
``true_decayed - dropped_bound <= est <= true_decayed`` (pinned in
tests/test_streaming_decayed_topk.py, with batch-split invariance and
a half-life hand check).

At 100 TB of stream: state per key is k (item, weight) pairs + two
scalars, merge cost is the batch's distinct-item count, and the decay
scan is one vector multiply — same cost envelope as heavy_hitters.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DTK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
        T.StructField("last_ref", T.LongType()),  # micros
        T.StructField("dropped_bound", T.DoubleType()),
    ]
)

DTK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("ref_ts", T.LongType()),
        T.StructField("dropped_bound", T.DoubleType()),
    ]
)


def decayed_merge(
    weights: dict[str, float],
    last_ref: int,
    batch: list[tuple[str, int]],
    halflife_us: int,
    k: int,
    min_weight: float,
) -> tuple[dict[str, float], int, float]:
    """Merge one batch of (item, ts_micros) events into a decayed
    summary. Returns (new weights, new ref, weight dropped by pruning
    in this merge). Pure function — the unit under the property tests.

    The reference only moves FORWARD (out-of-order batches whose max
    ts trails the watermark fold at the current ref), and every
    contribution is computed against the new ref directly, so batch
    splits commute up to float rounding."""
    new_ref = max([last_ref, *(ts for _, ts in batch)])
    scale = 2.0 ** (-(new_ref - last_ref) / halflife_us)
    merged = {i: w * scale for i, w in weights.items()}
    for item, ts in batch:
        merged[item] = merged.get(item, 0.0) + 2.0 ** (
            -(new_ref - ts) / halflife_us
        )
    kept = {i: w for i, w in merged.items() if w >= min_weight}
    if len(kept) > k:
        order = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(order[:k])
    dropped = math.fsum(merged.values()) - math.fsum(kept.values())
    return kept, new_ref, max(dropped, 0.0)


def _make_update(halflife_us: int, k: int, min_weight: float):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_key,) = key
        if state.hasTimedOut:  # no timeouts armed; defensive no-op
            return
        if state.exists:
            items, ws, last_ref, dropped_bound = state.get
            weights = dict(zip(items, (float(w) for w in ws)))
        else:
            weights, last_ref, dropped_bound = {}, 0, 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            batch = list(
                zip(
                    (str(i) for i in rows["item"]),
                    (int(t) for t in rows["ts_us"]),
                )
            )
            weights, last_ref, dropped = decayed_merge(
                weights, int(last_ref), batch, halflife_us, k, min_weight
            )
            dropped_bound += dropped
        state.update(
            (
                list(weights),
                [float(w) for w in weights.values()],
                int(last_ref),
                float(dropped_bound),
            )
        )
        if weights:
            yield pd.DataFrame(
                [
                    {
                        "key": group_key,
                        "item": item,
                        "weight": float(w),
                        "ref_ts": int(last_ref),
                        "dropped_bound": float(dropped_bound),
                    }
                    for item, w in weights.items()
                ]
            )

    return _update


def streaming_decayed_topk(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    ts_col: str = "ts",
    halflife: str = "1 hour",
    k: int = 8,
    min_weight: float = 1e-6,
) -> DataFrame:
    """Per-``key_col`` exponentially-decayed top-``k`` items over a
    stream; each micro-batch appends the key's current summary rows
    tagged with ``ref_ts`` (take the rows at the key's max ref_ts for
    the freshest view — same emission contract as heavy_hitters)."""
    from pyspark.sql import functions as F

    n, unit = halflife.split()
    per_us = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }[unit]
    halflife_us = int(n) * per_us
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.col(item_col).cast("string").alias("item"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _make_update(halflife_us, k, min_weight),
            outputStructType=DTK_OUTPUT_SCHEMA,
            stateStructType=DTK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
