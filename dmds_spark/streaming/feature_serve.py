"""Online point-in-time feature serving via ``applyInPandasWithState``
— the streaming twin of the batch ``feature_point_in_time`` query
(queries/round13b.py): every arriving example is emitted with its
entity's STRICTLY PRIOR history aggregates (order count + lifetime
revenue in cents), then folded into the state. This is the
training/serving-skew killer: the online path computes features with
exactly the offline window's as-of semantics.

Per entity the state is ONE (n, sum_cents) tuple — never the history.
Each micro-batch folds its rows in (o_orderdate, o_orderkey) order:
row i's features are the state BEFORE row i, identical to the batch
window's ROWS UNBOUNDED PRECEDING minus self. Output is append-shaped:
one feature row per input example, exactly once.

Equivalence (pinned in tests/test_streaming_features.py): fed the same
examples in timestamp order, the emitted features equal the batch
query's window output row for row. Cross-batch disorder is the
standard online/backfill split: an example arriving AFTER a
later-dated one has already folded sees that later row in its history
(arrival-order truth) — same caveat as streaming/sessionize.py; run
the batch query over the corrected log for backfills.

State never expires (features accumulate for the entity's lifetime),
so state size tracks LIVE entities — the entity dimension, not the
event stream. On a cluster that is a RocksDB state store; entities
that churn out can be reaped by a periodic rewrite if the dimension
itself is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FEATURE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("prior_orders", T.LongType()),
        T.StructField("prior_revenue_c", T.LongType()),
    ]
)

FEATURE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_c", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (custkey,) = key
    n, sum_c = state.get if state.exists else (0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(
        ["o_orderdate", "o_orderkey"], kind="mergesort"
    )
    out = []
    for okey, cents in zip(rows["o_orderkey"], rows["__cents"]):
        out.append(
            {
                "o_orderkey": int(okey),
                "o_custkey": int(custkey),
                "prior_orders": int(n),
                "prior_revenue_c": int(sum_c),
            }
        )
        n += 1
        sum_c += int(cents)
    state.update((int(n), int(sum_c)))
    yield pd.DataFrame(out)


def streaming_point_in_time_features(orders: DataFrame) -> DataFrame:
    """Per-order strictly-prior features over a stream of orders
    (o_orderkey, o_custkey, o_orderdate, o_totalprice). Revenue is
    exact cents (decimal -> long BEFORE the Python boundary, so the
    state arithmetic is pure integers)."""
    prepared = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("__cents"),
    )
    return prepared.groupBy("o_custkey").applyInPandasWithState(
        _update,
        outputStructType=FEATURE_OUTPUT_SCHEMA,
        stateStructType=FEATURE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
