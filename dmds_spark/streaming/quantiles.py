"""Online quantiles via ``applyInPandasWithState`` — bounded-state
Greenwald–Khanna (GK) summaries per stream key: the latency/size
percentile monitor a pipeline runs on its intake, with a HARD rank
guarantee instead of a heuristic estimate.

Per key the state is the GK tuple list (value, g, delta) plus one
counter — O((1/eps) * log(eps * n)) tuples, never the history. Each
micro-batch inserts its values (delta = floor(2*eps*n) for interior
inserts — the invariant g + delta <= 2*eps*n + 1 survives batching
because n only grows) and compresses adjacent tuples back under the
bound.

Guarantee (from the maintained invariant g + delta <= 2*eps*n + 1,
carried in the emissions so consumers can bound error without
trusting this docstring): a query for quantile phi over n observed
values returns an OBSERVED value whose attainable rank r satisfies
``|r - ceil(phi * n)| <= eps * n + 1/2`` — the classic GK bound; the
+1/2 comes from the +1 in the invariant and only matters while
eps * n < 1 (a summary that young is near-exact anyway). Pinned by
property tests against exact ranks over random streams and arbitrary
batch splits (tests/test_streaming_quantiles.py).

Emission contract mirrors streaming/heavy_hitters.py: every
micro-batch appends the key's CURRENT estimates for the requested
quantiles tagged with ``n_seen`` — consumers take the rows with the
key's max ``n_seen``. Append-mode-friendly.

At 100 TB of stream: state per key stays logarithmic in n (RocksDB-
backed on a cluster); insert cost per batch is O(batch * summary) in
this reference implementation — the summary is tens of tuples at
practical eps, so the constant is small, and the classic tree-buffer
variants are a drop-in if a profile ever shows this loop.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vs", T.ArrayType(T.DoubleType())),
        T.StructField("gs", T.ArrayType(T.LongType())),
        T.StructField("deltas", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

GK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("phi", T.DoubleType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("summary_size", T.LongType()),
        T.StructField("eps", T.DoubleType()),
    ]
)

DEFAULT_PHIS = (0.5, 0.9, 0.99)


def gk_insert(summary: list, n: int, v: float, eps: float) -> int:
    """Insert one value into the GK summary (list of [v, g, delta],
    sorted by v); returns the new n. End inserts carry delta = 0 (their
    rank is exact at insert time); interior inserts delta =
    floor(2*eps*n), the classic allowance."""
    vs = [t[0] for t in summary]
    i = bisect.bisect_right(vs, v)
    if i == 0 or i == len(summary):
        summary.insert(i, [v, 1, 0])
    else:
        summary.insert(i, [v, 1, int(2 * eps * n)])
    return n + 1


def gk_compress(summary: list, n: int, eps: float) -> None:
    """Merge adjacent tuples while g_i + g_{i+1} + delta_{i+1} stays
    under the 2*eps*n budget (first and last tuples are never removed:
    min and max stay exact)."""
    cap = int(2 * eps * n)
    i = len(summary) - 2
    while i >= 1:
        g_i, nxt = summary[i][1], summary[i + 1]
        if g_i + nxt[1] + nxt[2] <= cap:
            nxt[1] += g_i
            del summary[i]
        i -= 1


def gk_query(summary: list, n: int, phi: float, eps: float) -> float:
    """Value minimizing the WORST-CASE rank deviation
    ``max(rmax - r, r - rmin)`` from r = ceil(phi*n). The true rank
    lies anywhere in the claimed [rmin, rmax], so this is the bound
    the answer actually carries — selecting by "does the claimed
    interval contain r" is a trap: a tuple with a wide delta can
    contain r while its true rank sits a full interval-width away
    (caught by the 200-trial duplicate-heavy sweep). The GK theorem
    guarantees some tuple has BOTH rmin >= r - e and rmax <= r + e
    for e = eps*n + 1/2 (since max(g + delta) <= 2*eps*n + 1), so the
    minimized worst case is <= e."""
    if not summary:
        raise ValueError("empty summary")
    import math

    r = max(1, min(n, math.ceil(phi * n)))
    rmin = 0
    best_v, best_err = summary[0][0], float("inf")
    for v, g, delta in summary:
        rmin += g
        err = max(rmin + delta - r, r - rmin)
        if err < best_err:
            best_v, best_err = v, err
    return best_v


def gk_insert_batch(
    summary: list, n: int, values, eps: float
) -> int:
    """Insert a batch (any order), then compress once."""
    for v in values:
        n = gk_insert(summary, n, float(v), eps)
    gk_compress(summary, n, eps)
    return n


def _make_update(eps: float, phis: tuple):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_key,) = key
        if state.hasTimedOut:  # no timeouts armed; defensive no-op
            return
        if state.exists:
            vs, gs, deltas, n = state.get
            summary = [
                [float(v), int(g), int(d)]
                for v, g, d in zip(vs, gs, deltas)
            ]
        else:
            summary, n = [], 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            n = gk_insert_batch(
                summary, int(n), rows["value"].astype(float), eps
            )
        state.update(
            (
                [t[0] for t in summary],
                [t[1] for t in summary],
                [t[2] for t in summary],
                int(n),
            )
        )
        if summary:
            yield pd.DataFrame(
                [
                    {
                        "key": group_key,
                        "phi": float(phi),
                        "value": gk_query(summary, n, phi, eps),
                        "n_seen": int(n),
                        "summary_size": len(summary),
                        "eps": float(eps),
                    }
                    for phi in phis
                ]
            )

    return _update


def streaming_quantiles(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    eps: float = 0.01,
    phis: tuple = DEFAULT_PHIS,
) -> DataFrame:
    """Per-``key_col`` GK quantile summaries over a stream of numeric
    values; each micro-batch appends the current estimates (see module
    docstring for the rank-error contract)."""
    from pyspark.sql import functions as F

    return (
        events.select(
            F.col(key_col).alias("key"),
            F.col(value_col).cast("double").alias("value"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _make_update(eps, tuple(phis)),
            outputStructType=GK_OUTPUT_SCHEMA,
            stateStructType=GK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
