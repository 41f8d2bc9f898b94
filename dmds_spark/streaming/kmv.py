"""Online distinct-count via a bottom-k (KMV) sketch per stream key —
the streaming twin of the batch ``agg_kmv_distinct_calibration``
query. State per key is the k smallest DISTINCT 48-bit item hashes:
mergeable, bounded, and (unlike HLL) carrying an exactly-auditable
estimator.

The fold is a set union followed by keep-k-smallest — associative,
commutative, and idempotent (re-delivered items are absorbed by the
DISTINCT), so any micro-batch split, ordering, or at-least-once replay
folds to the same sketch (pinned in tests/test_streaming_kmv.py).
Idempotence is the property HLL shares but counters do not — it is
what makes the sketch safe under retries.

Estimator: with fewer than k tracked hashes the count is EXACT
(n_tracked); at capacity the classic KMV estimate is
(k-1) * 2^48 / kth_hash. Item hashes are computed JVM-side
(md5-derived, same as the batch query) so the pandas fold only ever
handles int64s.

Emission contract: every micro-batch that touches a key appends the
key's current (n_tracked, kth_hash, est_distinct) tagged with
``n_seen``; consumers take the max-``n_seen`` row per key. At 100 TB
of stream: k int64s per key, merge cost = batch distinct count, and
two sketches union by merging their bottom-k sets — the same merge
that makes per-shard batch sketches combinable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_SPACE = 1 << 48

KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_tracked", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("est_distinct", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def kmv_merge(hashes: list[int], batch_hashes, k: int) -> list[int]:
    """Union a batch's hashes into a bottom-k set: distinct, sorted,
    first k. Pure function — the unit under the associativity/
    idempotence tests."""
    return sorted(set(hashes) | {int(h) for h in batch_hashes})[:k]


def kmv_estimate(hashes: list[int], k: int) -> tuple[int, int | None, float]:
    """(n_tracked, kth_hash, est_distinct) for a bottom-k set: exact
    below capacity, (k-1) * 2^48 / kth at capacity."""
    n = len(hashes)
    if n < k:
        return n, None, float(n)
    kth = hashes[k - 1]
    # kth == 0 means every one of the bottom-k distinct hashes is 0 —
    # impossible for k > 1 (the set is distinct), but a single-item
    # stream hashing to exactly 0 (p = 2^-48 per item, reachable at
    # scale) would divide by zero and kill the streaming query. The
    # estimator's domain is kth >= 1; clamp rather than crash.
    kth = max(kth, 1)
    return n, kth, (k - 1) * KMV_SPACE / kth


def _make_update(k: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_key,) = key
        if state.hasTimedOut:  # no timeouts armed; defensive no-op
            return
        if state.exists:
            hashes, n_seen = state.get
            hashes = [int(h) for h in hashes]
        else:
            hashes, n_seen = [], 0
        for pdf in pdfs:
            if len(pdf):
                n_seen += int(len(pdf))
                hashes = kmv_merge(hashes, pdf["u"].dropna(), k)
        state.update((hashes, int(n_seen)))
        n_tracked, kth, est = kmv_estimate(hashes, k)
        yield pd.DataFrame(
            [
                {
                    "key": group_key,
                    "n_tracked": n_tracked,
                    "kth_hash": kth,
                    "est_distinct": est,
                    "n_seen": int(n_seen),
                }
            ]
        )

    return _update


def streaming_kmv_distinct(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Per-``key_col`` bottom-k distinct sketches over a stream of
    items; every micro-batch appends each touched key's current
    estimate (see module docstring). The 48-bit item hash is the same
    md5 prefix the batch KMV query uses, computed JVM-side."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.conv(
            F.substring(F.md5(F.col(item_col).cast("string")), 1, 12), 16, 10
        )
        .cast("bigint")
        .alias("u"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_update(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
