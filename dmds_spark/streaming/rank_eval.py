"""Online ranking-evaluation via ``applyInPandasWithState`` — the
streaming twin of the batch ``rank_eval_ndcg`` / ``rank_eval_mrr_hit``
queries (queries/round13.py): post-cutoff interactions arrive as a
stream, each micro-batch folds them into per-user held-out relevance
state, and the operator emits every touched user's CURRENT exact-ppm
NDCG@K / reciprocal-rank against the FROZEN pre-cutoff ranking — the
live launch dashboard that converges to the offline report.

The frozen ranking attaches by a stream-static LEFT join on
(user_id, event_type) BEFORE the stateful fold (Structured Streaming
plans static joins per micro-batch), so each arriving interaction
already carries its item's train rank (null = not in the user's
top-K). Per user the state is the held-out item inventory —
{event_type: [rel_count, rank]} — bounded by the item vocabulary a
user touches, never the event stream; metrics recompute from state in
O(inventory) integer arithmetic per emission using the SAME embedded
NDCG discount table as the batch metric (no libm anywhere).

Equivalence (pinned in tests/test_streaming_rank_eval.py): after all
post-cutoff events have arrived — in any micro-batch slicing — each
user's LAST emission equals the batch queries' per-user DCG/IDCG/
NDCG/first-hit values on the same slice, and their rollup equals the
registered aggregates. Arrival-order disorder is harmless here:
relevance is a COUNT and the frozen rank a pure attribute, so the
final state is slicing- and order-independent (unlike sessionize's
arrival-order caveat).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dmds_spark.queries.round13 import K, NDCG_W

RANK_EVAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
        T.StructField("n_items", T.LongType()),
        T.StructField("dcg", T.LongType()),
        T.StructField("idcg", T.LongType()),
        T.StructField("ndcg_ppm", T.LongType()),
        T.StructField("first_rnk", T.LongType()),
        T.StructField("rr_ppm", T.LongType()),
    ]
)

# {event_type: [rel_count, rank_or_null]} as a JSON string plus the
# per-user emission counter (readers keep a user's max-emit_seq row)
RANK_EVAL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _metrics(items: dict[str, list]) -> dict:
    """Exact integer NDCG@K / first-hit metrics from one user's state —
    the same arithmetic as the batch queries, item for item: DCG sums
    rel * W[rank] over ranked items, the ideal ranking orders the
    held-out inventory by (rel DESC, event_type), RR is 1e6 // the
    first (lowest) hit rank."""
    dcg = sum(
        rel * NDCG_W[rnk]
        for rel, rnk in items.values()
        if rnk is not None and rnk <= K
    )
    ideal = sorted(items.items(), key=lambda kv: (-kv[1][0], kv[0]))[:K]
    idcg = sum(rel * NDCG_W[i + 1] for i, (_et, (rel, _r)) in enumerate(ideal))
    hits = [rnk for rel, rnk in items.values() if rnk is not None]
    first = min(hits) if hits else None
    return {
        "n_items": len(items),
        "dcg": int(dcg),
        "idcg": int(idcg),
        "ndcg_ppm": (dcg * 1_000_000) // idcg if idcg > 0 else 0,
        "first_rnk": first if first is not None else 0,
        "rr_ppm": 1_000_000 // first if first else 0,
    }


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        items = json.loads(state.get[0])
        seq = int(state.get[1])
    else:
        items, seq = {}, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    for et, rnk in zip(rows["event_type"], rows["rnk"]):
        rec = items.get(et, [0, None])
        rec[0] += 1
        if not pd.isna(rnk):
            rec[1] = int(rnk)  # frozen attribute: same value every row
        items[et] = rec
    seq += 1
    state.update((json.dumps(items, sort_keys=True), seq))
    m = _metrics(items)
    yield pd.DataFrame(
        [{"user_id": int(user_id), "emit_seq": seq, **m}]
    )


def streaming_rank_eval(events: DataFrame, topk: DataFrame) -> DataFrame:
    """Per-micro-batch exact ranking metrics over a stream of held-out
    interactions (user_id, event_type) against the FROZEN per-user
    ranking ``topk`` (user_id, event_type, rnk — the batch
    ``_split``'s train side). Emits one row per touched user per
    micro-batch; a user's max-``emit_seq`` row is the current truth."""
    joined = events.select(
        F.col("user_id").cast("long").alias("user_id"), "event_type"
    ).join(
        topk.select(
            F.col("user_id").cast("long").alias("user_id"),
            "event_type",
            F.col("rnk").cast("long").alias("rnk"),
        ),
        ["user_id", "event_type"],
        "left",
    )
    return joined.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=RANK_EVAL_OUTPUT_SCHEMA,
        stateStructType=RANK_EVAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
