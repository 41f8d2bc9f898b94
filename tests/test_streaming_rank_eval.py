"""Online ranking evaluation (streaming/rank_eval.py): the per-user
metrics emitted over arriving held-out interactions must equal the
batch rank_eval_* queries' exact-ppm arithmetic on the same slice —
unit-level state folding, cross-batch accumulation, and a real-stream
equivalence run against the frozen pre-cutoff ranking."""

from __future__ import annotations

import pandas as pd
import pytest

from dmds_spark.queries.round13 import CUTOFF, K, NDCG_W
from dmds_spark.streaming.rank_eval import _metrics, _update

SF = "/root/testdata/sf0.001"


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _batch(rows):
    return pd.DataFrame(rows, columns=["event_type", "rnk"])


def test_metrics_match_hand_computation():
    """Micro-fixture computed by hand: items a (rel 2, rank 1),
    b (rel 1, rank 3), c (rel 3, unranked)."""
    items = {"a": [2, 1], "b": [1, 3], "c": [3, None]}
    m = _metrics(items)
    assert m["dcg"] == 2 * NDCG_W[1] + 1 * NDCG_W[3]
    # ideal: c(3), a(2), b(1) -> ranks 1..3
    idcg = 3 * NDCG_W[1] + 2 * NDCG_W[2] + 1 * NDCG_W[3]
    assert m["idcg"] == idcg
    assert m["ndcg_ppm"] == (m["dcg"] * 1_000_000) // idcg
    assert m["first_rnk"] == 1 and m["rr_ppm"] == 1_000_000
    assert m["n_items"] == 3


def test_update_accumulates_across_batches():
    st = _FakeState()
    out1 = pd.concat(
        _update((7,), iter([_batch([("a", 1.0), ("a", 1.0)])]), st),
        ignore_index=True,
    )
    assert out1.iloc[0]["emit_seq"] == 1
    assert out1.iloc[0]["dcg"] == 2 * NDCG_W[1]
    out2 = pd.concat(
        _update((7,), iter([_batch([("b", None), ("a", 1.0)])]), st),
        ignore_index=True,
    )
    r = out2.iloc[0]
    assert r["emit_seq"] == 2 and r["n_items"] == 2
    # a: rel 3 rank 1; b: rel 1 unranked -> ideal a(3),b(1)
    assert r["dcg"] == 3 * NDCG_W[1]
    assert r["idcg"] == 3 * NDCG_W[1] + 1 * NDCG_W[2]
    assert r["rr_ppm"] == 1_000_000


def _batch_reference(spark):
    """Per-user reference values straight from the batch split —
    the SQL queries' arithmetic replicated item for item."""
    from dmds_spark.queries.round13 import _split

    topk, test = _split(spark, SF)
    rnk = {
        (r["user_id"], r["event_type"]): r["rnk"] for r in topk.collect()
    }
    items: dict[int, dict[str, list]] = {}
    for r in test.collect():
        items.setdefault(r["user_id"], {})[r["event_type"]] = [
            r["rel"],
            rnk.get((r["user_id"], r["event_type"])),
        ]
    return {u: _metrics(iv) for u, iv in items.items()}


@pytest.mark.slow
def test_stream_matches_batch_queries(spark, tmp_path):
    """Post-cutoff events arrive in TWO micro-batches (one file per
    trigger); each user's last emission must equal the batch split's
    per-user values, and the rollups must equal the registered
    rank_eval_ndcg / rank_eval_mrr_hit aggregates."""
    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries
    from dmds_spark.queries.round13 import _split
    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.rank_eval import streaming_rank_eval

    ev = load_events(spark, SF)
    held = ev.filter(
        F.col("ts") >= F.lit(CUTOFF).cast("timestamp")
    ).select("user_id", "event_type", "event_id")
    src = str(tmp_path / "ev_src")
    held.filter(F.col("event_id") % 2 == 0).drop("event_id") \
        .coalesce(1).write.parquet(src)
    held.filter(F.col("event_id") % 2 == 1).drop("event_id") \
        .coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    topk, _test = _split(spark, SF)
    q = (
        streaming_rank_eval(stream, topk)
        .writeStream.format("memory")
        .queryName("rank_eval_live")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("rank_eval_live").collect()
    assert max(r["emit_seq"] for r in rows) >= 2  # really multi-batch
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["emit_seq"] > last[r["user_id"]]["emit_seq"]:
            last[r["user_id"]] = r
    want = _batch_reference(spark)
    assert set(last) == set(want)
    for u, m in want.items():
        got = last[u]
        for f in ("n_items", "dcg", "idcg", "ndcg_ppm", "first_rnk",
                  "rr_ppm"):
            assert got[f] == m[f], (u, f, got[f], m[f])

    # rollups == the registered aggregates (ndcg mean excludes no one
    # here: every held-out user has idcg > 0 by construction)
    qs = all_queries()
    nd = qs["rank_eval_ndcg"](spark, SF).collect()[0]
    users = sorted(want)
    assert nd["n_users"] == len(users)
    assert nd["mean_ndcg_ppm"] == (
        sum(want[u]["ndcg_ppm"] for u in users) // len(users)
    )
    mh = qs["rank_eval_mrr_hit"](spark, SF).collect()[0]
    assert mh["n_users"] == len(users)
    assert mh["mrr_ppm"] == (
        sum(want[u]["rr_ppm"] for u in users) // len(users)
    )
    assert mh["hit1_ppm"] == (
        sum(1 for u in users if want[u]["first_rnk"] == 1)
        * 1_000_000 // len(users)
    )
    assert mh["hit3_ppm"] == (
        sum(1 for u in users if 1 <= want[u]["first_rnk"] <= 3)
        * 1_000_000 // len(users)
    )
