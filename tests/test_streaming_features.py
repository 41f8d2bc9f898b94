"""Online point-in-time feature serving (streaming/feature_serve.py):
the emitted features must equal the batch window query's strictly-prior
aggregates — unit-level state folding, cross-batch accumulation, and a
real-stream equivalence run against feature_point_in_time."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from dmds_spark.streaming.feature_serve import _update

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
    return pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "__cents"]
    )


def test_features_are_strictly_prior_within_batch():
    st = _FakeState()
    d = dt.datetime
    out = pd.concat(
        _update(
            (7,),
            iter([_batch([
                (2, d(2020, 2, 1), 500),
                (1, d(2020, 1, 1), 1000),   # out of order in the batch
                (3, d(2020, 3, 1), 200),
            ])]),
            st,
        ),
        ignore_index=True,
    )
    got = {
        r["o_orderkey"]: (r["prior_orders"], r["prior_revenue_c"])
        for _, r in out.iterrows()
    }
    # folded in (date, key) order regardless of batch row order
    assert got == {1: (0, 0), 2: (1, 1000), 3: (2, 1500)}
    assert st.get == (3, 1700)


def test_state_carries_across_batches():
    st = _FakeState()
    d = dt.datetime
    list(_update((7,), iter([_batch([(1, d(2020, 1, 1), 1000)])]), st))
    out = pd.concat(
        _update((7,), iter([_batch([(2, d(2020, 2, 1), 500)])]), st),
        ignore_index=True,
    )
    assert out.iloc[0]["prior_orders"] == 1
    assert out.iloc[0]["prior_revenue_c"] == 1000
    assert st.get == (2, 1500)


@pytest.mark.slow
def test_stream_matches_batch_window_query(spark, tmp_path):
    """All orders arrive as one availableNow stream; the emitted
    features must equal feature_point_in_time's window output on the
    same corpus (restricted to its 2001+ scoring slice)."""
    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries
    from dmds_spark.streaming.feature_serve import (
        streaming_point_in_time_features,
    )

    src = str(tmp_path / "orders_src")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    feats = streaming_point_in_time_features(stream)
    q = (
        feats.writeStream.format("memory")
        .queryName("pit_features")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["o_orderkey"]: (r["prior_orders"], r["prior_revenue_c"])
        for r in spark.table("pit_features").collect()
    }
    batch = all_queries()["feature_point_in_time"](spark, SF)
    want = {
        r["o_orderkey"]: (r["prior_orders"], r["prior_revenue_c"])
        for r in batch.collect()
    }
    assert want  # the slice is non-empty at this SF
    # the stream emits features for EVERY order; the batch query
    # reports the 2001+ scoring slice — compare on that slice
    assert {k: got[k] for k in want} == want
    assert len(got) == orders.count()
