"""Pins for the scale-safety helpers (core/engine.py): the conditional
broadcast gate and the switchable materialization barrier.

These exist because both helpers MUST be behavior-preserving at test
scale (every oracle hash stays green) while changing what happens at
100 TB — so the tests pin the small-scale behavior (hint present,
hashes equal across barrier modes) AND the big-scale behavior (hint
absent above the gate)."""

import pytest
from pyspark.sql import functions as F

from dmds_spark.core.engine import (
    estimated_size_bytes,
    materialize,
    maybe_broadcast,
)
from dmds_spark.plans import broadcast_join_count

SF = "/root/testdata/sf0.001"


def _cust(spark):
    return spark.read.parquet(f"{SF}/customer.parquet")


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_estimated_size_is_plan_time(spark):
    """Size estimate must come from statistics, not a job."""
    n = estimated_size_bytes(_cust(spark))
    assert n > 0


def test_gate_passes_small_dim(spark):
    """Below the gate the hint attaches: with the session auto-broadcast
    thresholds disabled, the hint is the ONLY thing that can produce a
    broadcast join — so seeing one proves the hint fired."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        cust = maybe_broadcast(_cust(spark))  # sf0.001: ~150 rows
        df = _orders(spark).join(cust, F.col("o_custkey") == F.col("c_custkey"))
        assert broadcast_join_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_gate_refuses_big_dim(spark):
    """Above the gate maybe_broadcast is the IDENTITY (same object —
    no hint node in the plan), so the join strategy is AQE's call.
    max_bytes=0 simulates 'estimated size exceeds any gate', i.e. the
    10^9-row customer table at the 100 TB north star."""
    cust = _cust(spark)
    assert maybe_broadcast(cust, max_bytes=0) is cust
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = _orders(spark).join(
            maybe_broadcast(cust, max_bytes=0),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert broadcast_join_count(df) == 0  # shuffle-join fallback
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_gate_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_MAX_BYTES", "0")
    cust = _cust(spark)
    assert maybe_broadcast(cust) is cust
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_MAX_BYTES", str(1 << 40))
    assert maybe_broadcast(cust) is not cust


@pytest.mark.parametrize("mode", ["local", "reliable", "parquet"])
def test_materialize_modes_preserve_rows(spark, mode):
    df = _cust(spark).select("c_custkey", "c_name")
    out = materialize(df, mode=mode)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_dedup_pipeline_written_intermediate(spark, monkeypatch):
    """A full dedup pipeline run with parquet (written) intermediates
    must produce exactly the rows of the default local-checkpoint run —
    the barrier mode is a durability knob, never a semantics knob."""
    from dmds_spark.queries import all_queries

    q = all_queries()["dedup_minhash_pairs"]
    base = sorted(map(tuple, q(spark, SF).collect()))
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "parquet")
    written = sorted(map(tuple, q(spark, SF).collect()))
    assert base == written and len(base) > 0


def test_materialize_mode_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "bogus")
    from dmds_spark.core.engine import materialize_mode

    with pytest.raises(ValueError):
        materialize_mode()
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "parquet")
    assert materialize_mode() == "parquet"


def test_materialize_mode_spark_conf_fallback(spark, monkeypatch):
    """The documented spark.dmds.materialize conf works when the env
    var is absent; the env var wins when both are set."""
    from dmds_spark.core.engine import materialize_mode

    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    spark.conf.set("spark.dmds.materialize", "reliable")
    try:
        assert materialize_mode(spark) == "reliable"
        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "local")
        assert materialize_mode(spark) == "local"
    finally:
        spark.conf.unset("spark.dmds.materialize")
    assert materialize_mode(spark) == "local"


def test_parquet_materialize_outside_swept_scratch(spark, monkeypatch):
    """Parquet barriers are LAZY reads re-scanned by later actions, so
    the intermediate must NOT live under the stale-swept .scratch tree
    (a >1h pipeline would have its live files garbage-collected)."""
    import os

    df = _cust(spark).select("c_custkey").limit(5)
    out = materialize(df, mode="parquet")
    scan_path = out.inputFiles()[0]
    repo_scratch = os.path.realpath(os.path.join(os.getcwd(), ".scratch"))
    assert not os.path.realpath(
        scan_path.replace("file:", "")
    ).startswith(repo_scratch)
    assert out.count() == 5
