"""global_row_number / ntile_from_rn must equal the single-partition
window forms exactly, including ties-by-tiebreak and n < k buckets."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.operators.relational import (
    global_row_number,
    ntile_from_rn,
    sharded_exclusive_cumsum,
)


def _df(spark, n=500):
    return spark.createDataFrame(
        [(i, float((i * 37) % 91)) for i in range(n)], ["id", "v"]
    )


def test_matches_global_window(spark):
    df = _df(spark)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, order, out="rn").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_ntile_matches_builtin(spark):
    for n, k in [(500, 4), (10, 3), (7, 7), (3, 5)]:
        df = _df(spark, n)
        order = [F.col("v").desc(), F.col("id")]
        ranked = global_row_number(df, order, out="rn")
        got = {
            r["id"]: r["q"]
            for r in ranked.select(
                "id", ntile_from_rn(F.col("rn"), n, k).cast("bigint").alias("q")
            ).collect()
        }
        want = {
            r["id"]: r["q"]
            for r in df.withColumn(
                "q", F.ntile(k).over(W.orderBy(*order)).cast("bigint")
            ).collect()
        }
        assert got == want, (n, k)


def test_no_single_partition_window_in_plan(spark):
    df = _df(spark)
    out = global_row_number(df, [F.col("v"), F.col("id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only window partitions by __pid — never an empty PARTITION BY
    assert "windowspecdefinition(__pid" in plan


def _skewed_groups(spark, n=600):
    # one giant group + a few small ones: the shape that serializes a
    # per-group window through a single task
    rows = [
        (i, "big" if i % 10 != 0 else f"s{i % 3}", (i * 7) % 13 + 1)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "g", "val"])


def test_sharded_cumsum_matches_group_window(spark):
    df = _skewed_groups(spark)
    for num_ranges in (1, 7, 64):
        got = {
            (r["g"], r["id"]): r["cb"]
            for r in sharded_exclusive_cumsum(
                df, "g", ["id"], "val", "cb", num_ranges=num_ranges
            ).collect()
        }
        w = (
            W.partitionBy("g")
            .orderBy("id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        want = {
            (r["g"], r["id"]): r["cb"]
            for r in df.withColumn(
                "cb", F.coalesce(F.sum("val").over(w), F.lit(0))
            ).collect()
        }
        assert got == want, num_ranges


def test_sharded_cumsum_no_per_group_data_window(spark):
    df = _skewed_groups(spark)
    out = sharded_exclusive_cumsum(df, "g", ["id"], "val", "cb")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-side window must partition on (g, __pid) — a window
    # partitioned by g alone (then ordered by id) is one task per group
    assert "windowspecdefinition(g#" in plan
    import re

    assert not re.search(r"windowspecdefinition\(g#\d+, id#", plan)


def test_sharded_running_max_matches_group_window(spark):
    """sharded_exclusive_running_max (forced two-level) must equal the
    plain PARTITION BY ... ORDER BY exclusive-max window, nulls
    included."""
    from pyspark.sql import Window as W

    from dmds_spark.operators.relational import sharded_exclusive_running_max
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, "/root/testdata/sf0.001").select(
        "event_type", "event_id", F.unix_micros("ts").alias("t")
    )
    got = sharded_exclusive_running_max(
        ev, "event_type", [F.col("event_id").asc()], "t", out="wm",
        num_ranges=8,
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    want = ev.withColumn("wm", F.max("t").over(w))
    key = ["event_type", "event_id"]
    assert (
        got.select(*key, "wm").exceptAll(want.select(*key, "wm")).count() == 0
    )
    assert (
        want.select(*key, "wm").exceptAll(got.select(*key, "wm")).count() == 0
    )


def test_sharded_running_max_no_per_group_data_window(spark):
    """Forced two-level running max must window on (by, __pid), never
    the bare low-cardinality group key over data rows."""
    import re

    from dmds_spark.operators.relational import sharded_exclusive_running_max
    from dmds_spark.plans import physical_plan
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, "/root/testdata/sf0.001").select(
        "event_type", "event_id", F.unix_micros("ts").alias("t")
    )
    df = sharded_exclusive_running_max(
        ev, "event_type", [F.col("event_id").asc()], "t", out="wm",
        num_ranges=8,
    )
    plan = physical_plan(df)
    assert re.search(r"windowspecdefinition\(event_type#\d+, __pid#", plan)
    assert not re.search(
        r"windowspecdefinition\(event_type#\d+, event_id#", plan
    )
    assert "BroadcastHashJoin" in plan
