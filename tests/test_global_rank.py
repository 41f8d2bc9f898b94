"""global_row_number / ntile_from_rn must equal the single-partition
window forms exactly, including ties-by-tiebreak and n < k buckets."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.operators.relational import global_row_number, ntile_from_rn


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
