"""Sketch calibration rows: CMS must be overcount-only even in a
collision-heavy regime (tiny width), and the registered calibration
queries must produce sane, deterministic-shaped reports."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cms_overcount_only_under_collisions(spark):
    """An eps=0.5 sketch is 6 counters wide — 40 distinct keys MUST
    collide, and every estimate must still be >= the true count (CMS
    adds on collision, never subtracts)."""
    df = spark.createDataFrame(
        [(f"k{i % 40}",) for i in range(4000)], ["k"]
    )
    cms = df._jdf.stat().countMinSketch("k", 0.5, 0.9, 7)
    exact = {
        r["k"]: r["c"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    overshoot = 0
    for k, c in exact.items():
        est = int(cms.estimateCount(k))
        assert est >= c, k
        overshoot += est - c
    assert overshoot > 0  # the regime genuinely collided


def test_cms_calibration_query_shape(spark):
    from dmds_spark.queries import all_queries

    rows = all_queries()["agg_cms_calibration"](spark, SF).collect()
    assert len(rows) == 5
    assert all(r["over_ok"] == 1 for r in rows)
    assert all(r["cms_estimate"] >= r["exact_cnt"] for r in rows)


def test_hll_calibration_query_shape(spark):
    from dmds_spark.queries import all_queries

    rows = all_queries()["agg_hll_calibration"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # ~1.6% standard error sketch: allow 10% on this tiny corpus
        assert abs(r["error_ppm"]) < 100_000, r
