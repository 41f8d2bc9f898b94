"""Edge-case pins for the round-5 robust-stats/product-analytics batch:
definitions that must hold on ANY input, checked on small synthetic
frames where the expected value is computable by hand (the oracle gate
covers the driver tables; these cover the corners the tables may not
hit)."""

import math

from pyspark.sql import functions as F


def _wmedian_rows(spark, rows):
    """Run the weighted-median core (value-grouped cumulative weight,
    2*cum_inclusive >= total) on (flag, pc, w) tuples."""
    from dmds_spark.operators.relational import sharded_exclusive_cumsum

    df = spark.createDataFrame(rows, "flag string, pc long, w long")
    g = df.groupBy("flag", "pc").agg(F.sum("w").alias("w"))
    c = sharded_exclusive_cumsum(
        g, by="flag", order_cols=["pc"], value_col="w", out="cb"
    )
    tw = g.groupBy("flag").agg(F.sum("w").alias("tw"))
    j = c.join(F.broadcast(tw), "flag").filter(
        2 * (F.col("cb") + F.col("w")) >= F.col("tw")
    )
    return {
        r["flag"]: r["m"]
        for r in j.groupBy("flag").agg(F.min("pc").alias("m")).collect()
    }


def test_weighted_median_odd_total(spark):
    # weights 1,1,1 -> plain lower median
    m = _wmedian_rows(spark, [("a", 10, 1), ("a", 20, 1), ("a", 30, 1)])
    assert m["a"] == 20


def test_weighted_median_weight_dominates(spark):
    # one heavy value owns more than half the total weight
    m = _wmedian_rows(spark, [("a", 10, 1), ("a", 20, 10), ("a", 30, 1)])
    assert m["a"] == 20


def test_weighted_median_exact_half_boundary(spark):
    # total=4, cumulative at pc=10 is exactly half (2*2 >= 4): the
    # LOWER weighted median takes the boundary value
    m = _wmedian_rows(spark, [("a", 10, 2), ("a", 20, 1), ("a", 30, 1)])
    assert m["a"] == 10


def test_weighted_median_duplicate_value_rows_merge(spark):
    # the same value split across rows must behave as one merged weight
    m1 = _wmedian_rows(spark, [("a", 10, 1), ("a", 10, 1), ("a", 20, 1)])
    m2 = _wmedian_rows(spark, [("a", 10, 2), ("a", 20, 1)])
    assert m1["a"] == m2["a"] == 10


def test_integer_sqrt_correction_exact_everywhere(spark):
    """The +-1 correction must yield floor(sqrt(x)) EXACTLY, including
    at perfect squares and just below them, where floor of the rounded
    double sqrt can land off by one."""
    vals = []
    for k in (1, 2, 3, 10, 994, 10**6, 10**9):
        sq = k * k
        vals.extend([sq - 1, sq, sq + 1])
    vals = [v for v in vals if v >= 0]
    df = spark.createDataFrame([(v,) for v in vals], "toks long")
    s0 = F.floor(F.sqrt(F.col("toks").cast("double"))).cast("long")
    adj = df.withColumn("s0", s0).withColumn(
        "isq",
        F.col("s0")
        - F.when(F.col("s0") * F.col("s0") > F.col("toks"), 1).otherwise(0)
        + F.when(
            (F.col("s0") + 1) * (F.col("s0") + 1) <= F.col("toks"), 1
        ).otherwise(0),
    )
    for r in adj.collect():
        assert r["isq"] == math.isqrt(r["toks"]), r["toks"]


def test_ks_drift_identical_source_scores_zero(spark, tmp_path):
    """A source whose length distribution mirrors the corpus must get
    ks_num proportional to zero when it IS the corpus (single source:
    cs*N == gc*ns identically)."""
    from dmds_spark.queries import all_queries

    rows = [(i, "x" * (5 + i % 3), "en", "only", 5 + i % 3)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/documents.parquet")
    out = all_queries()["profile_ks_drift"](spark, d).collect()
    assert len(out) == 1
    # ks_num is a digit string (can exceed bigint at scale — the
    # decimal(38,0) widening from the round-6 overflow fix)
    assert out[0]["ks_num"] == "0"
    assert out[0]["ks_stat"] == 0.0


def test_mad_zero_flags_every_deviating_day(spark):
    """Degenerate MAD=0 (majority of days exactly at the median) must
    flag precisely the days that deviate at all."""
    from datetime import datetime

    from dmds_spark.queries import all_queries

    # build a tiny events parquet: 5 days at cnt=2, one day at cnt=5
    rows = []
    eid = 0
    for day in range(1, 7):
        n = 2 if day <= 5 else 5
        for i in range(n):
            rows.append(
                (eid, datetime(2024, 1, day, 12, i), 1, "click", 1.0,
                 "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = all_queries()["events_daily_anomalies_mad"](
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["median_cnt"] == 2
    assert r["mad_cnt"] == 0
    assert r["n_flagged"] == 1  # only the cnt=5 day deviates


def _model_weighted_median(pairs):
    """Reference model: smallest value whose inclusive cumulative
    weight doubles to at least the total."""
    agg = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    total = sum(agg.values())
    cum = 0
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= total:
            return v
    raise AssertionError("unreachable for non-empty input")


def test_weighted_median_matches_model_random(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    PAIRS = st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),   # value
            st.integers(min_value=1, max_value=9),      # weight
        ),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(pairs=PAIRS)
    def check(pairs):
        got = _wmedian_rows(
            spark, [("g", v, w) for v, w in pairs]
        )["g"]
        assert got == _model_weighted_median(pairs)

    check()


def test_weighted_median_sharded_equals_fast_path(spark):
    """Forcing the two-level sharded cumsum must not change the
    median (the shape the plan pin requires at size)."""
    from pyspark.sql import functions as FF

    from dmds_spark.operators.relational import sharded_exclusive_cumsum

    pairs = [("g", v % 37 - 18, (v * 7) % 5 + 1) for v in range(200)]
    df = spark.createDataFrame(pairs, "flag string, pc long, w long")
    g = df.groupBy("flag", "pc").agg(FF.sum("w").alias("w"))

    def median_with(num_ranges):
        c = sharded_exclusive_cumsum(
            g, by="flag", order_cols=["pc"], value_col="w", out="cb",
            num_ranges=num_ranges,
        )
        tw = g.groupBy("flag").agg(FF.sum("w").alias("tw"))
        j = c.join(FF.broadcast(tw), "flag").filter(
            2 * (FF.col("cb") + FF.col("w")) >= FF.col("tw")
        )
        return {
            r["flag"]: r["m"]
            for r in j.groupBy("flag").agg(FF.min("pc").alias("m")).collect()
        }

    assert median_with(None) == median_with(8)


def test_ewma_pow2_matches_python_model(spark):
    """window_ewma_pow2 against an independent Python model: for each
    customer's date-ordered order history, num = 8c0+4c1+2c2+c3 over
    the available lags, den = matching weight sum — exact integers,
    ewma = num/den as one IEEE division."""
    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint").alias("c"),
    ).collect()
    hist = {}
    for r in sorted(o, key=lambda r: (r["o_custkey"], r["o_orderdate"],
                                      r["o_orderkey"])):
        hist.setdefault(r["o_custkey"], []).append((r["o_orderkey"], r["c"]))
    want = {}
    for cust, seq in hist.items():
        for i, (ok, _) in enumerate(seq):
            num = den = 0
            for lag, wgt in enumerate((8, 4, 2, 1)):
                if i - lag >= 0:
                    num += wgt * seq[i - lag][1]
                    den += wgt
            want[(cust, ok)] = (num, den, num / den)
    got = {
        (r["o_custkey"], r["o_orderkey"]):
            (r["ewma_num"], r["ewma_den"], r["ewma_cents"])
        for r in all_queries()["window_ewma_pow2"](spark, sf).collect()
    }
    assert got == want
