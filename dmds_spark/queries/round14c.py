"""Round-14 queries, batch three: Theil–Sen robust trend estimation
and CUSUM change-point detection — robust statistics over calendar-
bounded grids, exact-integer per the oracle-parity rules (shifted floor
divisions for the slope, cross-multiplied CUSUM so no division exists
at all)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (median pairwise slope, exact integers)
# ---------------------------------------------------------------------------

# shift that makes every pairwise numerator non-negative BEFORE the
# floor division, so Spark's truncating `div` and DuckDB's flooring
# `//` agree (the kmeans/PQ positive-operand rule): S must exceed the
# max |slope| in cents/day; daily revenue is < 2^40 cents at any SF
# this repo benches, and the product S * max_day_gap * 2 stays far
# under 2^63.
_TS_SHIFT = 2**40


@register(
    "orders_theilsen_trend",
    f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS d,
             CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0)))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), slopes AS (
      SELECT (b.rev - a.rev + {_TS_SHIFT} * (b.d - a.d)) // (b.d - a.d)
             - {_TS_SHIFT} AS s
      FROM daily a JOIN daily b ON b.d > a.d
    ), hist AS (
      SELECT s, COUNT(*) AS n FROM slopes GROUP BY s
    ), tot AS (SELECT COUNT(*) AS n_pairs FROM slopes),
    nd AS (SELECT COUNT(*) AS n_days FROM daily),
    cum AS (SELECT s, SUM(n) OVER (ORDER BY s) AS cum_n FROM hist)
    SELECT CAST(d.n_days AS BIGINT) AS n_days,
           CAST(t.n_pairs AS BIGINT) AS n_pairs,
           CAST(MIN(c.s) AS BIGINT) AS slope_cents_per_day
    FROM cum c, tot t, nd d
    WHERE c.cum_n >= (t.n_pairs + 1) // 2
    GROUP BY t.n_pairs, d.n_days
    """,
)
def orders_theilsen_trend(spark, sf_dir):
    """Theil–Sen estimator of the daily-revenue trend: the LOWER MEDIAN
    of all pairwise slopes (rev_j - rev_i)/(d_j - d_i) over the daily
    revenue grid — the robust regression line that shrugs off the
    outlier days OLS would chase (Sen 1968; 29% breakdown point).
    Exact: revenue is decimal-summed cents; each slope floor-divides
    AFTER the +2^40*(gap) shift so both engines' integer division
    semantics coincide on negative numerators; the median is an order
    statistic read off a cumulative histogram, never a sort of the
    pair set.

    Shape at scale: the pair set is |days| choose 2 — a CALENDAR-
    bounded self-join (a century is < 700k pairs), not a corpus join;
    the only corpus-sized work is the one daily aggregate. The slope
    histogram's cum window is over the distinct-slope grid (bounded by
    the pair count)."""
    from dmds_spark.core.engine import materialize

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # daily (calendar-bounded) has three consumers (both pair sides +
    # n_days): ONE corpus aggregate behind the barrier
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .alias("d")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("bigint")
        .alias("rev")
    ).transform(materialize)
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    slopes = a.join(b, F.col("db") > F.col("da")).select(
        F.expr(
            f"(rb - ra + {_TS_SHIFT} * (db - da)) div (db - da)"
            f" - {_TS_SHIFT}"
        ).alias("s")
    )
    # the histogram (bounded by the pair count) has two consumers
    # (n_pairs + the cum window): barrier so the pair join runs once
    hist = slopes.groupBy("s").agg(
        F.count(F.lit(1)).alias("n")
    ).transform(materialize)
    tot = hist.agg(F.sum("n").alias("n_pairs"))
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    cum = hist.withColumn("cum_n", F.sum("n").over(W.orderBy("s")))
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum_n") >= F.expr("(n_pairs + 1) div 2"))
        .groupBy("n_pairs")
        .agg(F.min("s").alias("slope_cents_per_day"))
        .crossJoin(F.broadcast(n_days))
        .select(
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("slope_cents_per_day").cast("bigint")
            .alias("slope_cents_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point (division-free, exact)
# ---------------------------------------------------------------------------


@register(
    "events_cusum_changepoint",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             COUNT(*) AS c
      FROM events GROUP BY 1
    ), tot AS (
      SELECT COUNT(*) AS n_days, SUM(c) AS total FROM daily
    ), cum AS (
      SELECT d,
             ROW_NUMBER() OVER (ORDER BY d) AS t,
             SUM(c) OVER (ORDER BY d) AS cum_c
      FROM daily
    ), stat AS (
      SELECT c.d, abs(t.n_days * c.cum_c - c.t * t.total) AS g
      FROM cum c, tot t
    )
    SELECT CAST(t.n_days AS BIGINT) AS n_days,
           CAST(t.total AS BIGINT) AS total_events,
           CAST(max_by(s.d, lpad(CAST(s.g AS VARCHAR), 24, '0')
                || lpad(CAST(10000000000 - s.d AS VARCHAR), 12, '0'))
                AS BIGINT) AS changepoint_day,
           CAST(MAX(s.g) AS BIGINT) AS max_cusum_stat
    FROM stat s, tot t
    GROUP BY t.n_days, t.total
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point over the daily event-count series: the day
    maximizing |S_t - (t/n) * S_n| — the classic at-most-one-change
    location statistic (Page 1954; Hinkley 1970) — computed DIVISION-
    FREE by cross-multiplication (|n * cum_t - t * total| is the same
    argmax scaled by n), so every value is an exact integer and the
    earliest day wins ties via the inverted-day padded key.

    Shape at scale: one corpus aggregate to the day grid; everything
    after (row numbers, running sum, the argmax) lives on the
    calendar-bounded grid. The cum window is over that bounded grid."""
    from dmds_spark.sources.registry import load_events

    from dmds_spark.core.engine import materialize

    ev = load_events(spark, sf_dir)
    # two consumers (totals + the cum window) of the calendar-bounded
    # day grid: ONE corpus aggregate behind the barrier
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).alias("c")).transform(materialize)
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("total")
    )
    w = W.orderBy("d")
    cum = daily.select(
        "d",
        F.row_number().over(w).alias("t"),
        F.sum("c").over(w).alias("cum_c"),
    )
    stat = cum.crossJoin(F.broadcast(tot)).select(
        "d",
        "n_days",
        "total",
        F.abs(
            F.col("n_days") * F.col("cum_c") - F.col("t") * F.col("total")
        ).alias("g"),
    )
    key = F.concat(
        F.lpad(F.col("g").cast("string"), 24, "0"),
        F.lpad((F.lit(10_000_000_000) - F.col("d")).cast("string"), 12, "0"),
    )
    return stat.groupBy("n_days", "total").agg(
        F.max_by("d", key).cast("bigint").alias("changepoint_day"),
        F.max("g").cast("bigint").alias("max_cusum_stat"),
    ).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("total").cast("bigint").alias("total_events"),
        "changepoint_day",
        "max_cusum_stat",
    )


# ---------------------------------------------------------------------------
# Kendall tau-a (trend significance companion to Theil-Sen)
# ---------------------------------------------------------------------------


@register(
    "orders_kendall_tau",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS d,
             CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0)))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), pairs AS (
      SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_conc,
             CAST(SUM(CASE WHEN b.rev < a.rev THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_disc,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM daily a JOIN daily b ON b.d > a.d
    ), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT d.n_days, p.n_pairs, p.n_conc, p.n_disc,
           CAST((p.n_conc - p.n_disc + p.n_pairs) * 1000000 // p.n_pairs
                - 1000000 AS BIGINT) AS tau_a_ppm
    FROM pairs p, nd d
    """,
)
def orders_kendall_tau(spark, sf_dir):
    """Kendall tau-a over the daily-revenue series: concordant minus
    discordant day pairs over all pairs — the nonparametric trend-
    significance statistic that pairs with orders_theilsen_trend (the
    Mann-Kendall test's core). Exact ppm via the +n_pairs shift before
    the floor division (tau is signed; the shift keeps the numerator
    non-negative so both engines' integer division agrees — the
    Theil-Sen rule). Revenue ties count as neither (tau-a).

    Shape at scale: the same calendar-bounded day-grid self-join as
    Theil-Sen (one corpus aggregate, then < 700k pairs for a century);
    the statistic is a 1-row rollup — no window at all."""
    from dmds_spark.core.engine import materialize

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # three consumers (both pair sides + n_days): one corpus aggregate
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .alias("d")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("bigint")
        .alias("rev")
    ).transform(materialize)
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("db") > F.col("da")).agg(
        F.sum(F.when(F.col("rb") > F.col("ra"), 1).otherwise(0))
        .cast("bigint").alias("n_conc"),
        F.sum(F.when(F.col("rb") < F.col("ra"), 1).otherwise(0))
        .cast("bigint").alias("n_disc"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return pairs.crossJoin(F.broadcast(nd)).select(
        "n_days",
        "n_pairs",
        "n_conc",
        "n_disc",
        F.expr(
            "(n_conc - n_disc + n_pairs) * 1000000 div n_pairs - 1000000"
        ).cast("bigint").alias("tau_a_ppm"),
    )
