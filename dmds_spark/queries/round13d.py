"""Round-13 queries, batch four: forecast-accuracy metrics (MASE and
sMAPE, the two scale-free companions to the snaive backtest's
MAE/WAPE), funnel time-to-convert (the latency distribution behind a
conversion report), and recommender catalog coverage (the exposure
side of the round-13 ranking-eval family). All exact-ppm integer
arithmetic against the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.round13 import _SPLIT_CTE as _RANK_SPLIT_CTE
from dmds_spark.queries.round13 import _split as _rank_split

_SNAIVE_LAG = 7

# dense per-type day grid + snaive forecast — the same CTE scaffold as
# timeseries_backtest_snaive (round10e), extended with the naive-1
# in-sample denominator MASE needs
_GRID_CTE = f"""
    WITH bounds AS (
      SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0,
             CAST(MAX(CAST(ts AS DATE)) AS DATE) AS d1
      FROM events
    ), grid AS (
      SELECT e.event_type, CAST(g.d AS DATE) AS day FROM
        (SELECT DISTINCT event_type FROM events) e
        CROSS JOIN (SELECT UNNEST(generate_series(
          (SELECT d0 FROM bounds), (SELECT d1 FROM bounds),
          INTERVAL 1 DAY)) AS d) g
    ), daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), filled AS (
      SELECT g.event_type, g.day, COALESCE(d.n, 0) AS n
      FROM grid g LEFT JOIN daily d
        ON g.event_type = d.event_type AND g.day = d.day
    ), scored AS (
      SELECT event_type, day, n,
             LAG(n, {_SNAIVE_LAG}) OVER (PARTITION BY event_type
                                         ORDER BY day) AS fc,
             LAG(n, 1) OVER (PARTITION BY event_type
                             ORDER BY day) AS prev1
      FROM filled
    )
"""


@register(
    "forecast_eval_mase_smape",
    _GRID_CTE + """
    , g AS (
      SELECT event_type,
             COUNT(fc) AS n_scored,
             SUM(CASE WHEN fc IS NOT NULL THEN abs(n - fc) END) AS err_sum,
             SUM(CASE WHEN fc IS NOT NULL AND prev1 IS NOT NULL
                 THEN abs(n - prev1) END) AS naive_sum,
             SUM(CASE WHEN fc IS NOT NULL AND prev1 IS NOT NULL
                 THEN 1 ELSE 0 END) AS naive_n,
             SUM(CASE WHEN fc IS NOT NULL THEN
                 CASE WHEN n + fc > 0
                      THEN 2000000 * abs(n - fc) // (n + fc)
                      ELSE 0 END END) AS smape_sum
      FROM scored GROUP BY event_type
    )
    SELECT event_type, CAST(n_scored AS BIGINT) AS n_scored,
           CAST(CASE WHEN naive_sum > 0
                THEN (err_sum * 1000000 * naive_n)
                     // (naive_sum * n_scored) END AS BIGINT) AS mase_ppm,
           CAST(smape_sum // n_scored AS BIGINT) AS smape_ppm
    FROM g ORDER BY event_type
    """,
)
def forecast_eval_mase_smape(spark, sf_dir):
    """MASE and sMAPE for the seasonal-naive forecast per event type —
    the two SCALE-FREE accuracy metrics (MAE/WAPE live in
    timeseries_backtest_snaive): MASE divides the forecast MAE by the
    in-sample naive-1 MAE (values > 1e6 ppm mean "worse than
    persistence"), sMAPE is the mean of the per-point symmetric ratio
    2|e| / (n + fc). Both exact: cross-multiplied integer floor
    divisions (counts are non-negative so |n|+|fc| = n+fc; a point
    with n = fc = 0 contributes 0 by the standard convention).

    Shape at scale: identical to the backtest — one daily aggregate of
    the stream, a types x days grid, ONE type-partitioned window
    providing both lags, a |types|-row rollup."""
    from dmds_spark.sources.registry import load_events

    e = load_events(spark, sf_dir)
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = W.partitionBy("event_type").orderBy("day")
    scored = filled.select(
        "event_type",
        "n",
        F.lag("n", _SNAIVE_LAG).over(w).alias("fc"),
        F.lag("n", 1).over(w).alias("prev1"),
    )
    g = scored.groupBy("event_type").agg(
        F.count("fc").alias("n_scored"),
        F.sum(
            F.when(F.col("fc").isNotNull(), F.abs(F.col("n") - F.col("fc")))
        ).alias("err_sum"),
        F.sum(
            F.when(
                F.col("fc").isNotNull() & F.col("prev1").isNotNull(),
                F.abs(F.col("n") - F.col("prev1")),
            )
        ).alias("naive_sum"),
        F.sum(
            (F.col("fc").isNotNull() & F.col("prev1").isNotNull())
            .cast("long")
        ).alias("naive_n"),
        F.sum(
            F.when(
                F.col("fc").isNotNull(),
                F.when(
                    F.col("n") + F.col("fc") > 0,
                    F.expr("2000000 * abs(n - fc) div (n + fc)"),
                ).otherwise(F.lit(0)),
            )
        ).alias("smape_sum"),
    )
    return g.select(
        "event_type",
        F.col("n_scored").cast("bigint").alias("n_scored"),
        F.expr(
            "CASE WHEN naive_sum > 0 THEN (err_sum * 1000000 * naive_n)"
            " div (naive_sum * n_scored) END"
        ).cast("bigint").alias("mase_ppm"),
        F.expr("smape_sum div n_scored").cast("bigint").alias("smape_ppm"),
    ).orderBy("event_type")


@register(
    "events_time_to_convert",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id,
             MIN(epoch_us(e.ts) - epoch_us(v.first_view)) AS gap_us
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY e.user_id
    ), hist AS (
      SELECT gap_us // 1000000 AS gap_s, COUNT(*) AS cnt FROM p GROUP BY 1
    ), cum AS (
      SELECT gap_s, cnt,
             SUM(cnt) OVER (ORDER BY gap_s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_n,
             SUM(cnt) OVER () AS c
      FROM hist
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST(COALESCE(MAX(c), 0) AS BIGINT) AS n_converted,
           CAST(MIN(CASE WHEN cum_n >= (c + 1) // 2 THEN gap_s END)
                AS BIGINT) AS median_gap_s,
           CAST(MIN(CASE WHEN cum_n >= (c * 9 + 9) // 10 THEN gap_s END)
                AS BIGINT) AS p90_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM cum
    """,
)
def events_time_to_convert(spark, sf_dir):
    """Funnel latency: per user, the gap from FIRST view to the first
    purchase at-or-after it; reported as the conversion count plus the
    lower-median, p90, and max gap in WHOLE SECONDS — exact rank
    statistics read off a cumulative histogram over the distinct-
    seconds grid, so the one unpartitioned window runs over at most
    attribution-horizon-seconds rows (a 30-day horizon is <= 2.6e6
    grid rows at ANY corpus size — the same bounded-grid argument as
    the eval_* ppm score grids), never over the converted-user
    population itself."""
    from dmds_spark.sources.registry import load_events

    e = load_events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.col("first_view"))
            ).alias("gap_us")
        )
    )
    hist = p.groupBy(
        F.expr("gap_us div 1000000").alias("gap_s")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.select(
        "gap_s",
        F.sum("cnt").over(
            W.orderBy("gap_s").rowsBetween(W.unboundedPreceding, 0)
        ).alias("cum_n"),
        F.sum("cnt").over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("c"),
    )
    n_viewed = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    # aggregate cum BEFORE attaching n_viewed: with ZERO conversions
    # cum is empty, and an agg over (empty cross join n_viewed) would
    # null out n_viewed too — the oracle's scalar subquery still counts
    # viewers (caught by the round-13 review on a views-only dataset)
    stats = cum.agg(
        F.coalesce(F.max("c"), F.lit(0)).cast("bigint")
        .alias("n_converted"),
        F.min(
            F.when(F.col("cum_n") >= F.expr("(c + 1) div 2"),
                   F.col("gap_s"))
        ).cast("bigint").alias("median_gap_s"),
        F.min(
            F.when(F.col("cum_n") >= F.expr("(c * 9 + 9) div 10"),
                   F.col("gap_s"))
        ).cast("bigint").alias("p90_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
    )
    return n_viewed.crossJoin(stats).select(
        F.col("n_viewed").cast("bigint").alias("n_viewed"),
        "n_converted",
        "median_gap_s",
        "p90_gap_s",
        "max_gap_s",
    )


@register(
    "rank_eval_catalog_coverage",
    # the SAME split/ranking CTE as the whole ranking family — one
    # definition (round13._SPLIT_CTE), so a cutoff or tie-break change
    # can never silently diverge the coverage view from the metrics
    _RANK_SPLIT_CTE + """
    , cnts AS (
      SELECT event_type, COUNT(*) AS n_users_top3
      FROM topk WHERE rnk <= 3 GROUP BY event_type
    ), items AS (SELECT DISTINCT event_type FROM events
    ), exposure AS (
      SELECT i.event_type, COALESCE(c.n_users_top3, 0) AS n_users_top3
      FROM items i LEFT JOIN cnts c ON c.event_type = i.event_type
    ), tot AS (SELECT SUM(n_users_top3) AS slots FROM exposure)
    SELECT e.event_type,
           CAST(e.n_users_top3 AS BIGINT) AS n_users_top3,
           CAST(CASE WHEN t.slots > 0
                THEN e.n_users_top3 * 1000000 // t.slots
                ELSE 0 END AS BIGINT) AS exposure_ppm
    FROM exposure e, tot t ORDER BY e.event_type
    """,
)
def rank_eval_catalog_coverage(spark, sf_dir):
    """Exposure/coverage report for the round-13 ranking family: for
    every catalog item, how many users carry it in their top-3 and its
    share of all top-3 slots (ppm) — items with n_users_top3 = 0 are
    the catalog the recommender never shows anyone (the coverage gap
    popularity rankings are notorious for). The per-user ranking is
    the ranking family's SHARED split (round13._split — one cutoff,
    one tie-break, defined once); the top-3 rows then COLLAPSE to an
    |items|-row count table BEFORE touching the catalog (aggregate-
    then-join — joining the catalog onto per-user rows first would
    shuffle user-volume data to count it); the slot total broadcasts."""
    from dmds_spark.sources.registry import load_events

    e = load_events(spark, sf_dir)
    topk, _ = _rank_split(spark, sf_dir)
    cnts = (
        topk.filter(F.col("rnk") <= 3)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users_top3"))
    )
    items = e.select("event_type").distinct()
    exposure = items.join(F.broadcast(cnts), "event_type", "left").select(
        "event_type",
        F.coalesce("n_users_top3", F.lit(0)).alias("n_users_top3"),
    )
    tot = exposure.agg(F.sum("n_users_top3").alias("slots"))
    return (
        exposure.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("n_users_top3").cast("bigint").alias("n_users_top3"),
            F.expr(
                "CASE WHEN slots > 0"
                " THEN n_users_top3 * 1000000 div slots ELSE 0 END"
            ).cast("bigint").alias("exposure_ppm"),
        )
        .orderBy("event_type")
    )
