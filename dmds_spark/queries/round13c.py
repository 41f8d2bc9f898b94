"""Round-13 queries, batch three: privacy-risk profiling beyond
k-anonymity (profile_k_anonymity) — the two standard refinements a
data-release review asks for next:

- l-diversity: a quasi-identifier group is safe only if its SENSITIVE
  attribute takes many distinct values (a k-large group that is 100%
  one diagnosis still leaks);
- t-closeness: distinct values are not enough if the group's sensitive
  DISTRIBUTION diverges from the global one — measured here as exact
  total-variation distance in ppm (the same cross-multiplied integer
  TV as text_source_tv_distance).

QI = (nation, market segment) over customers joined to their orders;
sensitive attribute = order priority. Everything is counts and floor
divisions — bit-exact against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.core.engine import maybe_broadcast
from dmds_spark.queries import register


def _joined_sql() -> str:
    return """
    WITH j AS (
      SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS mktsegment,
             o.o_orderpriority AS sensitive
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    """


def _joined(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return o.join(
        # customer is SF-proportional: broadcast only under the size
        # gate (billions of rows at 100 TB would OOM a forced build
        # side); above the gate AQE picks the strategy at runtime.
        maybe_broadcast(c.select("c_custkey", "c_nationkey", "c_mktsegment")),
        o["o_custkey"] == c["c_custkey"],
    ).select(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("o_orderpriority").alias("sensitive"),
    )


@register(
    "privacy_l_diversity",
    _joined_sql() + """
    SELECT CAST(nationkey AS BIGINT) AS nationkey, mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct,
           CAST(CASE WHEN COUNT(DISTINCT sensitive) < 3 THEN 1 ELSE 0 END
                AS BIGINT) AS below_l3
    FROM j GROUP BY nationkey, mktsegment
    ORDER BY nationkey, mktsegment
    """,
)
def privacy_l_diversity(spark, sf_dir):
    """Distinct-l-diversity report per quasi-identifier group: group
    size, number of distinct sensitive values, and an l<3 risk flag —
    the table a release reviewer reads top-down. One join (dimension
    side broadcast) + one hash aggregate; COUNT(DISTINCT) over a
    5-value domain is a cheap Expand, and the output is
    |nations x segments| rows."""
    return (
        _joined(spark, sf_dir)
        .groupBy("nationkey", "mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_n"),
            F.count_distinct("sensitive").cast("bigint")
            .alias("l_distinct"),
            (F.count_distinct("sensitive") < 3).cast("bigint")
            .alias("below_l3"),
        )
        .orderBy("nationkey", "mktsegment")
    )


@register(
    "privacy_t_closeness",
    _joined_sql() + """
    , gpop AS (
      SELECT sensitive, COUNT(*) AS cnt_v FROM j GROUP BY sensitive
    ), n AS (SELECT COUNT(*) AS n_all FROM j
    ), grp AS (
      SELECT nationkey, mktsegment, COUNT(*) AS n_g
      FROM j GROUP BY nationkey, mktsegment
    ), gv AS (
      SELECT nationkey, mktsegment, sensitive, COUNT(*) AS cnt_gv
      FROM j GROUP BY nationkey, mktsegment, sensitive
    ), grid AS (
      SELECT g.nationkey, g.mktsegment, g.n_g, v.sensitive, v.cnt_v,
             COALESCE(x.cnt_gv, 0) AS cnt_gv
      FROM grp g CROSS JOIN gpop v
      LEFT JOIN gv x ON x.nationkey = g.nationkey
                    AND x.mktsegment = g.mktsegment
                    AND x.sensitive = v.sensitive
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey, mktsegment,
           CAST(n_g AS BIGINT) AS group_n,
           CAST(SUM(ABS(CAST(cnt_gv AS HUGEINT) * n.n_all
                        - CAST(cnt_v AS HUGEINT) * n_g)) * 1000000
                // (2 * CAST(n_g AS HUGEINT) * n.n_all) AS BIGINT)
             AS tv_ppm
    FROM grid, n
    GROUP BY nationkey, mktsegment, n_g, n.n_all
    ORDER BY tv_ppm DESC, nationkey, mktsegment
    """,
)
def privacy_t_closeness(spark, sf_dir):
    """t-closeness per quasi-identifier group: exact total-variation
    distance (ppm) between the group's sensitive distribution and the
    global one — TV = (1/2) * sum_v |p_g(v) - p(v)|, cross-multiplied
    to the common denominator n_g * N so no ratio is ever formed
    (sum_v |cnt_gv*N - cnt_v*n_g| * 1e6 div (2*n_g*N), DECIMAL(38)
    products — cnt*N passes 2^63 near petabyte scale). Groups whose
    distribution mirrors the population score ~0; a group whose
    priorities skew hard scores high and fails the release bar.

    Shape: three hash aggregates off one scan + a |groups| x |domain|
    grid (bounded: 5 sensitive values), global totals broadcast."""
    j = _joined(spark, sf_dir)
    glob = j.groupBy("sensitive").agg(F.count(F.lit(1)).alias("cnt_v"))
    n_all = j.agg(F.count(F.lit(1)).alias("n_all"))
    grp = j.groupBy("nationkey", "mktsegment").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    gv = j.groupBy("nationkey", "mktsegment", "sensitive").agg(
        F.count(F.lit(1)).alias("cnt_gv")
    )
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(gv, ["nationkey", "mktsegment", "sensitive"], "left")
        .withColumn("cnt_gv", F.coalesce(F.col("cnt_gv"), F.lit(0)))
        .crossJoin(F.broadcast(n_all))
    )
    term = F.expr(
        "ABS(CAST(cnt_gv AS DECIMAL(38,0)) * n_all"
        " - CAST(cnt_v AS DECIMAL(38,0)) * n_g)"
    )
    return (
        grid.groupBy(
            F.col("nationkey").cast("bigint").alias("nationkey"),
            "mktsegment",
            "n_g",
            "n_all",
        )
        .agg(F.sum(term).alias("__num"))
        .select(
            "nationkey",
            "mktsegment",
            F.col("n_g").cast("bigint").alias("group_n"),
            F.expr(
                "CAST(__num * 1000000 AS DECIMAL(38,0))"
                " div CAST(2 * n_g * n_all AS DECIMAL(38,0))"
            ).cast("bigint").alias("tv_ppm"),
        )
        .orderBy(F.col("tv_ppm").desc(), "nationkey", "mktsegment")
    )
