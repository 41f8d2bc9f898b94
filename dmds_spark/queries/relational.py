"""Relational analytics battery (SURVEY.md §2b): joins, aggregations,
windows, sorts, set ops, scalar functions, semi-structured — each as a
DataFrame builder + DuckDB oracle SQL.

Determinism rules (hash-compare safe):
- money math in DECIMAL (exact) -> cast DOUBLE at the end;
- integer sums cast to BIGINT on both sides (DuckDB SUM(int) is HUGEINT);
- FLOOR/CEIL cast to BIGINT (DuckDB returns DOUBLE, Spark LONG);
- every top-k ordering includes a unique tie-break key;
- ROUND only on DECIMAL values (double ROUND half-case behavior differs
  between engines).

Scale notes: all joins against region/nation/supplier/part are
broadcast-able at TPC-H ratios (they grow ~100x slower than lineitem);
fact-fact joins shuffle on the key with AQE skew handling. Aggregations
are hash-based with map-side partial aggregation. No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.core.engine import maybe_broadcast
from dmds_spark.queries import register


def T(spark, sf_dir, name):
    from dmds_spark.sources.registry import load_table

    return load_table(spark, sf_dir, name)


# decimal casts (exact: inputs are 2-decimal money values)
def _dec(c, t="decimal(12,2)"):
    return F.col(c).cast(t)


_ONE = "CAST(1 AS DECIMAL(3,2))"


def _disc_sql(col="l_discount"):
    return f"({_ONE} - CAST({col} AS DECIMAL(4,2)))"


def _price_sql(col="l_extendedprice"):
    return f"CAST({col} AS DECIMAL(12,2))"


def _disc(col="l_discount"):
    return F.lit(1).cast("decimal(3,2)") - F.col(col).cast("decimal(4,2)")


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({_price_sql()}) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_price_sql()} * {_disc_sql()}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_price_sql()} * {_disc_sql()} * ({_ONE} + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM({_price_sql()}) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-aggregate over lineitem. The filter
    and the 7-column projection push into the parquet scan; aggregation
    is two-phase hash (partial map-side)."""
    li = T(spark, sf_dir, "lineitem")
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc = _disc()
    tax = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)")
    n = F.count(F.lit(1))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            F.sum(price * disc * tax).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT o_orderkey,
           CAST(SUM({_price_sql()} * {_disc_sql()}) AS DOUBLE) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. customer is the small side -> broadcast; the
    orders⋈lineitem join shuffles on orderkey. Top-10 with orderkey
    tie-break for determinism."""
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.sum(_dec("l_extendedprice") * _disc()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "orderdate")
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(SUM({_price_sql()} * {_disc_sql()}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. nation/region/supplier broadcast;
    Catalyst reorders the equi-joins; customer-supplier nation equality
    is an extra join predicate, not a post-filter."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            maybe_broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * _disc()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    f"""
    SELECT CAST(SUM({_price_sql()} * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.03 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-agg; every predicate pushes to parquet
    row-group stats. The discount comparison is done in decimal to avoid
    double-literal edge behavior."""
    li = T(spark, sf_dir, "lineitem")
    d = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (d >= F.lit(0.03).cast("decimal(4,2)"))
            & (d <= F.lit(0.07).cast("decimal(4,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * d).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_revenue",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_price_sql()} * {_disc_sql()}) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = T(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice") * _disc()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Join family — every join type (SURVEY.md §2b "joins")
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    """
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
)
def join_inner(spark, sf_dir):
    orders = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cust = T(spark, sf_dir, "customer")
    return orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@register(
    "join_left",
    """
    SELECT c_custkey, COALESCE(CAST(cnt AS BIGINT), 0) AS n_orders
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
)
def join_left(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    per_cust = (
        T(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", F.coalesce(F.col("cnt").cast("bigint"), F.lit(0)).alias("n_orders"))
    )


@register(
    "join_right",
    """
    SELECT c_custkey, o_orderkey
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 450000) o
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def join_right(spark, sf_dir):
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 450000)
    )
    cust = T(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_full_outer",
    """
    SELECT k, c_cnt, s_cnt FROM (
      SELECT COALESCE(c.k, s.k) AS k, CAST(c.cnt AS BIGINT) AS c_cnt, CAST(s.cnt AS BIGINT) AS s_cnt
      FROM (SELECT c_nationkey AS k, COUNT(*) AS cnt FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
      FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS cnt FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
      ON c.k = s.k
    )
    """,
)
def join_full_outer(spark, sf_dir):
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("k"),
        c.cnt.cast("bigint").alias("c_cnt"),
        s.cnt.cast("bigint").alias("s_cnt"),
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    big = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark, sf_dir):
    return T(spark, sf_dir, "region").crossJoin(T(spark, sf_dir, "nation")).select(
        "r_name", "n_name"
    )


@register(
    "join_theta_range",
    """
    SELECT b.band_id, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM part p
    JOIN (SELECT n_nationkey AS band_id,
                 n_nationkey * 100.0 AS lo,
                 n_nationkey * 100.0 + 99.99 AS hi
          FROM nation) b
      ON p.p_retailprice >= b.lo AND p.p_retailprice <= b.hi
    GROUP BY b.band_id
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi range join. The band table is tiny -> broadcast nested
    loop, which is the correct plan; the scale path for fact-fact range
    joins is operators.relational.bucketized_range_join."""
    part = T(spark, sf_dir, "part")
    bands = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 100.0).alias("lo"),
        (F.col("n_nationkey") * 100.0 + 99.99).alias("hi"),
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice <= bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_dec("p_retailprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "join_asof",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, CAST(p.value AS DOUBLE) AS prev_purchase
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: for each click, the latest purchase at-or-before it
    per user. The operator (operators.relational.asof_join) expresses
    it as union + last_value window — ONE sort-shuffle on (user, time),
    not the naive theta-join + per-row max double shuffle. The oracle
    is DuckDB's native ASOF JOIN. Right side deduped per (user, ts) so
    both formulations pick the same row."""
    from pyspark.sql import Window as W

    from dmds_spark.operators.relational import asof_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("prev_purchase"))
    )
    out = asof_join(
        clicks, purch, on="ts", by=["user_id"], right_value_cols=["prev_purchase"]
    )
    return out.select(
        "event_id", "user_id", F.col("prev_purchase").cast("double").alias("prev_purchase")
    )


_ASOF_TOL_US = 6 * 3600 * 1_000_000  # 6 hours


@register(
    "join_asof_tolerance",
    f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= {_ASOF_TOL_US}
                THEN CAST(p.value AS DOUBLE) END AS prev_purchase_6h
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a 6-hour TOLERANCE (pandas merge_asof
    semantics): the nearest at-or-before purchase matches only inside
    the window — a stale quote/touch must not attribute. Equivalent to
    post-filtering the nearest pick (any other candidate is farther),
    so the plan is IDENTICAL to join_asof's single sort-shuffle; the
    oracle applies the same gap gate to DuckDB's native ASOF pick."""
    from pyspark.sql import Window as W

    from dmds_spark.operators.relational import asof_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("prev_purchase_6h"))
    )
    out = asof_join(
        clicks,
        purch,
        on="ts",
        by=["user_id"],
        right_value_cols=["prev_purchase_6h"],
        tolerance=_ASOF_TOL_US,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("prev_purchase_6h").cast("double").alias("prev_purchase_6h"),
    )


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@register(
    "agg_basic_stats",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_basic_stats(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        (F.sum(_dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
    )


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("n_supp"),
        F.countDistinct("l_partkey").cast("bigint").alias("n_part"),
    )


@register("agg_approx_distinct", None)  # approx values are engine-specific: rows-only check
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++). No oracle: HLL estimates
    are implementation-defined; the engine-level test asserts the
    estimate is within 5% of the exact count."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_having",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark, sf_dir):
    orders = T(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "distinct_projection",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def distinct_projection(spark, sf_dir):
    return T(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "pivot_conditional",
    """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
    FROM events GROUP BY user_id
    """,
)
def pivot_conditional(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
    )


# ---------------------------------------------------------------------------
# Window family
# ---------------------------------------------------------------------------


@register(
    "window_row_number",
    """
    SELECT l_orderkey, l_linenumber, rn FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                    ORDER BY l_quantity DESC, l_linenumber) AS BIGINT) AS rn
      FROM lineitem
    ) WHERE rn <= 2
    """,
)
def window_row_number(spark, sf_dir):
    from pyspark.sql import Window as W

    li = T(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc(), F.col("l_linenumber"))
    return (
        li.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "rn")
    )


@register(
    "window_rank_dense_ntile",
    """
    SELECT c_custkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_dense_ntile(spark, sf_dir):
    """rank/dense_rank are per-nation windows (one bounded shuffle).
    The global NTILE(4) is NOT a global window (single-partition trap):
    it's computed from a distributed global row number
    (range-repartition + per-partition offsets, operators.relational.
    global_row_number) and the SQL-standard bucket-allocation formula —
    identical output, every stage parallel."""
    from pyspark.sql import Window as W

    from dmds_spark.operators.relational import global_row_number, ntile_from_rn

    cust = T(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    n_rows = cust.count()
    ranked = global_row_number(cust, order, out="__rn")
    w = W.partitionBy("c_nationkey").orderBy(*order)
    return ranked.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        ntile_from_rn(F.col("__rn"), n_rows, 4).cast("bigint").alias("quartile"),
    ).select(
        "c_custkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        "quartile",
    )


@register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
           CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
)
def window_lag_lead(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = T(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.to_date("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
        F.first("o_orderkey").over(w).cast("bigint").alias("first_order"),
    )


@register(
    "window_running_sum",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem WHERE l_suppkey <= 20
    """,
)
def window_running_sum(spark, sf_dir):
    from pyspark.sql import Window as W

    li = T(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(F.to_date("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_dec("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@register(
    "window_range_between",
    """
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_90d
    FROM orders
    """,
)
def window_range_between(spark, sf_dir):
    """Sliding 90-day count per customer via RANGE frame over epoch
    seconds (7776000 s = 90 days) — identical frame arithmetic on both
    engines since the order key is an exact integer."""
    from pyspark.sql import Window as W

    orders = T(spark, sf_dir, "orders")
    epoch = F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate")))
        .rangeBetween(-7776000, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).cast("bigint").alias("orders_90d"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topn",
    """
    SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def sort_limit_topn(spark, sf_dir):
    """Global top-N: Spark executes as TakeOrderedAndProject (per-
    partition top-N + driver merge) — no full sort, no full shuffle."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
        .select("l_orderkey", "l_linenumber", F.col("l_extendedprice").cast("double").alias("price"))
    )


@register(
    "topk_per_group",
    """
    SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    from dmds_spark.operators.relational import top_k_per_group

    cust = T(spark, sf_dir, "customer")
    return top_k_per_group(
        cust, ["c_nationkey"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 3
    ).select("c_nationkey", "c_custkey", F.col("c_acctbal").cast("double").alias("acctbal"))


@register(
    "sort_nulls_ordering",
    """
    SELECT c_custkey, o_orderkey FROM (
      SELECT c_custkey, o.o_orderkey,
             ROW_NUMBER() OVER (ORDER BY o.o_orderkey ASC NULLS FIRST, c_custkey) AS rn
      FROM customer LEFT JOIN
        (SELECT * FROM orders WHERE o_totalprice > 480000) o ON c_custkey = o_custkey
    ) WHERE rn <= 50
    """,
)
def sort_nulls_ordering(spark, sf_dir):
    """NULLS FIRST ordering surfaced through a deterministic row_number
    projection (pure ORDER BY output order is not hash-checkable)."""
    from pyspark.sql import Window as W

    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    order = [F.col("o_orderkey").asc_nulls_first(), F.col("c_custkey")]
    # top-50 via TakeOrderedAndProject (per-partition top-k + driver
    # merge — never a single-partition global window over all rows);
    # the row_number window then runs on <= 50 rows
    top = j.orderBy(*order).limit(50)
    w = W.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w)).select(
        "c_custkey", "o_orderkey"
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    """
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    )
    """,
)
def setop_union_all(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s)


@register(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_union_distinct(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct()


@register(
    "setop_intersect",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9990
    INTERSECT
    SELECT o_custkey AS k FROM orders
    """,
)
def setop_intersect(spark, sf_dir):
    c = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9990).select(
        F.col("c_custkey").alias("k")
    )
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o)


@register(
    "setop_except",
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
)
def setop_except(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o).distinct()


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@register(
    "scalar_string",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           TRIM(p_name) AS name_trim,
           (p_type LIKE '%BRASS%') AS is_brass,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REPLACE(p_name, ' ', '_') AS name_us
    FROM part
    """,
)
def scalar_string(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_us"),
    )


@register(
    "scalar_date",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
           CAST(DAY(o_orderdate) AS BIGINT) AS dom,
           epoch_us(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS plus30_us,
           CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS VARCHAR) AS month_start
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def scalar_date(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.unix_micros(F.date_add(d, 30).cast("timestamp")).alias("plus30_us"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
    )


@register(
    "scalar_math",
    """
    SELECT p_partkey,
           CAST(ABS(p_size - 25) AS BIGINT) AS size_dev,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_r1,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(p_size % 7 AS BIGINT) AS size_mod,
           CAST(POWER(2, p_size % 5) AS DOUBLE) AS pow2,
           CAST(SQRT(CAST(p_size AS DOUBLE)) AS DOUBLE) AS size_sqrt
    FROM part
    """,
)
def scalar_math(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dev"),
        F.round(_dec("p_retailprice"), 1).cast("double").alias("price_r1"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        (F.col("p_size") % 7).cast("bigint").alias("size_mod"),
        F.pow(F.lit(2), F.col("p_size") % 5).cast("double").alias("pow2"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
    )


@register(
    "scalar_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           (CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS is_urgent
    FROM orders
    """,
)
def scalar_conditional(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
        ).alias("status_label"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_urgent"),
    )


# ---------------------------------------------------------------------------
# Semi-structured
# ---------------------------------------------------------------------------


@register(
    "semi_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def semi_json_extract(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).cast("bigint").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "semi_array_explode",
    """
    SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS word FROM documents)
    WHERE LENGTH(word) >= 6
    GROUP BY lang, word
    """,
)
def semi_array_explode(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 6)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "semi_array_ops",
    """
    SELECT doc_id,
           CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_words,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           array_to_string(string_split(text, ' ')[1:3], '-') AS first3
    FROM documents
    """,
)
def semi_array_ops(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_contains(words, "data").alias("has_data"),
        F.array_join(F.slice(words, 1, 3), "-").alias("first3"),
    )
