"""Extended TPC-H-shaped battery (SURVEY.md §2b joins/agg/window rows),
adapted to the driver's reduced schema (TESTDATA.md: no partsupp, no
commit/receipt dates, simple p_type categories). Q2/Q4/Q7/Q8/Q9/Q13/
Q14/Q15/Q17/Q18/Q19/Q21/Q22 shapes — the join-heavy half of TPC-H the
base battery (q1/q3/q5/q6/q10 in relational.py) doesn't cover.

Determinism rules are those of relational.py: money in DECIMAL then
DOUBLE at the end, counts BIGINT both sides, every top-k totally
ordered. Scale notes per query in docstrings; the global pattern is
dimension-side broadcast (region/nation/supplier/part/customer grow
~100x slower than lineitem) and a single shuffle on the fact key.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.core.engine import maybe_broadcast
from dmds_spark.queries import register
from dmds_spark.queries.relational import T, _dec, _disc, _disc_sql, _price_sql


def _rev():
    return _dec("l_extendedprice") * _disc()


_REV_SQL = f"{_price_sql()} * {_disc_sql()}"


@register(
    "q2_min_cost_supplier",
    f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             SUM({_REV_SQL}) AS tot
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT p_partkey, p_name, s_suppkey, s_name,
             CAST(tot AS DOUBLE) AS cost,
             ROW_NUMBER() OVER (PARTITION BY p_partkey
                                ORDER BY tot, s_suppkey) AS rn
      FROM part JOIN cost ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
      WHERE p_size BETWEEN 10 AND 25 AND p_type = 'LARGE'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, cost
    FROM ranked WHERE rn = 1
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (no partsupp in this schema): cheapest supplier
    per qualifying part, cost = that supplier's discounted revenue on
    the part. One shuffle agg on (partkey, suppkey); part+supplier are
    broadcast; min-per-part via row_number with suppkey tie-break."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "LARGE")
    )
    supp = T(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(_rev()).alias("tot"))
    w = W.partitionBy("p_partkey").orderBy("tot", "s_suppkey")
    return (
        cost.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            F.col("tot").cast("double").alias("cost"),
        )
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (lateness = shipped >30 days after order, since
    this schema has no commit/receipt dates). EXISTS compiles to a
    left-semi join on orderkey — one shuffle, no row duplication, then
    a tiny 5-group aggregate."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year. supplier/customer/
    nation broadcast; the only shuffle is lineitem⋈orders on orderkey.
    The nation-pair disjunction is applied after both nation joins
    (Catalyst pushes each side's IN('NATION_1','NATION_2') down)."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = T(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_2's share of ASIA-customer ECONOMY-part revenue
    per year. Five broadcast joins around one lineitem⋈orders shuffle;
    both SUMs are exact decimals so the final double division is
    bit-stable for hash-compare."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    nation2 = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)
    return (
        li.join(maybe_broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"), "inner")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nation2).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             {_REV_SQL}
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(0.10 AS DECIMAL(3,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'STANDARD'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (no ps_supplycost: unit cost modeled as 10% of
    p_retailprice). Profit per supplier-nation per year over STANDARD
    parts. part/supplier/nation broadcast; all money math DECIMAL."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev() - (
        _dec("p_retailprice")
        * F.lit(0.10).cast("decimal(3,2)")
        * _dec("l_quantity")
    )
    return (
        li.join(
            maybe_broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of non-urgent order counts per customer.
    Left-outer keeps order-less customers (COUNT of NULL key = 0). At
    scale: shuffle on custkey, second aggregate over ≤ a few hundred
    distinct counts collapses map-side."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(100.00 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: PROMO-part share of one month's revenue. part is
    broadcast; the month filter pushes into the lineitem scan so the
    join touches ~1/80th of the fact table."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-09-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-10-01").cast("date"))
    )
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total = (SELECT MAX(total) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue. The scalar
    MAX subquery becomes a rank-1 window over the (small) per-supplier
    aggregate — no second scan of lineitem, ties preserved exactly as
    the SQL's equality does."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total")
    )
    # scalar MAX as a broadcast single-row join, not a global window —
    # a rank() with no partitioning would funnel every supplier's total
    # through one task (fatal with millions of suppliers at 100 TB)
    mx = rev.agg(F.max("total").alias("mx"))
    top = rev.join(F.broadcast(mx), F.col("total") == F.col("mx"))
    return top.join(
        maybe_broadcast(supp), F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue"))


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS ap, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    ) agg ON ap = p_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS DECIMAL(12,2)) * cnt * 5 < sq
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders. The
    qty < 0.2*avg(qty per part) predicate is algebraically rewritten to
    qty*cnt*5 < sum(qty) — all-DECIMAL/BIGINT exact math, so Spark and
    DuckDB agree bit-for-bit (a double avg would not). The per-part
    aggregate shuffles once on partkey and joins back broadcast-side
    after the Brand filter prunes parts."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(maybe_broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("ap") == F.col("p_partkey"))
        .filter(_dec("l_quantity") * F.col("cnt") * 5 < F.col("sq"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
             CAST(o_totalprice AS DOUBLE)
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 300. The HAVING
    subquery is a semi-join of orders against the per-orderkey
    aggregate (tiny at any scale: selectivity ~1%), so customer join
    and final group run on the filtered fact only."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("oq"))
        .filter(F.col("oq") > 300)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_ok"), "inner")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(maybe_broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_bracket_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_bracket_revenue(spark, sf_dir):
    """TPC-H Q19: disjunctive brand/size/quantity brackets. The OR of
    ANDs stays one broadcast-join + filter; Catalyst extracts the
    common l_quantity bounds [1,30] as a pushable scan filter."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & (q >= 1) & (q <= 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & (q >= 10) & (q <= 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & (q >= 20) & (q <= 30)
    )
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2 | b3)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q21_late_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_late_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (lateness = shipped >60 days after order date;
    the NOT-EXISTS leg needs receipt dates this schema lacks, so the
    multi-supplier EXISTS leg carries the correlated-subquery
    coverage). EXISTS = left-semi self-join of lineitem on orderkey
    with the suppkey inequality as join condition — one shuffle reused
    by both sides."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60))
        .join(
            l2,
            (F.col("l2_ok") == F.col("l_orderkey"))
            & (F.col("l2_sk") != F.col("l_suppkey")),
            "left_semi",
        )
    )
    return (
        late.join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q11_important_parts",
    f"""
    WITH value_by_part AS (
      SELECT l_partkey, SUM({_REV_SQL}) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE part_value > (
      SELECT SUM(part_value) * CAST(0.001 AS DECIMAL(6,4)) FROM value_by_part
    )
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (no partsupp: "stock value" = discounted revenue
    a nation's suppliers booked per part). Parts whose value exceeds
    0.1% of the nation total. supplier+nation broadcast; one shuffle on
    partkey; the scalar total is a single-row broadcast join (never a
    global window — that would funnel every part through one task).
    Threshold math all-DECIMAL so both engines compare exactly."""
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = (
        li.join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("part_value"))
    )
    total = value.agg(
        (F.sum("part_value") * F.lit(0.001).cast("decimal(6,4)")).alias("thr")
    )
    return value.join(F.broadcast(total), F.col("part_value") > F.col("thr")).select(
        "l_partkey", F.col("part_value").cast("double").alias("part_value")
    )


@register(
    "q12_priority_lateness",
    """
    SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
    GROUP BY EXTRACT(year FROM l_shipdate)
    """,
)
def q12_priority_lateness(spark, sf_dir):
    """TPC-H Q12 shape (no l_shipmode/commit dates in this schema: the
    mode axis becomes ship year, lateness = shipped >30 days after
    order). Pivot-style conditional counts; one shuffle on orderkey;
    the date comparison is a non-equi post-join filter."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape (lineitem stands in for partsupp as the
    part↔supplier relation; "customer complaints" = negative acctbal).
    Distinct-supplier count per (brand, type, size). NOT IN compiles to
    a left-anti broadcast join (supplier is tiny); part broadcast; the
    count(distinct) expands to a two-phase aggregate on Spark's side."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            maybe_broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
        AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 60
      )
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (no partsupp availqty: a supplier qualifies if
    it shipped >60 units of some red part in 1996 — same nested
    IN(GROUP BY ... HAVING) structure). Inner pipeline: part-name
    filter broadcast into lineitem, one shuffle on (suppkey, partkey),
    then a left-semi into the tiny supplier⋈nation side. Exact DECIMAL
    quantity sum keeps the HAVING edge cases identical across engines."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    red = T(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    nat = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    ).select("n_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    qualified = (
        li.join(maybe_broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 60)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q22_idle_customers",
    """
    SELECT c_nationkey, COUNT(*) AS numcust
    FROM customer
    WHERE c_acctbal > 5000
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers with no recent orders
    (no phone-prefix column in this schema; the acctbal>avg leg is
    replaced by a fixed threshold so the predicate is exact — a double
    AVG would not hash-compare). NOT EXISTS = left-anti join against
    date-filtered orders; COUNT per nation is exact."""
    cust = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    recent = T(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"))
    )
