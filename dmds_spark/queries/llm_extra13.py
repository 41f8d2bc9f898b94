"""Round-7 queries, batch two: planning/advisor views a cluster
operator actually runs before launching the big job — join-skew
advisory (should this key be salted?), partition-size planning (how
many output partitions per source?), a whole-table cardinality profile
— plus the interval-overlap join through the binned operator (the
range-join shape OSS Spark would otherwise nested-loop) and exact
maximum-inner-product search.

All oracle-checked; the advisor outputs are exact integers (ppm shares
via integer division) so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register

# ---------------------------------------------------------------------------
# join-skew advisor
# ---------------------------------------------------------------------------

_ADVISOR_PARTITIONS = 32  # the planned shuffle parallelism to advise for


@register(
    "profile_join_skew_advisor",
    f"""
    WITH k AS (
      SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY 1
    ), tot AS (SELECT SUM(cnt) AS total FROM k)
    SELECT key, CAST(cnt AS BIGINT) AS cnt,
           CAST(total AS BIGINT) AS total_rows,
           CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(CASE WHEN cnt * {_ADVISOR_PARTITIONS} > total
                     THEN 1 ELSE 0 END AS BIGINT) AS salt_recommended
    FROM k, tot
    ORDER BY cnt DESC, key
    """,
)
def profile_join_skew_advisor(spark, sf_dir):
    """Pre-flight skew report for a planned shuffle key (event_type):
    per-key row count, parts-per-million share (integer division —
    exact), and whether the key needs SALTING at the planned
    parallelism — recommended when one key holds more than 1/P of the
    rows (cnt * P > total, kept in integers), because that key's
    partition is then the straggler no matter how many executors P
    buys. This is the decision input for operators/skew.py
    salted_agg / join_salted_skew: run the advisor on the 100 TB key
    column FIRST (it costs one groupBy), salt only if it says so.
    event_type holds ~1/5 of the rows per key, so every row says
    salt_recommended=1 here — the firing case; a uniform key like
    user_id reports 0s."""
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, sf_dir)
    k = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = k.agg(F.sum("cnt").alias("total"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("total").cast("bigint").alias("total_rows"),
            F.expr("cnt * 1000000 div total").cast("bigint")
            .alias("share_ppm"),
            F.when(
                F.col("cnt") * _ADVISOR_PARTITIONS > F.col("total"), 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("salt_recommended"),
        )
        .orderBy(F.col("cnt").desc(), "key")
    )


# ---------------------------------------------------------------------------
# partition-size planner
# ---------------------------------------------------------------------------

_TARGET_CHARS = 1 << 20  # plan ~1 MiB of text per output partition


@register(
    "profile_partition_size_planner",
    f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST((SUM(length(text)) + {_TARGET_CHARS} - 1)
                // {_TARGET_CHARS} AS BIGINT) AS n_partitions,
           CAST((COUNT(*) + (SUM(length(text)) + {_TARGET_CHARS} - 1)
                            // {_TARGET_CHARS} - 1)
                // ((SUM(length(text)) + {_TARGET_CHARS} - 1)
                    // {_TARGET_CHARS}) AS BIGINT) AS docs_per_partition
    FROM documents GROUP BY source ORDER BY source
    """,
)
def profile_partition_size_planner(spark, sf_dir):
    """Write-layout planner: per source, how many output partitions a
    repartition-before-write should use to land ~{target} characters
    of text per file, and the resulting docs-per-partition — the
    number you pass to ``df.repartition(n)`` (or a repartitionByRange
    on doc_id) before writing a curated corpus, instead of inheriting
    the input split count (the classic small-files generator). All
    ceiling divisions in integers, so both engines agree exactly.

    One aggregate over (source); at 100 TB this is the same one-pass
    metadata query, and the per-source n_partitions feeds a single
    repartition per source branch.""".replace(
        "{target}", str(_TARGET_CHARS)
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    nparts = F.expr(
        f"(total_chars + {_TARGET_CHARS} - 1) div {_TARGET_CHARS}"
    )
    return g.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        nparts.cast("bigint").alias("n_partitions"),
        F.expr(
            f"(n_docs + (total_chars + {_TARGET_CHARS} - 1)"
            f" div {_TARGET_CHARS} - 1)"
            f" div ((total_chars + {_TARGET_CHARS} - 1)"
            f" div {_TARGET_CHARS})"
        )
        .cast("bigint")
        .alias("docs_per_partition"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# whole-table cardinality profile
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


def _cardinality_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           (SELECT CAST({c} AS VARCHAR) FROM orders
            GROUP BY {c} ORDER BY COUNT(*) DESC, CAST({c} AS VARCHAR)
            LIMIT 1) AS top_value,
           (SELECT COUNT(*) AS c2 FROM orders
            GROUP BY {c} ORDER BY c2 DESC, CAST({c} AS VARCHAR)
            LIMIT 1) AS top_cnt,
           CAST((SELECT COUNT(*) AS c2 FROM orders
                 GROUP BY {c} ORDER BY c2 DESC, CAST({c} AS VARCHAR)
                 LIMIT 1) * 1000000 // COUNT(*) AS BIGINT) AS top_share_ppm
    FROM orders
            """
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register("profile_cardinality_report", _cardinality_sql())
def profile_cardinality_report(spark, sf_dir):
    """One-row-per-column profile of orders' categorical columns:
    distinct count, null count, the most frequent value (ties broken
    on the value string) and its exact ppm share — the at-a-glance
    view that picks partition columns (low cardinality, even shares),
    flags constant columns, and prices dictionary encoding. The
    long-format output is what a profiler UI renders directly.

    One pass per column over a stacked (col_name, value) projection:
    the melt is a narrow generate (no shuffle), then a single
    (col_name, value) aggregate + per-column window for the top value
    — 3 columns never scan the table 3 times."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    stacked = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.value")
    per_val = stacked.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    # single lineage (one scan): rank values within each column, then
    # fold stats AND the rank-1 value in ONE aggregate — max over a
    # when(rn=1) struct picks the top row without a second branch
    w = W.partitionBy("col_name").orderBy(F.col("c").desc(), "value")
    ranked = per_val.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_distinct_nonnull"),
        F.sum(F.when(F.col("value").isNull(), F.col("c")).otherwise(0))
        .alias("n_null"),
        F.sum("c").alias("n_rows"),
        F.max(
            F.when(
                F.col("rn") == 1, F.struct(F.col("value"), F.col("c"))
            )
        ).alias("top"),
    )
    return agg.select(
        "col_name",
        # count(distinct col) in SQL excludes NULL; per_val counts
        # the NULL group as a row, so subtract it back out
        (
            F.col("n_distinct_nonnull")
            - F.when(F.col("n_null") > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_distinct"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("top.value").alias("top_value"),
        F.col("top.c").cast("bigint").alias("top_cnt"),
        F.expr("top.c * 1000000 div n_rows").cast("bigint")
        .alias("top_share_ppm"),
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# interval-overlap join (binned operator) over order/shipment windows
# ---------------------------------------------------------------------------

_IOJ_ORDER_SPAN = 6  # order attention window: orderdate + 6 days
_IOJ_BUCKET_DAYS = 16


@register(
    "join_interval_overlap",
    f"""
    WITH a AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS alo,
             CAST(o_orderdate AS DATE) + {_IOJ_ORDER_SPAN} AS ahi
      FROM orders
      WHERE CAST(o_orderdate AS DATE)
            BETWEEN DATE '1995-01-01' AND DATE '1995-01-07'
    ), b AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS blo,
             CAST(l_shipdate AS DATE)
               + (CAST(l_quantity AS INTEGER) % 21) AS bhi
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE)
            BETWEEN DATE '1994-12-15' AND DATE '1995-02-15'
    ), p AS (
      SELECT a.o_orderkey, a.o_orderpriority, b.l_orderkey, b.l_linenumber,
             (LEAST(ahi, bhi) - GREATEST(alo, blo)) + 1 AS overlap_days
      FROM a JOIN b ON alo <= bhi AND blo <= ahi
    )
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(overlap_days) AS BIGINT) AS sum_overlap_days,
           CAST(CAST(SUM(overlap_days) AS DOUBLE) / COUNT(*) AS DOUBLE)
             AS avg_overlap_days
    FROM p GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join at fact-fact scale: first-week-of-1995
    order attention windows ([orderdate, +6d]) against lineitem
    transit windows ([shipdate, receiptdate]), aggregated per order
    priority with exact overlap-day sums. OSS Spark plans a raw
    interval-overlap predicate as a broadcast-nested-loop (O(n*m)
    compares); the ``interval_overlap_join`` operator bins both sides
    on {_IOJ_BUCKET_DAYS}-day buckets, hash-joins on the bin, credits
    each pair to its first shared bin (algebraic dedup — no distinct),
    and re-checks the exact predicate — the same rows, plan-pinned
    hash-join (tests/test_range_join.py). DuckDB's oracle runs the
    naive predicate through its IEJoin.

    At 100 TB: bin fan-out is interval_len/bucket_width + 1 per row
    (~2-3x here); the join shuffles on the bin key whose cardinality
    is the date range — add a ``by`` key (region, tenant) when one
    calendar is too hot."""
    from dmds_spark.operators.relational import interval_overlap_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    epoch = F.lit("1970-01-01")
    a = o.filter(
        F.to_date("o_orderdate").between("1995-01-01", "1995-01-07")
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), epoch).alias("alo"),
        (F.datediff(F.to_date("o_orderdate"), epoch) + _IOJ_ORDER_SPAN)
        .alias("ahi"),
    )
    # the synthetic lineitem has no receiptdate; the transit window is
    # a deterministic shipdate + (quantity mod 21)-day span instead
    b = li.filter(
        F.to_date("l_shipdate").between("1994-12-15", "1995-02-15")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date("l_shipdate"), epoch).alias("blo"),
        (
            F.datediff(F.to_date("l_shipdate"), epoch)
            + F.col("l_quantity").cast("int") % 21
        ).alias("bhi"),
    )
    p = interval_overlap_join(
        a, b, "alo", "ahi", "blo", "bhi", _IOJ_BUCKET_DAYS
    ).withColumn(
        "overlap_days",
        F.least("ahi", "bhi") - F.greatest("alo", "blo") + 1,
    )
    return (
        p.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
            F.sum("overlap_days").cast("bigint").alias("sum_overlap_days"),
            (F.sum("overlap_days").cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_overlap_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# exact maximum-inner-product search
# ---------------------------------------------------------------------------


@register(
    "similarity_mips_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           CAST(ROUND(CAST(list_inner_product(e.embedding, q.qv)
                           AS DECIMAL(18,9)), 4) AS DOUBLE) AS ip
    FROM embeddings e, q
    WHERE vec_id <> 0
    ORDER BY list_inner_product(e.embedding, q.qv) DESC, vec_id
    LIMIT 10
    """,
)
def similarity_mips_topk(spark, sf_dir):
    """Exact maximum-inner-product top-k against the vec_id=0 query —
    the retrieval scoring most embedding models are actually trained
    for (unnormalized dot product rewards both angle AND magnitude;
    cosine_topk is the normalized sibling). JVM-side zip_with/
    aggregate fold, float inputs promoted to double in index order on
    both engines so the doubles are bit-identical; TakeOrdered top-10
    on the (ip, vec_id) total order.

    At 100 TB this is the brute-force verifier; the bucketed scale
    path reduces MIPS to cosine by augmenting each vector with
    sqrt(M^2 - |x|^2) (M = max norm) and reusing the sign-LSH
    pipeline — the transform is one map, the infrastructure is
    similarity_ann_lsh_topk's."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    joined = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    ip = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qv"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.withColumn("ip_exact", ip)
        .orderBy(F.col("ip_exact").desc(), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            F.round(F.col("ip_exact").cast("decimal(18,9)"), 4)
            .cast("double")
            .alias("ip"),
        )
    )
