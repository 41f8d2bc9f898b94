"""Rational BM25 — the ONE exact fixed-point scoring pipeline shared
by the per-query build (queries/round9b.py text_bm25_topk) and the
maintained posting store (operators/incremental_postings.py
search_bm25), so the two can never silently diverge: k1 = 1.2,
b = 0.75, the logarithmic idf replaced by its rational argument
idf_r = (2(N-df)+1)/(2df+1), both factors as DECIMAL(38,0) floor
divisions (no libm — a ln() drifts in the last ulp between engines;
the wide decimal keeps idf exact past 1e18, where a narrower cast
overflowed to NULL and silently dropped terms).

The tf saturation clears its fractions by multiplying numerator and
denominator by 10*D (D = total corpus tokens):
  tf_part = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl*N/D)
          = 22*tf*D / (10*tf*D + 3*D + 9*dl*N)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

BM25_SCALE = 1_000_000  # fixed-point scale for both factors


def rational_bm25_topk(tf: DataFrame, dl: DataFrame, topk: int) -> DataFrame:
    """Top-k docs by exact rational BM25 over the QUERY-TERM posting
    rows ``tf`` (term, doc_id, tf — already filtered to the query
    terms) and the doc-length table ``dl`` (doc_id, dl). Returns
    (doc_id, score_str, rnk): scores ship as DECIMAL(38,0) digit
    strings (exact at any magnitude on both engines).

    Shape at scale: df (|query| rows) and the corpus totals (1 row)
    broadcast back onto the posting rows; the final top-k is
    TakeOrderedAndProject and only the k survivors see the rank
    window."""
    from dmds_spark.operators.relational import exact_floordiv

    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("d_tot")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    idf_s = exact_floordiv(
        (2 * (dec(F.col("n_docs")) - F.col("df")) + 1) * F.lit(BM25_SCALE),
        2 * F.col("df") + 1,
    )
    tfp_s = exact_floordiv(
        dec(F.col("tf")) * F.lit(22) * F.col("d_tot") * F.lit(BM25_SCALE),
        dec(F.col("tf")) * 10 * F.col("d_tot")
        + 3 * dec(F.col("d_tot"))
        + 9 * dec(F.col("dl")) * F.col("n_docs"),
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (idf_s * tfp_s).cast("decimal(38,0)").alias("part"),
        )
    )
    total = scored.groupBy("doc_id").agg(
        F.sum("part").cast("decimal(38,0)").alias("score")
    )
    order = [F.col("score").desc(), F.col("doc_id")]
    top = total.orderBy(*order).limit(topk)
    return top.withColumn(
        "rnk", F.row_number().over(W.orderBy(*order))
    ).select(
        "doc_id",
        F.col("score").cast("string").alias("score_str"),
        F.col("rnk").cast("bigint").alias("rnk"),
    )
