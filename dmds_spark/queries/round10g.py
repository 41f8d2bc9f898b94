"""Round-10 queries, batch seven: incremental maintenance for the
line-boilerplate index (the web-curation family's nightly-crawl
story, on the same generic IncrementalRollup as the orders and span
rollups) and k-fold cross-validation assignment (the evaluation-side
sibling of the hash split family).

Both oracle-checked: the rollup's hash-match certifies two O(new)
increments equal one full recompute; the k-fold report is exact
counts + DECIMAL money.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.round10 import _AUG_SQL, _LINE_W


@register(
    "rollup_incremental_lines",
    f"""
    WITH aug AS (
      SELECT doc_id, source, string_split({_AUG_SQL}, ' ') AS toks
      FROM documents
    ), l0 AS (
      SELECT doc_id, source,
             UNNEST([array_to_string(
                       list_slice(toks, (i-1)*{_LINE_W}+1, (i-1)*{_LINE_W}+{_LINE_W}), ' ')
                     for i in range(1, CAST(ceil(len(toks)/{_LINE_W}.0) AS BIGINT)+1)]) AS line
      FROM aug
    )
    SELECT source, line,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
    FROM l0 GROUP BY source, line
    ORDER BY n_docs DESC, n_occ DESC, source, line LIMIT 20
    """,
)
def rollup_incremental_lines(spark, sf_dir):
    """An INCREMENTALLY MAINTAINED line-boilerplate index: the
    (source, line) reach stats behind web_line_dedup_rewrite kept in
    sync with an append-only corpus by the generic IncrementalRollup.
    The ``transform`` hook cuts each NEW batch into its aligned
    10-word lines and pre-collapses to ONE ROW PER (source, line,
    doc_id) carrying the per-doc occurrence count — so the rollup's
    generic partials decompose exactly: ``cnt`` counts documents
    (each document lives entirely in one source file, so doc rows
    never straddle increments — the invariant that makes the distinct
    doc count sum-decomposable without sketches), ``sum_occ`` counts
    occurrences, ``min_doc_id`` carries the canonical keeper. Seed
    half the corpus, refresh, append the rest, refresh again; the
    oracle states the FULL-corpus aggregate declaratively, so the
    hash-match certifies two O(new) increments equal one full
    recompute — the nightly-crawl maintenance story for line-level
    boilerplate dedup (new crawl in, reach stats current, no corpus
    rescan).

    Reference parity: this is the dirty-chunk flush discipline
    (tokio-fs/src/lib.rs:207-235) applied to a derived aggregate —
    same versioned-pointer crash safety as rollup_incremental_orders."""
    from dmds_spark.core.scratch import scratch_dir
    from dmds_spark.operators.rollup import IncrementalRollup

    root = scratch_dir("lineroll", sf_dir)
    src = f"{root}/src"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )

    def to_lines(df):
        aug = df.select(
            "doc_id", "source", F.split(F.expr(_AUG_SQL), " ").alias("toks")
        )
        lines = aug.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, CAST(ceil(size(toks)/{_LINE_W}.0) AS INT)),"
                    f" i -> array_join(slice(toks, (i-1)*{_LINE_W}+1, {_LINE_W}), ' '))"
                )
            ).alias("line"),
        )
        # one row per (source, line, doc): cnt across increments counts
        # DOCUMENTS exactly (docs never straddle source files)
        return lines.groupBy("source", "line", "doc_id").agg(
            F.count(F.lit(1)).alias("occ")
        )

    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
    ru = IncrementalRollup(
        spark, src, f"{root}/rollup", ["source", "line"],
        ["occ", "doc_id"], transform=to_lines,
    )
    ru.refresh()
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    ru.refresh()
    return (
        ru.read()
        .select(
            "source",
            "line",
            F.col("cnt").cast("bigint").alias("n_docs"),
            F.col("sum_occ").cast("bigint").alias("n_occ"),
            F.col("min_doc_id").cast("bigint").alias("canonical_doc"),
        )
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occ").desc(), "source", "line"
        )
        .limit(20)
    )


_KFOLDS = 5
_FOLD_SQL = (
    "(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT"
    f" % {_KFOLDS})"
)


@register(
    "sample_kfold_assign",
    f"""
    WITH f AS (
      SELECT {_FOLD_SQL} AS fold, o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(p) AS DOUBLE) AS total_price
    FROM f GROUP BY fold
    """,
)
def sample_kfold_assign(spark, sf_dir):
    """k-fold cross-validation assignment ({_KFOLDS} folds) by content
    hash of the order key — the evaluation-side sibling of
    hash_split: reproducible across runs, engines and partitionings
    (fold i's eval set is identical on every rerun, so CV scores are
    comparable across experiments), and keyed on the JOIN key so
    lineitem folded on l_orderkey stays referentially aligned with
    its orders. The per-fold report (row count, customer reach,
    DECIMAL-exact money mass) is the balance check run before
    trusting the folds.

    Shape at scale: a pure scan projection plus one {_KFOLDS}-group
    aggregate — fold assignment itself never shuffles, which is the
    property that lets CV run as {_KFOLDS} filtered passes over the
    same scan."""
    from dmds_spark.operators.sampling import hash_bucket

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    f = o.select(
        hash_bucket(F.col("o_orderkey"), _KFOLDS).alias("fold"),
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    return f.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.sum("p").cast("double").alias("total_price"),
    )
