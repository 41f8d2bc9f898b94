"""Round-7 batch nine: the span-dedup REWRITE accounting — keep-first
exact-substring dedup resolved to the tokens each non-canonical
document loses. dedup_span_coverage priced what COULD be removed
(every covered position); this prices what keep-first ACTUALLY
removes: the canonical (minimum doc_id) copy of every duplicated span
is retained, so a position drops only where some covering span already
exists in an earlier document. Oracle-checked, exact integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.llm_extra12 import _SPAN_N


@register(
    "dedup_span_rewrite_stats",
    f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, source, i AS pos,
             array_to_string(list_slice(t, i, i + {_SPAN_N - 1}), ' ') AS g
      FROM tok, UNNEST(range(1, len(t) - {_SPAN_N - 2})) AS u(i)
      WHERE len(t) >= {_SPAN_N}
    ), xd AS (
      SELECT g, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS canon
      FROM grams GROUP BY g
    ), removable AS (
      SELECT DISTINCT gr.doc_id, gr.source, gr.pos
      FROM grams gr JOIN xd ON xd.g = gr.g
      WHERE xd.n_docs >= 2 AND xd.canon < gr.doc_id
    ), cov AS (
      SELECT DISTINCT doc_id, source, pos + d AS p
      FROM removable, UNNEST(range(0, {_SPAN_N})) AS o(d)
    ), rem AS (
      SELECT source, COUNT(*) AS removed_tokens,
             COUNT(DISTINCT doc_id) AS docs_rewritten
      FROM cov GROUP BY source
    ), totals AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS total_tokens
      FROM documents GROUP BY source
    )
    SELECT t.source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(COALESCE(removed_tokens, 0) AS BIGINT) AS removed_tokens,
           CAST(total_tokens - COALESCE(removed_tokens, 0) AS BIGINT)
             AS kept_tokens,
           CAST(COALESCE(docs_rewritten, 0) AS BIGINT) AS docs_rewritten,
           CAST(CAST(COALESCE(removed_tokens, 0) AS DOUBLE)
                / total_tokens AS DOUBLE) AS removal_ratio
    FROM totals t LEFT JOIN rem ON rem.source = t.source
    ORDER BY t.source
    """,
)
def dedup_span_rewrite_stats(spark, sf_dir):
    """KEEP-FIRST span-dedup rewrite accounting: per source, the token
    positions an exact-substring rewrite actually strips when every
    duplicated 8-gram keeps its canonical (minimum doc_id) copy — a
    position is removed only where a covering span already exists in
    an EARLIER document, so every span survives somewhere and the
    canonical docs lose nothing. This is the AFTER number to
    dedup_span_coverage's upper bound; the gap between them is the
    mass keep-first preserves. (The rewrite itself is this predicate
    applied as a token filter — same joins, token emission instead of
    counting.)

    Shape at scale: identical skeleton to dedup_span_coverage — one
    g-partitioned gram-stream exchange feeding the per-gram
    stats/canonical aggregate and the occurrence re-join; only
    removable STARTS (a small fraction) fan out x{_SPAN_N} into
    covered positions, then two doc-keyed distincts. min(doc_id) as
    the canonical rule is one extra column in the same aggregate."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = d.select("doc_id", "source", F.split("text", " ").alias("t"))
    grams = (
        tok.filter(F.size("t") >= _SPAN_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {_SPAN_N - 1}),"
                    f" i -> struct(i as pos,"
                    f" concat_ws(' ', slice(t, i, {_SPAN_N})) as g))"
                )
            ).alias("s"),
        )
        .select("doc_id", "source", "s.pos", "s.g")
        .repartition("g")  # one exchange, two g-keyed consumers
    )
    xd = grams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("n_docs_g"),
        F.min("doc_id").alias("canon"),
    )
    removable = (
        grams.join(xd, "g")
        .filter((F.col("n_docs_g") >= 2) & (F.col("canon") < F.col("doc_id")))
        .select("doc_id", "source", "pos")
        .distinct()
    )
    cov = removable.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (_SPAN_N - 1))
        ).alias("p"),
    ).distinct()
    rem = cov.groupBy("source").agg(
        F.count(F.lit(1)).alias("removed_tokens"),
        F.countDistinct("doc_id").alias("docs_rewritten"),
    )
    totals = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).alias("total_tokens"),
    )
    return (
        totals.join(rem, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.coalesce("removed_tokens", F.lit(0)).cast("bigint")
            .alias("removed_tokens"),
            (
                F.col("total_tokens")
                - F.coalesce("removed_tokens", F.lit(0))
            )
            .cast("bigint")
            .alias("kept_tokens"),
            F.coalesce("docs_rewritten", F.lit(0)).cast("bigint")
            .alias("docs_rewritten"),
            (
                F.coalesce("removed_tokens", F.lit(0)).cast("double")
                / F.col("total_tokens")
            )
            .cast("double")
            .alias("removal_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# incremental span index: the rollup transform hook carrying the
# span-dedup grain (gram -> occurrence count + canonical doc)
# ---------------------------------------------------------------------------


@register(
    "rollup_incremental_spans",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             UNNEST([array_to_string(list_slice(t, i, i + {_SPAN_N - 1}), ' ')
                     for i in range(1, len(t) - {_SPAN_N - 2})]) AS g
      FROM tok WHERE len(t) >= {_SPAN_N}
    )
    SELECT g AS gram, CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
    FROM grams GROUP BY g
    ORDER BY n_occ DESC, gram LIMIT 20
    """,
)
def rollup_incremental_spans(spark, sf_dir):
    """An INCREMENTALLY MAINTAINED span index: the keep-first span
    dedup's per-gram state (occurrence count + canonical min doc_id)
    kept in sync with an append-only corpus by the generic
    IncrementalRollup — the new ``transform`` hook explodes each NEW
    batch of documents into its word-8-grams before the partial
    aggregate, so count (sum-decomposable) and canonical
    (min-decomposable) fold across increments exactly. Seed half the
    docs, refresh, append the other half, refresh again; the oracle
    states the FULL-corpus aggregate declaratively, so the hash-match
    certifies two O(new)-cost increments equal one full recompute —
    the nightly-crawl maintenance story for span dedup, same
    versioned-pointer crash discipline as rollup_incremental_orders.

    At 100 TB the group key becomes xxhash64(gram) (same note as
    _xdoc) and the stored index is what dedup_span_rewrite_stats joins
    against instead of recomputing the corpus."""
    import os
    from dmds_spark.core.scratch import scratch_dir
    from dmds_spark.operators.rollup import IncrementalRollup

    root = scratch_dir("spanroll", sf_dir)
    src = f"{root}/src"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def to_grams(df):
        tok = df.select("doc_id", F.split("text", " ").alias("t"))
        return tok.filter(F.size("t") >= _SPAN_N).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {_SPAN_N - 1}),"
                    f" i -> concat_ws(' ', slice(t, i, {_SPAN_N})))"
                )
            ).alias("gram"),
        )

    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
    ru = IncrementalRollup(
        spark, src, f"{root}/rollup", ["gram"], ["doc_id"],
        transform=to_grams,
    )
    ru.refresh()
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    ru.refresh()
    return (
        ru.read()
        .select(
            "gram",
            F.col("cnt").cast("bigint").alias("n_occ"),
            F.col("min_doc_id").cast("bigint").alias("canonical_doc"),
        )
        .orderBy(F.col("n_occ").desc(), "gram")
        .limit(20)
    )
