"""Round-15 queries: store-lifecycle completions — the postings
store's staged ANALYZER migration (the text-side twin of the IVF
store's quantizer retrain) and the incrementally-maintained
survivorship (golden record) store.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@register(
    "rollup_postings_retokenize",
    """
    WITH tok0 AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
    ), tok AS (
      SELECT doc_id, substr(t, 1, 3) AS term FROM tok0
    ),
    tf AS (
      SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY doc_id)) AS postings_md5
    FROM tf GROUP BY term
    """,
)
def rollup_postings_retokenize(spark, sf_dir):
    """Staged analyzer migration of the maintained inverted index
    (operators/incremental_postings.py retokenize — the text-side twin
    of rollup_ivf_retrain): build the store with the whitespace
    analyzer over two committed increments, migrate BOTH to the
    ``stem3`` analyzer (each increment re-derived from its recorded
    source files into ``batch-v{N}@av2`` dirs while the old generation
    keeps serving, then ONE atomic pointer flip), then ingest a THIRD
    increment — which must tokenize with the post-flip analyzer. The
    oracle states the end state declaratively: the full single-pass
    stem3 index over the whole corpus, so the hash-compare certifies
    migrated-increments ∪ post-migration-increment == fresh rebuild
    under the new analyzer.

    Shape at scale: the migration is O(store) — each increment is ONE
    tokenize scan of its own source files and a term-bucket-partitioned
    write; nothing global, no downtime (readers on the old generation
    until the flip), replay marks preserved because version identity
    is preserved. The directory rollup is the standard one-hash-agg
    term census (collect bounded by df)."""
    from dmds_spark.core.scratch import scratch_dir
    from dmds_spark.operators.incremental_postings import (
        IncrementalPostingsIndex,
    )

    root = scratch_dir("postings_retok", sf_dir)
    src = f"{root}/src"
    d = _docs(spark, sf_dir).select("doc_id", "text")
    idx = IncrementalPostingsIndex(
        spark, src, f"{root}/store", "doc_id", "text"
    )
    d.filter(F.col("doc_id") % 3 == 0).write.parquet(src)
    idx.refresh()
    d.filter(F.col("doc_id") % 3 == 1).write.mode("append").parquet(src)
    idx.refresh()
    idx.retokenize("stem3")  # migrate both committed increments
    d.filter(F.col("doc_id") % 3 == 2).write.mode("append").parquet(src)
    idx.refresh()  # post-flip increment: must use the NEW analyzer
    return idx.term_directory()
