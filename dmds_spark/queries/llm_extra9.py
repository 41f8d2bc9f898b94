"""Round-6 queries, batch one: incremental corpus-vs-history dedup —
the production shape a growing pretraining corpus actually needs
(dedup the day's crawl against everything already ingested without
re-signaturing the corpus), proven equal to the full recompute by the
driver's oracle hash-compare.

Registered LAST in queries/__init__._load so these queue behind the
round-5 never-checked set at the front of the driver's 50-query
window.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.llm_dedup import (
    BANDS,
    CAND_CTE,
    EST_SQL,
    K_SHINGLE,
    NUM_HASHES,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _scratch(sf_dir: str, kind: str) -> str:
    """Per-invocation scratch dir under .scratch/ (gitignored), same
    discipline as dmds_crud_snapshot / rollup_incremental_orders:
    never shared between concurrent evaluations."""
    return os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        ".scratch", kind,
        os.path.basename(sf_dir.rstrip("/")) + "_" + uuid.uuid4().hex[:12],
    )


# ---------------------------------------------------------------------------
# incremental corpus-vs-history MinHash dedup, oracle-checked end to end
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_minhash",
    CAND_CTE
    + f"""
    SELECT id_a, id_b, {EST_SQL} AS jaccard_est
    FROM cand WHERE {EST_SQL} >= 0.5
    """,
)
def dedup_incremental_minhash(spark, sf_dir):
    """Incremental near-dup maintenance proven against the oracle:
    seed an append-only corpus with half of documents, ingest
    (signatures computed + banded-joined against nothing), append the
    other half as new files, ingest again (ONLY the new half is
    signatured; candidates come from one band join of the new batch
    against store+batch) — and return the accumulated pair set. The
    oracle states the FULL-corpus MinHash LSH pairs declaratively
    (identical SQL to dedup_minhash_pairs, hash-green since round 2),
    so the driver's hash-compare certifies increment-union == full
    recompute — the corpus-vs-history correctness claim, end to end.

    Shape at scale: each increment is O(new) signature work plus one
    id-only band equi-join against the signature store (appended,
    never rewritten — operators/incremental_dedup.py docstring);
    reference analogue: the dirty-chunk incremental flush,
    tokio-fs/src/lib.rs:207-235."""
    from dmds_spark.operators.incremental_dedup import IncrementalMinHashDedup

    root = _scratch(sf_dir, "inc_dedup")
    src = f"{root}/src"
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
    store = IncrementalMinHashDedup(
        spark, src, f"{root}/store", "text", "doc_id",
        NUM_HASHES, BANDS, K_SHINGLE, 0.5,
    )
    store.refresh()
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    store.refresh()
    return store.pairs().select("id_a", "id_b", "jaccard_est")
