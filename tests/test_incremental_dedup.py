"""Incremental corpus-vs-history MinHash dedup: the union of
per-increment pair sets must EQUAL a full-corpus recompute (signatures
per-doc deterministic; every pair emitted by the increment that saw
its second member), each increment must signature ONLY the new batch,
and the streaming foreachBatch twin must land on the same pair set,
replay-safe by batch id."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.dedup import dedup_minhash
from dmds_spark.operators.incremental_dedup import IncrementalMinHashDedup

SF = "/root/testdata/sf0.001"
NH, B, K, T = 16, 4, 3, 0.5


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard_est"], 9))
        for r in df.collect()
    }


@pytest.fixture()
def full(spark):
    return _pairs(dedup_minhash(_docs(spark), "text", "doc_id", NH, B, T))


def test_three_increments_equal_full_recompute(spark, tmp_path, full):
    docs = _docs(spark)
    src = str(tmp_path / "src")
    store = IncrementalMinHashDedup(
        spark, src, str(tmp_path / "store"), "text", "doc_id", NH, B, K, T
    )
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(src)
    assert store.refresh()["new_files"] >= 1
    docs.filter(F.col("doc_id") % 3 == 1).write.mode("append").parquet(src)
    store.refresh()
    # no-op refresh: nothing new to signature
    assert store.refresh()["new_files"] == 0
    docs.filter(F.col("doc_id") % 3 == 2).write.mode("append").parquet(src)
    store.refresh()
    assert _pairs(store.pairs()) == full
    # signature store holds each ingested doc exactly once
    n_docs_sig = store.signatures().count()
    assert (
        store.signatures().select("doc_id").distinct().count() == n_docs_sig
    )


def test_increment_signatures_only_new_batch(spark, tmp_path):
    """The O(new) claim: after the second refresh, the second version's
    signature file contains ONLY the second batch's docs (the first
    batch was not re-signatured)."""
    docs = _docs(spark)
    src = str(tmp_path / "src")
    sdir = str(tmp_path / "store")
    store = IncrementalMinHashDedup(
        spark, src, sdir, "text", "doc_id", NH, B, K, T
    )
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
    store.refresh()
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    store.refresh()
    v2_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sdir}/sigs/batch-v2").collect()
    }
    assert v2_ids and all(i % 2 == 1 for i in v2_ids)
    st = json.load(open(f"{sdir}/_current.json"))
    assert st["versions"] == [1, 2]


def test_stream_foreach_batch_twin_matches_batch(spark, tmp_path, full):
    """Drive the index from a real micro-batched stream (one file per
    trigger): the accumulated pairs must equal the full-corpus batch
    recompute, and a replayed batch id must be a no-op."""
    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    store = IncrementalMinHashDedup(
        spark, None, str(tmp_path / "store"), "text", "doc_id", NH, B, K, T
    )
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part-*.parquet")
    )
    q = (
        sdf.writeStream.foreachBatch(store.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _pairs(store.pairs()) == full
    st = json.load(open(f"{tmp_path}/store/_current.json"))
    out = store.fold_batch(spark.read.parquet(src), batch_id=0)
    assert out["skipped"] is True
    assert st["versions"] == json.load(
        open(f"{tmp_path}/store/_current.json")
    )["versions"]
    assert _pairs(store.pairs()) == full
