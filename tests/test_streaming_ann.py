"""Streaming ANN serving (streaming/ann_serve.py): a real
micro-batched query stream probed against the maintained IVF index
must answer exactly what the batch probe answers, and the batch probe
must equal a per-query search() loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.incremental_ivf import IncrementalIVFIndex
from dmds_spark.streaming.ann_serve import ann_probe_sink, probe_results

SF = "/root/testdata/sf0.001"
TOPK, NPROBE = 5, 2


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def idx(spark, emb, tmp_path_factory):
    idx = IncrementalIVFIndex(
        spark,
        None,
        str(tmp_path_factory.mktemp("ivf") / "store"),
        "vec_id",
        "embedding",
    )
    rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    idx.set_centroids([list(r["embedding"]) for r in rows])
    idx.fold_batch(emb, 0)
    return idx


def _queries(emb):
    return emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def _hits(df):
    return sorted(
        (r["qid"], r["vec_id"], r["cluster"], round(r["sim"], 9))
        for r in df.collect()
    )


def test_search_batch_equals_search_loop(spark, emb, idx):
    got = _hits(idx.search_batch(_queries(emb), topk=TOPK, nprobe=NPROBE))
    want = []
    for q in _queries(emb).collect():
        for r in idx.search(
            list(q["qvec"]), topk=TOPK, nprobe=NPROBE
        ).collect():
            want.append(
                (q["qid"], r["vec_id"], r["cluster"], round(r["sim"], 9))
            )
    assert got == sorted(want)


def test_stream_probe_matches_batch(spark, emb, idx, tmp_path):
    """Two real micro-batches of query vectors through foreachBatch
    answer the same top-k as one batch probe over all queries."""
    src = str(tmp_path / "qsrc")
    out = str(tmp_path / "answers")
    q = _queries(emb)
    q.filter(F.col("qid") % 2 == 0).coalesce(1).write.parquet(src)
    q.filter(F.col("qid") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part-*.parquet")
    )
    sq = (
        sdf.writeStream.foreachBatch(
            ann_probe_sink(idx, out, topk=TOPK, nprobe=NPROBE)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)

    import glob

    batch_dirs = glob.glob(f"{out}/probe-batch-*")
    assert len(batch_dirs) == 2  # two triggers, one answer dir each
    got = _hits(probe_results(spark, out))
    want = _hits(idx.search_batch(q, topk=TOPK, nprobe=NPROBE))
    assert got == want and len(got) == 6 * TOPK
