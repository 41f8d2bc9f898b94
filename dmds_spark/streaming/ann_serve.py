"""Streaming ANN serving over the maintained IVF index: probe each
micro-batch of query vectors against ``IncrementalIVFIndex`` and land
the per-query top-k durably — the online arm of the index the batch
``similarity_ivf_probe_sweep`` prices (same pattern as the streaming
contamination probe, streaming/decontaminate.py: the small side of the
problem — here the micro-batch of queries — is broadcast; the corpus
side is a pruned scan, never shuffled).

Design for scale: a micro-batch of queries is thousands of rows while
the index is the corpus, so each trigger costs ONE cell-pruned scan of
the assignment store (``search_batch``: per-query cell ranking against
the constant centroid matrix, union-of-probed-cells partition filter,
broadcast join + exact rerank). No state store is needed — the probe
is stateless per batch; the INDEX carries all the state, maintained by
its own ``foreach_batch`` ingest arm. Results land in per-batch
directories keyed by batch id, so at-least-once foreachBatch replay
overwrites the same directory instead of duplicating answers
(idempotent, same replay discipline as the index's fold_batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from dmds_spark.operators.incremental_ivf import IncrementalIVFIndex


def ann_probe_sink(
    index: IncrementalIVFIndex,
    out_dir: str,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    topk: int = 10,
    nprobe: int = 2,
):
    """``writeStream.foreachBatch`` sink: answer each micro-batch of
    query vectors from the maintained index. Each batch's top-k land
    in ``{out_dir}/probe-batch-{id}`` (replay-idempotent overwrite)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # idle trigger: nothing to answer, nothing to write
        index.search_batch(
            batch_df, qid_col, qvec_col, topk=topk, nprobe=nprobe
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"probe-batch-{batch_id}")
        )

    return _sink


def probe_results(
    spark, out_dir: str, id_col: str = "vec_id"
) -> DataFrame:
    """All answered probes so far: (qid, id_col, cluster, sim). A
    quiet stream that has answered nothing yet (only empty triggers so
    far) returns an EMPTY frame with the serving schema instead of
    failing the monitor with PATH_NOT_FOUND."""
    import glob

    if not glob.glob(os.path.join(out_dir, "probe-batch-*")):
        return spark.createDataFrame(
            [],
            f"qid bigint, {id_col} bigint, cluster int, sim double",
        )
    return spark.read.parquet(os.path.join(out_dir, "probe-batch-*"))
