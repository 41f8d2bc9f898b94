"""Streaming benchmark decontamination: flag documents sharing a word
k-gram with a broadcast benchmark set AT INGEST, so contaminated
training data never lands in the corpus store (the batch
text_contamination_ngram / sft_decontaminate_convs gate moved to the
stream side).

Design for scale: the probe is STATELESS. Benchmarks are MBs (MMLU et
al. are thousands of rows), so the eval gram set broadcasts once to
every executor and each micro-batch is an embarrassingly-parallel
Arrow `mapInPandas` scan — no state store, no watermark bookkeeping,
no shuffle, works in append mode at any input rate. A stream-static
join would shuffle the exploded gram stream every micro-batch for the
same answer.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _doc_kgrams(text: str, k: int) -> set[str]:
    """Distinct word k-grams, identical to operators.dedup
    word_kgram_rows (whitespace split; < k words -> none)."""
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    }


def broadcast_gram_set(spark, eval_grams: Iterable[str]):
    """Broadcast a benchmark gram set once and return the handle, so a
    long-lived caller owns its lifetime: build the new probe, then
    ``old_handle.unpersist()`` to release the superseded gram set from
    the driver and executors (broadcasts are otherwise retained for the
    life of the SparkContext)."""
    return spark.sparkContext.broadcast(frozenset(eval_grams))


def contamination_probe(
    docs: DataFrame,
    eval_grams: Iterable[str],
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_clean: bool = False,
) -> DataFrame:
    """Per-document contamination flags for a (streaming or batch)
    document frame: ``(id_col, n_shared)`` where ``n_shared`` counts
    DISTINCT benchmark k-grams the document contains (a doc repeating
    one eval gram 50x counts once — same dedup-before-count contract
    as the batch probe). By default only contaminated documents are
    emitted (the drop list); ``keep_clean=True`` emits every document
    with its count (the audit view).

    ``eval_grams`` is materialized to a frozenset on the driver and
    broadcast once PER CALL, and the broadcast lives until the
    SparkContext does — a long-lived ingest service that rebuilds the
    probe on every benchmark refresh would accumulate dead gram sets on
    the driver and executors. Such callers should create the broadcast
    themselves via :func:`broadcast_gram_set`, pass it here (a
    ``Broadcast`` is accepted directly), and ``unpersist()`` the old
    handle after swapping in the refreshed probe. Works identically on
    ``readStream`` input (stateless projection -> append mode, no
    watermark) and on batch frames (the equivalence tests run both)."""
    from pyspark.broadcast import Broadcast

    if isinstance(eval_grams, Broadcast):
        bc = eval_grams
    else:
        bc = broadcast_gram_set(docs.sparkSession, eval_grams)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grams = bc.value
        for pdf in batches:
            # NULL text contributes no k-grams (astype(str) would turn
            # it into the literal word 'None' — diverging from the
            # batch twin, whose split(NULL) emits no rows)
            n = [
                len(_doc_kgrams(t, k) & grams) if isinstance(t, str) else 0
                for t in pdf[text_col]
            ]
            out = pd.DataFrame(
                {id_col: pdf[id_col], "n_shared": pd.Series(n, dtype="int64")}
            )
            if not keep_clean:
                out = out[out["n_shared"] > 0]
            yield out

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_shared long"
    return docs.select(id_col, text_col).mapInPandas(probe, schema)
