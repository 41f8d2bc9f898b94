"""Streaming contamination probe: stream == batch equivalence against
the SQL-composed probe used by pipeline_sft_corpus, plus the contract
details (distinct-before-count, keep_clean audit view, short docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dmds_spark.streaming import contamination_probe, run_stream_to_memory

SF = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docs_stream"))
    spark.read.parquet(f"{SF}/documents.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


@pytest.fixture(scope="module")
def eval_grams(spark, docs_dir):
    """Benchmark gram set: 8-grams of the conv_id % 50 == 0 slice
    (exactly pipeline_sft_corpus's eval side)."""
    from dmds_spark.operators.dedup import word_kgram_rows

    d = spark.read.parquet(docs_dir)
    sh = word_kgram_rows(d, "text", "doc_id", K, col="sh")
    ev = (
        sh.filter(F.pmod(F.expr("doc_id DIV 8"), F.lit(50)) == 0)
        .select("sh")
        .distinct()
    )
    return [r["sh"] for r in ev.collect()]


def _batch_truth(spark, docs_dir, eval_grams):
    from dmds_spark.operators.dedup import word_kgram_rows

    d = spark.read.parquet(docs_dir)
    sh = word_kgram_rows(d, "text", "doc_id", K, col="sh").select(
        "doc_id", "sh"
    ).distinct()
    ev = spark.createDataFrame([(g,) for g in eval_grams], ["sh"])
    return (
        sh.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def canon(df):
    return sorted((r["doc_id"], r["n_shared"]) for r in df.collect())


def test_stream_matches_batch_probe(spark, docs_dir, eval_grams):
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    flagged = contamination_probe(stream, eval_grams, k=K)
    got = run_stream_to_memory(flagged, "contam_eq", output_mode="append")
    want = _batch_truth(spark, docs_dir, eval_grams)
    assert canon(got) == canon(want)
    assert got.count() > 0, "fixture produced no contaminated docs"


def test_batch_mode_and_keep_clean(spark, docs_dir, eval_grams):
    d = spark.read.parquet(docs_dir)
    flagged = contamination_probe(d, eval_grams, k=K)
    audit = contamination_probe(d, eval_grams, k=K, keep_clean=True)
    assert audit.count() == d.count()
    assert canon(flagged) == canon(audit.filter(F.col("n_shared") > 0))
    # distinct-before-count: every count is bounded by the doc's
    # distinct gram count
    from dmds_spark.operators.dedup import word_kgram_rows

    per_doc = (
        word_kgram_rows(d, "text", "doc_id", K, col="sh")
        .select("doc_id", "sh")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    joined = flagged.join(per_doc, "doc_id")
    assert joined.filter(F.col("n_shared") > F.col("n_grams")).count() == 0


def test_short_docs_never_flag(spark, eval_grams):
    d = spark.createDataFrame(
        [(1, "too short"), (2, " ".join(["w"] * (K - 1)))],
        ["doc_id", "text"],
    )
    assert contamination_probe(d, eval_grams, k=K).count() == 0


def test_string_id_column(spark, eval_grams):
    """The output schema follows id_col's actual type (regression: it
    was hardcoded to long, crashing string/url-keyed corpora)."""
    d = spark.createDataFrame(
        [("u1", " ".join(eval_grams[0].split(" ") + ["tail"]))],
        ["url", "text"],
    )
    out = contamination_probe(d, eval_grams, k=K, id_col="url")
    assert dict(out.dtypes)["url"] == "string"
    assert canon_by(out, "url") == [("u1", 1)]


def canon_by(df, idc):
    return sorted((r[idc], r["n_shared"]) for r in df.collect())
