"""Invariant tests for the llm_extra2 training-pipeline queries —
semantic properties the DuckDB hash-compare can't express (the oracle
gate in test_oracle.py already covers value equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries.llm_extra2 import (
    EVAL_MOD,
    SEQ_LEN,
    sample_split_by_source,
    text_contamination_ngram,
    text_gopher_rules,
    tokens_pack_sequences,
)

from .conftest import SF_DIR_SMALL


def test_contamination_never_flags_eval_docs(spark):
    rows = text_contamination_ngram(spark, SF_DIR_SMALL).collect()
    assert rows, "synthetic corpus shares shingles; expect hits"
    for r in rows:
        assert r.doc_id % EVAL_MOD != 0
        assert r.n_shared >= 1


def test_packing_offsets_within_sequence(spark):
    out = tokens_pack_sequences(spark, SF_DIR_SMALL)
    bad = out.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= SEQ_LEN)
    ).count()
    assert bad == 0
    # every doc appears exactly once
    d = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    assert out.count() == d.count()


def test_packing_is_gapless_per_source(spark):
    """Within a source, doc k's start equals doc k-1's start + its
    token count (concat-and-chunk leaves no holes)."""
    out = tokens_pack_sequences(spark, SF_DIR_SMALL)
    start = F.col("seq_id") * SEQ_LEN + F.col("seq_offset")
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy("doc_id")
    chk = out.select(
        "source",
        "doc_id",
        "n_tokens",
        start.alias("start"),
        F.lag(start + F.col("n_tokens")).over(w).alias("prev_end"),
    )
    gaps = chk.filter(
        F.col("prev_end").isNotNull() & (F.col("start") != F.col("prev_end"))
    ).count()
    assert gaps == 0


def test_gopher_keep_consistent_with_metrics(spark):
    rows = text_gopher_rules(spark, SF_DIR_SMALL).collect()
    assert rows
    from dmds_spark.queries.llm_extra2 import (
        MAX_DUP_PM,
        MAX_MWL_C,
        MAX_WORDS,
        MIN_MWL_C,
        MIN_WORDS,
    )

    for r in rows:
        expect = (
            MIN_WORDS <= r.n_words <= MAX_WORDS
            and r.dup_pm <= MAX_DUP_PM
            and MIN_MWL_C <= r.mean_wlen_c <= MAX_MWL_C
            and r.stop_pm > 0
        )
        assert bool(r.keep) == expect, r


def test_group_split_has_no_source_straddle(spark):
    out = sample_split_by_source(spark, SF_DIR_SMALL)
    multi = (
        out.groupBy("source")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi == 0
    # all three splits exist over 20 sources w.h.p. — assert at least
    # train is non-empty and splits partition the corpus
    total = out.count()
    d = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    assert total == d.count()
    assert out.filter(F.col("split") == "train").count() > 0


def test_pretrain_corpus_excludes_eval_and_contaminated(spark):
    from dmds_spark.queries.llm_extra2 import (
        pipeline_pretrain_corpus,
        text_contamination_ngram,
        text_gopher_rules,
    )

    out = pipeline_pretrain_corpus(spark, SF_DIR_SMALL)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids, "some docs must survive"
    assert not any(i % EVAL_MOD == 0 for i in ids)
    cont = {
        r.doc_id
        for r in text_contamination_ngram(spark, SF_DIR_SMALL).collect()
    }
    assert not (ids & cont)
    keep = {
        r.doc_id
        for r in text_gopher_rules(spark, SF_DIR_SMALL)
        .filter("keep = 1")
        .collect()
    }
    assert ids <= keep
