"""Span-level exact-substring dedup: hand-computable toy-corpus
answers for every span query (the driver oracle checks engine
agreement; these pin the SEMANTICS against a by-hand count), plus the
recall report's exact-truth machinery on a corpus with known
near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from dmds_spark.queries import all_queries


@pytest.fixture(scope="module")
def toy_sf(spark, tmp_path_factory):
    """A documents.parquet whose span structure is hand-countable:
    docs 0 and 1 share exactly ONE 8-gram ('a b c d e f g h'), doc 2
    is untouched."""
    d = str(tmp_path_factory.mktemp("toy"))
    rows = [
        (0, "srcA", "a b c d e f g h x y z"),
        (1, "srcA", "p q a b c d e f g h r"),
        (2, "srcB", "m n o p2 q2 r2 s2 t2 u2 v2"),
    ]
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.parquet(
        f"{d}/documents.parquet"
    )
    return d


def test_repeated_spans_hand_count(spark, toy_sf):
    got = all_queries()["dedup_repeated_ngram_spans"](spark, toy_sf).collect()
    assert [(r["gram"], r["n_docs"], r["n_occ"]) for r in got] == [
        ("a b c d e f g h", 2, 2)
    ]


def test_span_fraction_hand_count(spark, toy_sf):
    got = {
        r["source"]: (r["total_grams"], r["dup_grams"])
        for r in all_queries()["dedup_duplicated_span_fraction"](
            spark, toy_sf
        ).collect()
    }
    # doc0: 11 tokens -> 4 grams, 1 dup; doc1: 11 tokens -> 4 grams,
    # 1 dup; doc2 (srcB): 10 tokens -> 3 grams, 0 dup
    assert got == {"srcA": (8, 2), "srcB": (3, 0)}


def test_doc_dup_span_topk_hand_count(spark, toy_sf):
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_positions"])
        for r in all_queries()["dedup_doc_dup_span_topk"](
            spark, toy_sf
        ).collect()
    }
    assert got == {0: (4, 1), 1: (4, 1), 2: (3, 0)}


def test_span_coverage_hand_count(spark, toy_sf):
    got = {
        r["source"]: (r["total_tokens"], r["covered_tokens"])
        for r in all_queries()["dedup_span_coverage"](spark, toy_sf).collect()
    }
    # doc0's dup gram starts at pos 1 -> covers tokens 1..8 (8);
    # doc1's starts at pos 3 -> covers 3..10 (8); srcB untouched
    assert got == {"srcA": (22, 16), "srcB": (10, 0)}


def test_recall_truth_exact_on_known_neardups(spark, tmp_path):
    """Corpus with two engineered near-dup pairs: the inverted-index
    truth side must find exactly those pairs (true Jaccard >= 0.5) and
    the pipeline must recall them (recall = 1.0 on clean synthetic
    text — band recall only degrades near the threshold boundary)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, "s", base),
        (1, "s", base + " tail"),             # near-identical to 0
        (2, "s", "totally different words entirely here nothing shared"),
        (3, "s", "totally different words entirely here nothing shared ok"),
        (4, "s", "yet another unrelated document with its own token set"),
    ]
    d = str(tmp_path / "rc")
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.parquet(
        f"{d}/documents.parquet"
    )
    got = all_queries()["dedup_minhash_recall_report"](spark, d).collect()[0]
    assert got["n_truth"] == 2          # (0,1) and (2,3)
    assert got["recall"] == 1.0
    assert got["n_overlap"] == got["n_detected"] == 2


def test_span_rewrite_keep_first_hand_count(spark, toy_sf):
    """Keep-first: doc0 is canonical for the shared gram (min doc_id)
    and loses nothing; doc1 loses exactly the 8 covered tokens; srcB
    untouched."""
    got = {
        r["source"]: (r["removed_tokens"], r["kept_tokens"],
                      r["docs_rewritten"])
        for r in all_queries()["dedup_span_rewrite_stats"](
            spark, toy_sf
        ).collect()
    }
    assert got == {"srcA": (8, 14, 1), "srcB": (0, 10, 0)}
    # and the coverage upper bound dominates the keep-first removal
    cov = {
        r["source"]: r["covered_tokens"]
        for r in all_queries()["dedup_span_coverage"](spark, toy_sf).collect()
    }
    assert all(got[s][0] <= cov[s] for s in got)
