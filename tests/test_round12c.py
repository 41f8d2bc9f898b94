"""Round-12c pins: LM scoring stays window-free with broadcast model
joins, the bigram extractor guards short docs, and the boolean
retrieval answer equals a direct containment scan."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dmds_spark.plans import broadcast_join_count, physical_plan
from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_bigram_guard_short_docs(spark):
    from dmds_spark.queries.round12c import _bigrams

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="one"),
         Row(doc_id=3, text="a b c")]
    )
    rows = {(r["doc_id"], r["w1"], r["w2"]) for r in _bigrams(docs).collect()}
    assert rows == {(3, "a", "b"), (3, "b", "c")}


def test_lm_score_plan_shape(spark):
    """Model joins must broadcast at test scale (vocab-sized tables)
    and the scoring stream must never hit a window sort."""
    q = all_queries()["text_lm_score_docs"]
    df = q(spark, SF)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert broadcast_join_count(df) >= 3  # c1, c2, backoff-unigram, total


def test_boolean_retrieval_matches_direct_scan(spark):
    q = all_queries()["text_boolean_retrieval"]
    got = {r["doc_id"] for r in q(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split("text", " ")
    direct = {
        r["doc_id"]
        for r in docs.filter(
            F.array_contains(toks, "hash")
            & F.array_contains(toks, "join")
            & F.array_contains(toks, "scan")
        ).collect()
    }
    assert got == direct and got


def test_postings_df_cf_consistency(spark):
    """df <= cf per term, and the cf total equals the corpus token
    count (the index loses nothing)."""
    q = all_queries()["text_inverted_postings"]
    rows = q(spark, SF).collect()
    assert all(r["df"] <= r["cf"] for r in rows)
    total = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert sum(r["cf"] for r in rows) == total
