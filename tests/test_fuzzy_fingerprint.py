"""Fuzzy-fingerprint record linkage: the md5 and xxhash64 blocking
variants are one-hash MinHash samplers of the same ground truth — on
the shared candidates they must agree exactly, every emitted pair must
be a true near-dup (present in the brute-force ground truth), and each
variant's recall on the test corpus is pinned so a blocking regression
(or a hash change silently shrinking buckets) shows up as a number."""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"
MAX_DIST = 50


def _pairs(df):
    return {(r["id_a"], r["id_b"]): r["edit_distance"] for r in df.collect()}


def _ground_truth(spark):
    """Brute-force: every doc pair within the length band, thresholded
    Levenshtein <= 50. O(n^2) DPs — test-corpus only."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", F.length("text").alias("ln")
    )
    a = d.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("ta"),
        F.col("ln").alias("la"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("tb"),
        F.col("ln").alias("lb"),
    )
    return _pairs(
        a.join(b, (F.col("id_a") < F.col("id_b"))
               & (F.abs(F.col("la") - F.col("lb")) <= MAX_DIST))
        .select(
            "id_a", "id_b",
            F.levenshtein("ta", "tb", MAX_DIST).cast("long")
            .alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )


def test_variants_agree_on_shared_pairs_and_recall_pinned(spark):
    qs = all_queries()
    truth = _ground_truth(spark)
    md5 = _pairs(qs["dedup_fuzzy_fingerprint_pairs"](spark, SF))
    xxh = _pairs(qs["dedup_fuzzy_fingerprint_pairs_fast"](spark, SF))

    # no false positives: every emitted pair is in the ground truth
    # with the exact same edit distance (the verify stage is shared
    # and deterministic)
    for got in (md5, xxh):
        assert set(got) <= set(truth)
        assert all(truth[k] == v for k, v in got.items())

    # shared candidates agree exactly
    shared = set(md5) & set(xxh)
    assert all(md5[k] == xxh[k] for k in shared)

    # recall pins on this corpus (blocking is a one-hash MinHash
    # sample, so neither variant is complete; these numbers moving
    # means the blocking changed, not cosmetics). Exact counts pinned
    # because every input and hash is deterministic.
    assert len(truth) >= len(xxh) >= len(md5) >= 25
    assert len(md5) == 28 and len(xxh) == 32, (len(md5), len(xxh))
    assert len(shared) == 27
    # measured recall on this corpus: 28/208 (13.5%) md5, 32/208
    # (15.4%) xxh — ONE min-gram fingerprint is a genuinely low-recall
    # blocker on templated text (it only pairs docs whose gram sets'
    # single hash-min coincides). The MinHash LSH pipeline with 16
    # hashes/4 bands is the recall path; this operator is the cheap
    # screen. Pinned so the trade-off stays visible.
    assert len(truth) == 208
    assert len(md5) / len(truth) >= 0.10
    assert len(xxh) / len(truth) >= 0.10
