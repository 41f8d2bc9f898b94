"""Deduplication operators for LLM training-data pipelines
(north star, SURVEY.md §2b): exact, MinHash+LSH, SimHash, n-gram
Jaccard. Every stage is DataFrame-native; hashes are md5-string
constructs so results are oracle-checkable in DuckDB
(functions/text.py).

Scale analysis (100 TB):
- exact dedup: one hash-shuffle on a 32-char key; map-side partial agg.
- MinHash LSH: signatures are per-row scans (no shuffle); the candidate
  join shuffles on (band, key) — fixed-width keys, skew bounded by
  bucket collision rate; AQE splits hot buckets. This is THE standard
  web-scale near-dup pipeline shape (the approxSimilarityJoin pattern).
- SimHash: per-row scan + self-join on band keys of the bit prefix.
- n-gram Jaccard: exact verify stage over LSH candidates only — never
  all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dmds_spark.functions.text import (
    hamming_distance_bitstrings,
    jaccard_exact,
    lsh_band_keys,
    minhash_jaccard_estimate,
    minhash_signature,
    simhash_bits,
    word_shingles,
    words,
)


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content hash."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(id, signature) for docs with at least k words."""
    sh = word_shingles(text_col, k)
    return (
        df.select(F.col(id_col), sh.alias("__shingles"))
        .filter(F.size("__shingles") > 0)
        .select(
            id_col, minhash_signature(F.col("__shingles"), num_hashes).alias("signature")
        )
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH band.
    The only shuffle is the equi-join on the exploded band key."""
    rows = num_hashes // bands
    banded = sigs.select(
        F.col(id_col),
        F.col("signature"),
        F.explode(lsh_band_keys(F.col("signature"), bands, rows)).alias("band_key"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"), "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"), "band_key"
    )
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )


def dedup_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs with estimated Jaccard >= threshold: shingle ->
    minhash -> band -> bucket-join -> estimate. Returns (id_a, id_b,
    jaccard_est)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    cand = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)
    est = minhash_jaccard_estimate(F.col("sig_a"), F.col("sig_b"), num_hashes)
    return (
        cand.withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def dedup_minhash_keep_first(
    df: DataFrame, text_col: str, id_col: str, **kw
) -> DataFrame:
    """Drop every doc that near-duplicates a lower-id doc (single-link,
    one LSH pass — the standard keep-canonical policy)."""
    pairs = dedup_minhash(df, text_col, id_col, **kw)
    doomed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(doomed, on=id_col, how="left_anti")


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_bits: int = 16,
    max_hamming: int = 3,
    prefix_bits: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: bitstring signature per doc, block on the
    bit prefix (docs within hamming distance d of each other agree on
    some prefix with good probability at these sizes), verify exact
    hamming <= max_hamming. Returns (id_a, id_b, hamming)."""
    sh = df.select(
        F.col(id_col), simhash_bits(words(text_col), num_bits).alias("simhash")
    )
    blocked = sh.withColumn("block", F.substring("simhash", 1, prefix_bits))
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block"
    )
    ham = hamming_distance_bitstrings(F.col("sh_a"), F.col("sh_b"), num_bits)
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (the
    verify stage after LSH): joins shingle sets back to (id_a, id_b)
    and keeps pairs with true Jaccard >= threshold."""
    sh = df.select(
        F.col(id_col), F.array_distinct(word_shingles(text_col, k)).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    j = jaccard_exact(F.col("sh_a"), F.col("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
