"""Pigeonhole band blocking for SimHash: recall guarantees that prefix
blocking cannot give. Signatures are handcrafted so the test pins the
blocking logic itself, independent of tokenization."""

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.dedup import (
    simhash_band_keys,
    simhash_pairs_from_signatures,
)

BITS = 32


def _sig(flip_positions):
    """All-zero 32-bit string with 1s at the given positions."""
    bits = ["0"] * BITS
    for p in flip_positions:
        bits[p] = "1"
    return "".join(bits)


def _pairs(spark, sigs):
    sh = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], ["doc_id", "simhash"]
    )
    return {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs_from_signatures(
            sh, "doc_id", num_bits=BITS, max_hamming=3
        ).collect()
    }


def test_finds_pair_differing_in_prefix(spark):
    """A hamming-3 pair whose differing bits all sit in the first band
    (bits 0-7) — invisible to prefix blocking, found by pigeonhole
    banding because bands 1-3 still agree exactly."""
    got = _pairs(spark, [_sig([]), _sig([0, 1, 2])])
    assert got == {(0, 1): 3}


def test_finds_pair_spread_across_bands(spark):
    """Differences spread over 3 distinct bands: the 4th band agrees."""
    got = _pairs(spark, [_sig([]), _sig([0, 9, 17])])
    assert got == {(0, 1): 3}


def test_rejects_beyond_max_hamming(spark):
    """Hamming 4 with one flip per band: blocked candidates exist (no
    band agrees -> actually every band differs by exactly one bit, so
    NO band agrees and the pair is not even a candidate — and if it
    were, the verify would drop it)."""
    got = _pairs(spark, [_sig([]), _sig([0, 8, 16, 24])])
    assert got == {}


def test_hamming4_same_band_not_reported(spark):
    """Hamming 4 concentrated in one band: candidate (other bands
    agree) but the exact verify rejects it."""
    got = _pairs(spark, [_sig([]), _sig([0, 1, 2, 3])])
    assert got == {}


def test_duplicate_band_hits_deduped(spark):
    """Identical signatures share all 4 bands; the pair must appear
    once, not four times."""
    got = _pairs(spark, [_sig([5]), _sig([5])])
    assert got == {(0, 1): 0}


def test_band_keys_shape(spark):
    df = spark.createDataFrame([("0" * 16 + "1" * 16,)], ["simhash"])
    row = df.select(
        simhash_band_keys(F.col("simhash"), 32, 4).alias("k")
    ).head()
    assert row.k == ["0:00000000", "1:00000000", "2:11111111", "3:11111111"]


def test_bands_must_divide_bits(spark):
    df = spark.createDataFrame([("0" * 30,)], ["simhash"])
    with pytest.raises(ValueError):
        df.select(simhash_band_keys(F.col("simhash"), 30, 4))


def test_property_recall_random_signatures(spark):
    """Property: EVERY pair within hamming <= 3 is found, whatever the
    bit pattern (pigeonhole guarantee) — checked over a deterministic
    pseudo-random batch in one Spark job."""
    import random

    rng = random.Random(42)
    sigs, expected = [], {}
    base_id = 0
    for _ in range(40):
        a = [rng.randint(0, 1) for _ in range(BITS)]
        d = rng.randint(0, 3)
        flip = rng.sample(range(BITS), d)
        b = [bit ^ (1 if i in flip else 0) for i, bit in enumerate(a)]
        sigs.append("".join(map(str, a)))
        sigs.append("".join(map(str, b)))
        expected[(base_id, base_id + 1)] = d
        base_id += 2
    sh = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], ["doc_id", "simhash"]
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs_from_signatures(
            sh, "doc_id", num_bits=BITS, max_hamming=3
        ).collect()
    }
    # every constructed pair must be present with the exact distance
    for pair, d in expected.items():
        assert got.get(pair) == d, (pair, d, got.get(pair))


def test_column_form_matches_operator_pipeline(spark):
    """functions.text.simhash_bits (the per-row composable Column form)
    must produce the same signatures as the operator pipeline's
    explode/aggregate form, and hamming_distance_bitstrings must agree
    with the bit_count(xor) fast path."""
    from dmds_spark.functions.text import (
        hamming_distance_bitstrings,
        simhash_bits,
        words,
    )
    from dmds_spark.operators.dedup import simhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    per_row = docs.select(
        "doc_id", simhash_bits(words("text"), 32).alias("simhash")
    )
    pipeline = simhash_signatures(docs, "text", "doc_id", 32)
    a = {r["doc_id"]: r["simhash"] for r in per_row.collect()}
    b = {r["doc_id"]: r["simhash"] for r in pipeline.collect()}
    assert a == b

    pairs = spark.createDataFrame(
        [("0" * 32, "0" * 32), ("0" * 31 + "1", "1" + "0" * 31),
         ("01" * 16, "10" * 16)],
        ["sh_a", "sh_b"],
    )
    got = pairs.select(
        hamming_distance_bitstrings(F.col("sh_a"), F.col("sh_b"), 32).alias("h"),
        F.bit_count(
            F.conv("sh_a", 2, 10).cast("long").bitwiseXOR(
                F.conv("sh_b", 2, 10).cast("long")
            )
        ).alias("h2"),
    ).collect()
    assert [(r.h, r.h2) for r in got] == [(0, 0), (2, 2), (32, 32)]
