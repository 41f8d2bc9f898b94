"""Round-10 operator pins: the BPE training loop against a pure-Python
reference, zlib compression ratios bit-exact, the Bloom calibration's
zero-false-negative guarantee, and the Z-order tile invariant."""

import zlib

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BPE merge training vs pure-Python reference
# ---------------------------------------------------------------------------


def _bpe_reference(word_freqs, n_merges):
    """Sennrich-style BPE training over a {word: freq} table: count
    adjacent pairs corpus-weighted, take argmax with (count desc,
    pair asc) tie-break, merge greedily left-to-right."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for toks, f in vocab.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + f
                )
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        new_vocab = {}
        for toks, f in vocab.items():
            out = []
            for x in toks:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    from dmds_spark.queries.round10c import bpe_train_merges

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [
        (r["merge_rank"], r["a"], r["b"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=5).collect()
    ]
    wf = dict(
        duckdb.sql(
            f"""
            SELECT w, COUNT(*) FROM (
              SELECT UNNEST(string_split(text, ' ')) AS w
              FROM read_parquet('{SF}/documents.parquet')
            ) WHERE w != '' GROUP BY w
            """
        ).fetchall()
    )
    assert got == _bpe_reference(wf, 5)


def test_bpe_merged_symbol_pairs_in_later_rounds(spark):
    """A merged symbol must be eligible as a pair MEMBER in later
    rounds (multi-char symbols pair with neighbors) — the property
    that distinguishes real BPE from one-shot bigram counting."""
    from dmds_spark.queries.round10c import bpe_train_merges

    docs = spark.createDataFrame(
        [("aaab",)] * 10, "text string"
    )
    got = [
        (r["a"], r["b"], r["merged"])
        for r in bpe_train_merges(docs, n_merges=3).collect()
    ]
    # 'aaab': pairs (a,a)x2,(a,b) -> merge (a,a) => [aa,a,b];
    # round 2: (aa,a),(a,b) tie at 10 -> lexicographic: (a,b) wins;
    # round 3: [aa, ab] -> (aa, ab)
    assert got == [("a", "a", "aa"), ("a", "b", "ab"), ("aa", "ab", "aaab")]


# ---------------------------------------------------------------------------
# compression ratio: bit-exact zlib, null handling, ordering property
# ---------------------------------------------------------------------------


def test_compression_ratio_bit_exact(spark):
    from dmds_spark.queries.round10c import compression_ratio

    texts = ["ab" * 500, "the quick brown fox jumps over the lazy dog", None]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for i, t in enumerate(texts):
        if t is None:
            assert rows[i]["raw_len"] is None
            assert rows[i]["compression_ratio"] is None
        else:
            bs = t.encode("utf-8")
            assert rows[i]["raw_len"] == len(bs)
            assert rows[i]["comp_len"] == len(zlib.compress(bs, 6))
    # repetitive text compresses far better than prose
    assert rows[0]["compression_ratio"] < rows[1]["compression_ratio"]


def test_compression_ratio_no_shuffle(spark):
    """The signal is scan-pipelined: no exchange anywhere."""
    from dmds_spark.plans import shuffle_count
    from dmds_spark.queries import all_queries

    df = all_queries()["text_compression_ratio"](spark, SF)
    assert shuffle_count(df) == 0


# ---------------------------------------------------------------------------
# Bloom calibration guarantee + Z-order tile invariant
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from dmds_spark.queries import all_queries

    row = all_queries()["profile_bloom_prejoin_calibration"](
        spark, SF
    ).collect()[0]
    assert row["n_false_neg"] == 0
    assert row["n_bloom_pass"] >= row["n_members"]
    assert row["n_candidates"] == 3000


def test_zorder_buckets_are_64x64_tiles(spark):
    """bucket = zkey >> 12 is by construction a 64x64 Morton tile:
    every bucket's bounding box must fit one tile — the pruning
    property the layout buys."""
    from dmds_spark.queries import all_queries

    rows = all_queries()["layout_zorder_locality"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["max_x"] - r["min_x"] < 64, r
        assert r["max_y"] - r["min_y"] < 64, r
        assert r["bbox_area"] <= 4096, r


def test_jl_norm_preservation_in_expectation(spark):
    """JL lemma check on real data: the mean norm ratio over the
    corpus must sit near 1 (the per-vector ratios are oracle-pinned;
    this pins the distributional claim the projection exists for)."""
    from dmds_spark.queries import all_queries

    rows = all_queries()["embedding_jl_projection_calibration"](
        spark, SF
    ).collect()
    assert rows
    mean = sum(r["norm_ratio"] for r in rows) / len(rows)
    assert 0.8 < mean < 1.2, mean


def test_dsir_resample_subset_and_deterministic(spark):
    """The resample is a subset of the importance table, keeps only
    hash-accepted docs, and re-running yields the identical id set."""
    from dmds_spark.queries import all_queries

    qs = all_queries()
    kept1 = {r["doc_id"] for r in qs["sample_dsir_resample"](spark, SF).collect()}
    kept2 = {r["doc_id"] for r in qs["sample_dsir_resample"](spark, SF).collect()}
    allids = {r["doc_id"] for r in qs["sample_dsir_importance"](spark, SF).collect()}
    assert kept1 == kept2
    assert kept1 < allids
    assert kept1


def test_bpe_handles_quote_and_backslash_symbols(spark):
    """Merge symbols are interpolated into the fold expression as SQL
    literals — a corpus of quotes/backslashes must train cleanly and
    match the Python reference."""
    from dmds_spark.queries.round10c import bpe_train_merges

    docs = spark.createDataFrame([("'' '\\ ''",)] * 6, "text string")
    got = [
        (r["merge_rank"], r["a"], r["b"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=2).collect()
    ]
    wf = {"''": 12, "'\\": 6}
    assert got == _bpe_reference(wf, 2)


def test_bpe_apply_matches_python_reference(spark):
    """Train-then-apply round trip: the distributed apply of the
    learned merges must equal a pure-Python apply per document."""
    import pandas as pd

    from dmds_spark.queries.round10c import bpe_train_merges
    from dmds_spark.queries.round10h import bpe_apply_merges

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = [(r["a"], r["b"]) for r in bpe_train_merges(docs).collect()]
    got = {
        r["doc_id"]: (r["n_words"], r["n_symbols"])
        for r in bpe_apply_merges(docs, merges).collect()
    }

    pdf = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    for _, row in pdf.iterrows():
        words = [w for w in row["text"].split(" ") if w]
        total = 0
        for w in words:
            toks = list(w)
            for a, b in merges:
                out = []
                for x in toks:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                toks = out
            total += len(toks)
        assert got[row["doc_id"]] == (len(words), total), row["doc_id"]


def test_softdedup_cluster_mass_is_one(spark):
    """Every cluster's total weight must be exactly 1 (sum of k copies
    of 1/k — exact in binary only for power-of-two k, so allow one ulp
    per member), and singletons carry weight 1.0 exactly."""
    from dmds_spark.queries import all_queries

    rows = all_queries()["sample_softdedup_weights"](spark, SF).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        total = sum(m["weight"] for m in members)
        assert abs(total - 1.0) < 1e-12 * max(len(members), 1), cid
        if len(members) == 1:
            assert members[0]["weight"] == 1.0
            assert members[0]["cluster_size"] == 1
