"""Semantic invariants of the round-9 SFT / retrieval / curriculum
family, beyond the DuckDB hash equality the oracle gate already pins:

- ntile_from_group_rank is bit-identical to NTILE(k) OVER (PARTITION
  BY g ORDER BY ...) for adversarial group sizes (n < k, n % k != 0,
  ties broken by key), with the sharded rank path FORCED.
- loss-mask spans slice the packed conversation string to exactly the
  assistant pieces (the packer and the masker agree byte-for-byte).
- budget truncation keeps the MAXIMAL suffix: kept tokens fit the
  budget and adding the next-older turn would exceed it.
- per-epoch shuffle order is a permutation (positions 1..N each
  epoch) and epochs are actually reshuffled relative to each other.
- preference pairs: chosen strictly outscores rejected and both turns
  exist in the conversation as assistant turns.
- the fixed-point rational BM25 ranks exactly like the textbook float
  form (k1=1.2, b=0.75, rational idf) on real data.
- linear interpolation passes observed rows through, stays between
  its neighbors, and equals the truncated integer line exactly.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _qs():
    return all_queries()


# ---------------------------------------------------------------------------
# ntile_from_group_rank == NTILE window, sharded rank forced
# ---------------------------------------------------------------------------


def test_group_ntile_matches_window(spark):
    from dmds_spark.operators.relational import (
        ntile_from_group_rank,
        sharded_exclusive_cumsum,
    )

    # group sizes 1..9 (below, at, and above k; remainders of every
    # class), deterministic values with ties
    rows = []
    rid = 0
    for g, size in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 40, 41]):
        for i in range(size):
            rows.append((f"g{g}", rid, (rid * 37) % 7))
            rid += 1
    df = spark.createDataFrame(rows, ["g", "id", "v"])

    for k in (2, 3, 4, 5):
        one = df.withColumn("__one", F.lit(1).cast("long"))
        r = sharded_exclusive_cumsum(
            one, "g", ["v", "id"], "__one", out="__r", num_ranges=5
        )
        n = df.groupBy("g").agg(F.count(F.lit(1)).alias("__n"))
        got = {
            (row["g"], row["id"]): row["t"]
            for row in r.join(F.broadcast(n), "g")
            .select(
                "g",
                "id",
                ntile_from_group_rank(F.col("__r"), F.col("__n"), k).alias(
                    "t"
                ),
            )
            .collect()
        }
        want = {
            (row["g"], row["id"]): row["t"]
            for row in df.select(
                "g",
                "id",
                F.ntile(k)
                .over(W.partitionBy("g").orderBy("v", "id"))
                .cast("bigint")
                .alias("t"),
            ).collect()
        }
        assert got == want, f"k={k}"


# ---------------------------------------------------------------------------
# packer / masker byte agreement
# ---------------------------------------------------------------------------


def test_loss_mask_spans_slice_assistant_pieces(spark):
    from dmds_spark.queries.round9b import _conv

    qs = _qs()
    spans = {
        (r["conv_id"], r["turn"]): (r["start_char"], r["end_char"])
        for r in qs["sft_loss_mask_spans"](spark, SF).collect()
    }
    conv = {
        (r["conv_id"], r["turn"]): (r["role"], r["text"])
        for r in _conv(spark, SF).collect()
    }
    # rebuild each packed string exactly as sft_pack_conversations does
    packed: dict[int, str] = {}
    for (cid, turn) in sorted(conv):
        role, text = conv[(cid, turn)]
        piece = f"<|{role}|>{text}"
        packed[cid] = packed.get(cid, "") + ("\n" if cid in packed else "") + piece
    assert spans, "no assistant spans at sf0.001?"
    for (cid, turn), (lo, hi) in spans.items():
        role, text = conv[(cid, turn)]
        assert role == "assistant"
        assert packed[cid][lo:hi] == f"<|{role}|>{text}"


def test_pack_md5_matches_rebuilt_string(spark):
    import hashlib

    from dmds_spark.queries.round9b import _conv

    qs = _qs()
    got = {
        r["conv_id"]: (r["packed_md5"], r["packed_len"])
        for r in qs["sft_pack_conversations"](spark, SF).collect()
    }
    conv = {}
    for r in _conv(spark, SF).collect():
        conv.setdefault(r["conv_id"], []).append(
            (r["turn"], f"<|{r['role']}|>{r['text']}")
        )
    for cid, pieces in conv.items():
        s = "\n".join(p for _, p in sorted(pieces))
        assert got[cid] == (hashlib.md5(s.encode()).hexdigest(), len(s)), cid


# ---------------------------------------------------------------------------
# truncation keeps the maximal suffix
# ---------------------------------------------------------------------------


def test_truncation_suffix_is_maximal(spark):
    from dmds_spark.queries.round9b import SFT_TOKEN_BUDGET, _conv

    qs = _qs()
    kept = {}
    for r in qs["sft_truncate_to_budget"](spark, SF).collect():
        kept.setdefault(r["conv_id"], {})[r["turn"]] = r["tok"]
    toks = {}
    for r in _conv(spark, SF).collect():
        toks.setdefault(r["conv_id"], {})[r["turn"]] = r["tok"]
    for cid, turns in toks.items():
        k = kept.get(cid, {})
        if k:
            # kept turns are a suffix of the conversation
            turn_list = sorted(turns)
            assert sorted(k) == turn_list[-len(k):], cid
            assert sum(k.values()) <= SFT_TOKEN_BUDGET, cid
        # maximality: one more (older) turn would blow the budget
        dropped = sorted(set(turns) - set(k))
        if dropped:
            nxt = turns[dropped[-1]] + sum(k.values())
            assert nxt > SFT_TOKEN_BUDGET, cid


# ---------------------------------------------------------------------------
# epoch shuffle: per-epoch permutation, epochs differ
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_permutation_and_reshuffles(spark):
    from dmds_spark.queries.round9c import N_EPOCHS

    qs = _qs()
    rows = qs["tokens_epoch_shuffle_order"](spark, SF).collect()
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["position"]
    assert sorted(by_epoch) == list(range(N_EPOCHS))
    n = len(by_epoch[0])
    orders = []
    for e, pos in by_epoch.items():
        assert sorted(pos.values()) == list(range(1, n + 1)), e
        orders.append(tuple(sorted(pos, key=pos.get)))
    # epochs are independent permutations — all distinct
    assert len(set(orders)) == N_EPOCHS


# ---------------------------------------------------------------------------
# preference pairs: margin real, turns are assistant turns of the conv
# ---------------------------------------------------------------------------


def test_preference_pairs_members_and_margin(spark):
    from dmds_spark.queries.round9b import _conv

    qs = _qs()
    pairs = qs["sft_preference_pairs"](spark, SF).collect()
    assert pairs, "no preference pairs at sf0.001?"
    roles = {
        (r["conv_id"], r["turn"]): r["role"]
        for r in _conv(spark, SF).collect()
    }
    for r in pairs:
        assert r["margin"] > 0
        assert r["chosen_turn"] != r["rejected_turn"]
        assert roles[(r["conv_id"], r["chosen_turn"])] == "assistant"
        assert roles[(r["conv_id"], r["rejected_turn"])] == "assistant"
        assert r["chosen_md5"] != r["rejected_md5"] or r["margin"] == 0


# ---------------------------------------------------------------------------
# BM25: the cleared-fraction algebra matches a straight float reference
# ---------------------------------------------------------------------------


def test_bm25_matches_float_reference_ranking(spark):
    """The rational fixed-point BM25 (22*tf*D / (10*tf*D + 3*D + 9*dl*N)
    etc.) must rank like the textbook float form with k1=1.2, b=0.75
    and the rational idf (2(N-df)+1)/(2df+1) — the fraction-clearing
    derivation, checked end to end on real data."""
    from dmds_spark.queries.round9b import BM25_TERMS, BM25_TOPK

    qs = _qs()
    got = [
        r["doc_id"]
        for r in qs["text_bm25_topk"](spark, SF)
        .orderBy("rnk")
        .collect()
    ]

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n_docs = len(docs)
    d_tot = sum(len(t) for t in docs.values())
    df = {
        term: sum(1 for t in docs.values() if term in t)
        for term in BM25_TERMS
    }
    k1, b = 1.2, 0.75
    scores = {}
    for doc_id, toks in docs.items():
        dl = len(toks)
        s = 0.0
        for term in BM25_TERMS:
            tf = toks.count(term)
            if tf == 0:
                continue
            idf = (2 * (n_docs - df[term]) + 1) / (2 * df[term] + 1)
            tfp = (tf * (k1 + 1)) / (
                tf + k1 * (1 - b) + k1 * b * dl * n_docs / d_tot
            )
            s += idf * tfp
        if s > 0:
            scores[doc_id] = s
    want = sorted(scores, key=lambda d: (-scores[d], d))[:BM25_TOPK]
    # fixed-point truncation can swap float-equal neighbors only; on
    # this corpus the ordering is strict, so require exact agreement
    assert got == want


# ---------------------------------------------------------------------------
# interpolation: pass-through, betweenness, boundary clamp
# ---------------------------------------------------------------------------


def test_interp_linear_bounds_and_passthrough(spark):
    qs = _qs()
    rows = qs["timeseries_interp_linear"](spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["hw"])
        obs = [(r["hw"], r["value_interp_c"]) for r in rs if r["observed"]]
        assert obs, t
        for r in rs:
            if r["observed"]:
                continue
            # neighbors in the observed sequence
            prev = max(
                ((h, v) for h, v in obs if h < r["hw"]), default=None
            )
            nxt = min(
                ((h, v) for h, v in obs if h > r["hw"]), default=None
            )
            if prev is None:
                assert r["value_interp_c"] == nxt[1], (t, r["hw"])
            elif nxt is None:
                assert r["value_interp_c"] == prev[1], (t, r["hw"])
            else:
                lo, hi = sorted((prev[1], nxt[1]))
                assert lo <= r["value_interp_c"] <= hi, (t, r["hw"])
                # exact truncated line between the neighbors
                num = (nxt[1] - prev[1]) * (r["hw"] - prev[0])
                den = nxt[0] - prev[0]
                q = abs(num) // den
                want = prev[1] + (q if num >= 0 else -q)
                assert r["value_interp_c"] == want, (t, r["hw"])


# ---------------------------------------------------------------------------
# SFT sequence packing: dense per-split prefix sums, splits never mix
# ---------------------------------------------------------------------------


def test_sft_sequence_packing_dense_and_split_pure(spark):
    from dmds_spark.queries.round9f import SEQ_LEN

    qs = _qs()
    rows = qs["sft_pack_training_sequences"](spark, SF).collect()
    assert rows
    by_split: dict[str, list] = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    for split, rs in by_split.items():
        rs.sort(key=lambda r: r["conv_id"])
        cb = 0
        for r in rs:
            # (seq_id, seq_offset) is exactly the running prefix sum —
            # dense concat-and-chunk, no gaps, reproducible layout
            assert (r["seq_id"], r["seq_offset"]) == divmod(cb, SEQ_LEN), (
                split,
                r["conv_id"],
            )
            cb += r["total_tok"]


# ---------------------------------------------------------------------------
# hypothesis sweep: group NTILE closed form vs the window, random shapes
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=97), min_size=1,
                   max_size=8),
    k=st.integers(min_value=1, max_value=7),
)
def test_group_ntile_random_shapes(spark, sizes, k):
    from dmds_spark.operators.relational import (
        ntile_from_group_rank,
        sharded_exclusive_cumsum,
    )

    rows, rid = [], 0
    for g, size in enumerate(sizes):
        for _ in range(size):
            rows.append((f"g{g}", rid, (rid * 61) % 5))
            rid += 1
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    one = df.withColumn("__one", F.lit(1).cast("long"))
    r = sharded_exclusive_cumsum(
        one, "g", ["v", "id"], "__one", out="__r", num_ranges=4
    )
    n = df.groupBy("g").agg(F.count(F.lit(1)).alias("__n"))
    got = {
        (row["g"], row["id"]): row["t"]
        for row in r.join(F.broadcast(n), "g").select(
            "g", "id",
            ntile_from_group_rank(F.col("__r"), F.col("__n"), k).alias("t"),
        ).collect()
    }
    want = {
        (row["g"], row["id"]): row["t"]
        for row in df.select(
            "g", "id",
            F.ntile(k).over(W.partitionBy("g").orderBy("v", "id"))
            .cast("bigint").alias("t"),
        ).collect()
    }
    assert got == want
