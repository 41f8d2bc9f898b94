"""Engine tests for the round-4 query batch (llm_extra3): edge-case
semantics the sf-data oracle comparison can't isolate."""

from pyspark.sql import functions as F

from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _qs():
    return all_queries()


def test_chunk_overlap_spans(spark):
    """Chunk math: starts every stride, last chunk truncated, every
    token covered, chunk_id dense from 0."""
    from dmds_spark.queries.llm_extra3 import CHUNK_STRIDE, CHUNK_TOKENS

    rows = _qs()["tokens_chunk_overlap"](spark, SF).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = chunks[-1]["start_tok"] + chunks[-1]["chunk_len"]
        for i, c in enumerate(chunks):
            assert c["chunk_id"] == i
            assert c["start_tok"] == i * CHUNK_STRIDE
            assert 1 <= c["chunk_len"] <= CHUNK_TOKENS
        # full coverage: next chunk starts before the previous ends
        # (overlap) or exactly at its end (stride == chunk size case)
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] <= a["start_tok"] + a["chunk_len"]
        # last chunk reaches the end of the doc
        assert chunks[-1]["start_tok"] < n


def test_balanced_by_lang_equal_counts(spark):
    got = _qs()["sample_balanced_by_lang"](spark, SF).collect()
    counts = {}
    for r in got:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    m = min(full.values())
    assert set(counts) == set(full)
    assert all(v == m for v in counts.values())


def test_balanced_by_lang_deterministic(spark):
    a = {r["doc_id"] for r in _qs()["sample_balanced_by_lang"](spark, SF).collect()}
    b = {r["doc_id"] for r in _qs()["sample_balanced_by_lang"](spark, SF).collect()}
    assert a == b


def test_vocab_coverage_bounds(spark):
    rows = _qs()["text_vocab_coverage"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["oov_pm"] <= 1000
        assert r["oov_pm"] == (1000 * r["n_oov"]) // r["n_tokens"]


def test_cooccurrence_pairs_exist_in_text(spark):
    """Every reported pair must actually co-occur within distance 2 in
    at least one document."""
    pairs = _qs()["text_cooccurrence_topk"](spark, SF).collect()
    assert len(pairs) > 0
    docs = [r["text"].split(" ")
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()]
    found = set()
    for t in docs:
        for i, w in enumerate(t):
            if i + 1 < len(t):
                found.add((w, t[i + 1]))
            if i + 2 < len(t):
                found.add((w, t[i + 2]))
    for r in pairs:
        assert (r["a"], r["b"]) in found
    # counts are descending with total tie-break
    key = [(-r["n"], f'{r["a"]} {r["b"]}') for r in pairs]
    assert key == sorted(key)


def test_conversion_latency_consistent_with_funnel(spark):
    """n_converted must equal the funnel's step-3 user count, and the
    percentiles must be within the observed latency range."""
    lat = _qs()["events_conversion_latency"](spark, SF).collect()[0]
    funnel = {r["step"]: r["users"]
              for r in _qs()["events_funnel_steps"](spark, SF).collect()}
    assert lat["n_converted"] == funnel[3]
    if lat["n_converted"] > 0:
        assert lat["median_s"] <= lat["p90_s"]
        assert lat["median_s"] >= 0


def test_pack_spans_cover_and_fill(spark):
    """Invariants: spans of one doc are contiguous and sum to
    n_tokens; per (source, seq_id), span_lens sum to exactly SEQ_LEN
    except each source's last sequence."""
    from dmds_spark.queries.llm_extra3 import PACK_SEQ_LEN

    rows = _qs()["tokens_pack_spans"](spark, SF).collect()
    assert rows
    by_doc, by_seq = {}, {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault((r["source"], r["seq_id"]), 0)
        by_seq[(r["source"], r["seq_id"])] += r["span_len"]
    pack = {r["doc_id"]: r for r in _qs()["tokens_pack_sequences"](spark, SF).collect()}
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r["seq_id"])
        assert spans[0]["doc_off"] == 0
        total = sum(s["span_len"] for s in spans)
        acc = 0
        for s in spans:
            assert s["doc_off"] == acc
            acc += s["span_len"]
        # first span agrees with tokens_pack_sequences' start position
        assert spans[0]["seq_id"] == pack[doc]["seq_id"]
        assert spans[0]["seq_off"] == pack[doc]["seq_offset"]
        assert total == pack[doc]["n_tokens"]
    last_seq = {}
    for (src, sid) in by_seq:
        last_seq[src] = max(last_seq.get(src, -1), sid)
    for (src, sid), filled in by_seq.items():
        if sid < last_seq[src]:
            assert filled == PACK_SEQ_LEN, (src, sid, filled)
        else:
            assert 0 < filled <= PACK_SEQ_LEN


def test_pagerank_deterministic_and_sane(spark):
    """Integer PageRank: bit-identical re-runs, descending total-order
    output, scores bounded by the fixed-point scale, and both node
    classes (suppliers=even, customers=odd) ranked."""
    from dmds_spark.queries.llm_extra3 import PR_SCALE, PR_TOPK

    a = _qs()["graph_pagerank"](spark, SF).collect()
    b = _qs()["graph_pagerank"](spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == PR_TOPK
    key = [(-r["score"], r["node"]) for r in a]
    assert key == sorted(key)
    for r in a:
        assert 0 < r["score"] < PR_SCALE  # no node absorbs everything
    assert {r["node"] % 2 for r in a} <= {0, 1}
