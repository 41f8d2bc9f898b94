"""Pins for the persisted incremental inverted index
(operators/incremental_postings.py): increment-union == full rebuild,
replay safety, store-served BM25 == from-scratch BM25, term-bucket
partition pruning, compaction and vacuum."""

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.incremental_postings import (
    IncrementalPostingsIndex,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _dir_rows(idx):
    return sorted(
        (r["term"], r["df"], r["cf"], r["postings_md5"])
        for r in idx.term_directory().collect()
    )


def test_two_increments_equal_full_rebuild(spark, docs, tmp_path):
    inc = IncrementalPostingsIndex(spark, None, str(tmp_path / "inc"))
    inc.fold_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    inc.fold_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    full = IncrementalPostingsIndex(spark, None, str(tmp_path / "full"))
    full.fold_batch(docs, 0)
    assert _dir_rows(inc) == _dir_rows(full)
    assert inc.doclens().count() == docs.count()


def test_replay_and_empty_batch(spark, docs, tmp_path):
    idx = IncrementalPostingsIndex(spark, None, str(tmp_path / "r"))
    idx.fold_batch(docs, 0)
    n = idx.postings().count()
    assert idx.fold_batch(docs, 0)["skipped"] is True  # replay
    out = idx.fold_batch(docs.filter(F.col("doc_id") < 0), 1)  # empty
    assert out["skipped"] is False
    assert idx._state()["versions"] == [1]
    assert idx._state()["last_batch_id"] == 1
    assert idx.postings().count() == n


def test_store_served_bm25_matches_from_scratch(spark, docs, tmp_path):
    from dmds_spark.queries import all_queries
    from dmds_spark.queries.round9b import BM25_TERMS, BM25_TOPK

    idx = IncrementalPostingsIndex(spark, None, str(tmp_path / "b"))
    idx.fold_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    idx.fold_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    got = sorted(
        (r["doc_id"], r["score_str"], r["rnk"])
        for r in idx.search_bm25(BM25_TERMS, BM25_TOPK).collect()
    )
    want = sorted(
        (r["doc_id"], r["score_str"], r["rnk"])
        for r in all_queries()["text_bm25_topk"](spark, SF).collect()
    )
    assert got == want and len(got) == BM25_TOPK


def test_bm25_scan_prunes_term_buckets(spark, docs, tmp_path):
    """The index's whole point, pinned on the plan: the posting scan
    carries the tb partition filter (<= |terms| of 64 buckets) and the
    term pushdown — retrieval reads posting lists, not the corpus."""
    from dmds_spark.plans import partition_filters, pushed_filters
    from dmds_spark.queries.round9b import BM25_TERMS

    idx = IncrementalPostingsIndex(spark, None, str(tmp_path / "p"))
    idx.fold_batch(docs, 0)
    df = idx.search_bm25(BM25_TERMS, 10)
    assert any("tb" in f for f in partition_filters(df))
    assert any("term" in f for f in pushed_filters(df))


def test_compact_and_vacuum(spark, docs, tmp_path):
    import os

    idx = IncrementalPostingsIndex(spark, None, str(tmp_path / "c"))
    idx.fold_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    idx.fold_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    before = _dir_rows(idx)
    assert idx.compact()["compacted"] is True
    assert _dir_rows(idx) == before
    removed = idx.vacuum()["removed"]
    assert any(n.startswith("postings/") for n in removed)
    assert any(n.startswith("doclen/") for n in removed)
    # the compacted generation survives and still serves
    assert _dir_rows(idx) == before
    assert os.path.isdir(
        idx._grain_paths("postings", idx._state()["versions"])[0]
    )


def test_refresh_detects_source_mutation(spark, docs, tmp_path):
    from dmds_spark.operators.rollup import SourceMutatedError

    import glob
    import os

    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") < 100).coalesce(1).write.parquet(src)
    idx = IncrementalPostingsIndex(spark, src, str(tmp_path / "m"))
    idx.refresh()
    # in-place rewrite (SAME path, different size) must raise eagerly
    part = glob.glob(os.path.join(src, "*.parquet"))[0]
    with open(part, "ab") as fh:
        fh.write(b"xx")
    with pytest.raises(SourceMutatedError):
        idx.refresh()


def test_stream_foreach_batch_matches_batch(spark, docs, tmp_path):
    """Drive the posting store from a real micro-batched stream (one
    file per trigger): the accumulated index must equal a single
    full-batch ingest — per-term directory row for row."""
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    idx = IncrementalPostingsIndex(spark, None, str(tmp_path / "stream"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part-*.parquet")
    )
    q = (
        sdf.writeStream.foreachBatch(idx.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    full = IncrementalPostingsIndex(spark, None, str(tmp_path / "full"))
    full.fold_batch(docs, 0)
    assert len(idx._state()["versions"]) >= 2  # really micro-batched
    assert _dir_rows(idx) == _dir_rows(full)


def test_phrase_from_store_matches_per_query_build(spark, docs, tmp_path):
    """Positional grain: store-served phrase hits equal the per-query
    text_phrase_retrieval build; a positions=False store refuses."""
    from dmds_spark.queries import all_queries

    idx = IncrementalPostingsIndex(
        spark, None, str(tmp_path / "pos"), positions=True
    )
    idx.fold_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    idx.fold_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    got = sorted(
        (r["doc_id"], r["n_hits"], r["first_pos"], r["last_pos"])
        for r in idx.search_phrase(("hash", "join")).collect()
    )
    want = sorted(
        (r["doc_id"], r["n_hits"], r["first_pos"], r["last_pos"])
        for r in all_queries()["text_phrase_retrieval"](spark, SF).collect()
    )
    assert got == want and got
    # three-term chain is a strict subset of the two-term hits' docs
    three = {r["doc_id"]
             for r in idx.search_phrase(("hash", "join", "hash")).collect()}
    assert three <= {d for d, *_ in got}
    flat = IncrementalPostingsIndex(spark, None, str(tmp_path / "flat"))
    flat.fold_batch(docs, 0)
    with pytest.raises(ValueError, match="positional grain"):
        flat.search_phrase(("hash", "join"))


def test_positions_flag_is_store_state(spark, docs, tmp_path):
    """The grain choice persists in the pointer: an instance opened
    with the OTHER flag is refused before it can write an increment
    missing the grain — or vacuum a grain it does not know about
    (which would silently delete all positional data)."""
    path = str(tmp_path / "g")
    idx = IncrementalPostingsIndex(spark, None, path, positions=True)
    idx.fold_batch(docs.filter(F.col("doc_id") < 100), 0)
    wrong = IncrementalPostingsIndex(spark, None, path, positions=False)
    with pytest.raises(ValueError, match="positions=True"):
        wrong.fold_batch(docs, 1)
    with pytest.raises(ValueError, match="positions=True"):
        wrong.vacuum()
    # the correctly-flagged instance still serves
    again = IncrementalPostingsIndex(spark, None, path, positions=True)
    assert again.search_phrase(("hash", "join")).count() >= 0


# -- analyzer migration (round 15) ----------------------------------------


def test_retokenize_equals_fresh_rebuild_and_new_increments_follow(
    spark, docs, tmp_path
):
    """The acceptance shape: two ws increments, retokenize to stem3,
    one more increment — the accumulated directory must equal a fresh
    single-batch stem3 store; replay marks survive the migration."""
    import os

    src = str(tmp_path / "src")
    store = str(tmp_path / "s")
    idx = IncrementalPostingsIndex(spark, src, store)
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(src)
    idx.refresh()
    docs.filter(F.col("doc_id") % 3 == 1).write.mode("append").parquet(src)
    idx.refresh()
    out = idx.retokenize("stem3")
    assert out == {"analyzer": "stem3", "analyzer_version": 2,
                   "migrated_versions": 2}
    docs.filter(F.col("doc_id") % 3 == 2).write.mode("append").parquet(src)
    idx.refresh()  # post-flip increment tokenizes with stem3
    fresh = IncrementalPostingsIndex(
        spark, None, str(tmp_path / "fresh"), analyzer="stem3"
    )
    fresh.fold_batch(docs, 0)
    assert _dir_rows(idx) == _dir_rows(fresh)
    # version identity preserved: v1/v2 migrated in place, v3 new-gen
    st = idx._state()
    assert st["versions"] == [1, 2, 3]
    assert os.path.isdir(os.path.join(store, "postings", "batch-v1@av2"))
    # the superseded ws generation stays on disk for lazy readers...
    assert os.path.isdir(os.path.join(store, "postings", "batch-v1"))
    removed = idx.vacuum()["removed"]
    # ...until vacuum reclaims exactly the old generation
    assert "postings/batch-v1" in removed
    assert not os.path.isdir(os.path.join(store, "postings", "batch-v1"))
    assert _dir_rows(idx) == _dir_rows(fresh)  # still serves post-vacuum


def test_retokenize_reader_across_flip(spark, docs, tmp_path):
    """A reader materialized BEFORE the flip keeps answering from the
    old analyzer generation; a post-flip reader sees the new one."""
    src = str(tmp_path / "src")
    idx = IncrementalPostingsIndex(spark, src, str(tmp_path / "s"))
    docs.write.parquet(src)
    idx.refresh()
    pre = idx.term_directory()
    pre_rows = sorted(r["term"] for r in pre.collect())
    idx.retokenize("stem3")
    # the pre-flip plan still resolves (old dirs intact until vacuum)
    assert sorted(r["term"] for r in pre.collect()) == pre_rows
    post_rows = sorted(r["term"] for r in idx.term_directory().collect())
    assert post_rows != pre_rows
    assert all(len(t) <= 3 for t in post_rows)


def test_analyzer_is_store_state_and_guards(spark, docs, tmp_path):
    """Analyzer mismatches are refused at open (the positions-flag
    discipline); retokenize refuses same-analyzer, unknown analyzers,
    and stores with stream-fed (provenance-less) increments."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "a")
    idx = IncrementalPostingsIndex(spark, src, path)
    docs.write.parquet(src)
    idx.refresh()
    wrong = IncrementalPostingsIndex(spark, src, path, analyzer="stem3")
    with pytest.raises(ValueError, match="staged migration"):
        wrong.refresh()
    with pytest.raises(ValueError, match="already tokenized"):
        idx.retokenize("ws")
    with pytest.raises(ValueError, match="unknown analyzer"):
        idx.retokenize("porter")
    # stream-fed increments carry no source provenance
    streamed = IncrementalPostingsIndex(spark, None, str(tmp_path / "st"))
    streamed.fold_batch(docs, 0)
    with pytest.raises(ValueError, match="provenance"):
        streamed.retokenize("stem3")
    # post-migration open with the OLD analyzer is refused too
    idx.retokenize("stem3")
    old = IncrementalPostingsIndex(spark, src, path)  # default ws
    with pytest.raises(ValueError, match="staged migration"):
        old.vacuum()


def test_retokenize_positional_store_serves_phrases(spark, docs, tmp_path):
    """The positional grain migrates too: post-flip phrase search runs
    on stem3 terms at unchanged positions (every analyzer is
    length-preserving)."""
    src = str(tmp_path / "src")
    idx = IncrementalPostingsIndex(
        spark, src, str(tmp_path / "p"), positions=True
    )
    docs.write.parquet(src)
    idx.refresh()
    before = sorted(
        (r["doc_id"], r["n_hits"], r["first_pos"], r["last_pos"])
        for r in idx.search_phrase(("hash", "join")).collect()
    )
    idx.retokenize("stem3")
    after = sorted(
        (r["doc_id"], r["n_hits"], r["first_pos"], r["last_pos"])
        for r in idx.search_phrase(("has", "joi")).collect()
    )
    # 'hash'->'has', 'join'->'joi' are injective on this vocab and
    # positions are preserved, so the hit sets must be identical
    assert after == before and before
