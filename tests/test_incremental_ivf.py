"""Pins for the persisted incremental IVF index
(operators/incremental_ivf.py): increment-union == full rebuild,
replay safety, search correctness vs brute force, compaction, and the
frozen-centroid contract."""

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.incremental_ivf import IncrementalIVFIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _anchor_rows(emb):
    rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    return [list(r["embedding"]) for r in rows]


def _assign_set(df):
    return sorted((r["vec_id"], r["cluster"]) for r in df.collect())


def test_two_increments_equal_full_rebuild(spark, emb, tmp_path):
    anchors = _anchor_rows(emb)

    inc = IncrementalIVFIndex(
        spark, None, str(tmp_path / "inc"), "vec_id", "embedding"
    )
    inc.set_centroids(anchors)
    inc.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    inc.fold_batch(emb.filter(F.col("vec_id") % 2 == 1), 1)

    full = IncrementalIVFIndex(
        spark, None, str(tmp_path / "full"), "vec_id", "embedding"
    )
    full.set_centroids(anchors)
    full.fold_batch(emb, 0)

    a, b = _assign_set(inc.assignments()), _assign_set(full.assignments())
    assert a == b and len(a) == emb.count()


def test_trained_centroids_path(spark, emb, tmp_path):
    """k-means training freezes a quantizer that assigns every vector
    (engine path — iterative, so no SQL oracle; the anchor path is the
    oracle-checked one)."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "t"), "vec_id", "embedding"
    )
    idx.train(emb, k=4, iters=2)
    assert idx.centroids().count() == 4
    idx.fold_batch(emb, 0)
    clusters = {r["cluster"] for r in idx.assignments().collect()}
    assert clusters <= {0, 1, 2, 3} and idx.assignments().count() == emb.count()


def test_fold_batch_replay_is_idempotent(spark, emb, tmp_path):
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "r"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    n1 = idx.assignments().count()
    res = idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)  # replay
    assert res["skipped"] is True
    assert idx.assignments().count() == n1


def test_search_matches_bruteforce_on_probed_cells(spark, emb, tmp_path):
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "s"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = idx.search(q, topk=5, nprobe=8)  # all cells -> exact topk
    # brute force over everything (nprobe=k means no pruning)
    import math

    qn = math.sqrt(sum(x * x for x in q))
    rows = emb.collect()

    def cos(v):
        vn = math.sqrt(sum(float(x) ** 2 for x in v))
        return sum(float(a) * b for a, b in zip(v, q)) / (vn * qn)

    want = sorted(((-cos(r["embedding"]), r["vec_id"]) for r in rows))[:5]
    assert [r["vec_id"] for r in got.collect()] == [v for _, v in want]


def test_search_prunes_partitions(spark, emb, tmp_path):
    """nprobe < k must reach the scan as a partition filter on the
    cluster directory column — the IVF point."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "p"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    q = [1.0] * 64
    plan = idx.search(q, topk=3, nprobe=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan.replace("#", " #").replace(
        "cluster #", "cluster#"
    ) or "cluster" in plan.split("PartitionFilters")[1].split("]")[0]


def test_search_batch_prunes_and_broadcasts(spark, emb, tmp_path):
    """The serving-path plan shape: the store scan is pruned to the
    union of probed cells (PartitionFilters on the cluster directory
    column) and the query micro-batch is the BROADCAST side — the
    store is never shuffled."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "pb"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plan = idx.search_batch(q, topk=3, nprobe=2)._jdf.queryExecution(
    ).executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cluster" in pf and "IN" in pf.upper()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_compact_preserves_assignments(spark, emb, tmp_path):
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "c"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 1), 1)
    before = _assign_set(idx.assignments())
    pre_compact_reader = idx.assignments()  # lazily pins the old paths
    out = idx.compact()
    assert out == {"compacted": True, "versions": 1}
    assert _assign_set(idx.assignments()) == before
    import os

    # superseded dirs SURVIVE compact (a pre-compact lazy reader still
    # resolves them); the explicit vacuum reclaims
    assert _assign_set(pre_compact_reader) == before
    assert sorted(os.listdir(tmp_path / "c" / "assign")) == [
        "batch-v1", "batch-v2", "batch-v3",
    ]
    assert idx.vacuum()["removed"] == ["assign/batch-v1", "assign/batch-v2"]
    assert os.listdir(tmp_path / "c" / "assign") == ["batch-v3"]
    assert _assign_set(idx.assignments()) == before


def test_retrain_over_assignments_refused(spark, emb, tmp_path):
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "g"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    with pytest.raises(ValueError, match="retrain"):
        idx.set_centroids(_anchor_rows(emb))


def _different_anchors(emb):
    rows = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 26)
    ).orderBy("vec_id").collect()
    return [list(r["embedding"]) for r in rows]


def test_retrain_matches_fresh_rebuild(spark, emb, tmp_path):
    """The staged retrain migration produces EXACTLY the store a
    fresh-store rebuild under the new centroids produces — assignments,
    search results, and replay marks all carry over."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "m"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 1), 1)
    new_anchors = _different_anchors(emb)
    out = idx.retrain(new_anchors)
    assert out == {"centroid_version": 2, "migrated_versions": 2}

    fresh = IncrementalIVFIndex(
        spark, None, str(tmp_path / "fresh"), "vec_id", "embedding"
    )
    fresh.set_centroids(new_anchors)
    fresh.fold_batch(emb, 0)
    assert _assign_set(idx.assignments()) == _assign_set(fresh.assignments())

    q = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    got = [r["vec_id"] for r in idx.search(q, topk=5, nprobe=2).collect()]
    want = [r["vec_id"] for r in fresh.search(q, topk=5, nprobe=2).collect()]
    assert got == want
    # replay high-water mark survived the migration
    assert idx.fold_batch(emb.limit(0), 1)["skipped"] is True
    # further increments land under the new generation
    assert idx._state()["centroid_version"] == 2


def test_retrain_flip_is_atomic_and_vacuum_reclaims(spark, emb, tmp_path):
    """Old-generation directories keep serving any pre-flip reader and
    stay on disk until vacuum(); a crash-orphan @cv2 dir (simulated by
    writing it without flipping) is never read and is reclaimed."""
    import os

    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "a"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    pre_flip_reader = idx.assignments()  # pins the cv1 directories
    before = _assign_set(pre_flip_reader)

    idx.retrain(_different_anchors(emb))
    # the pre-flip reader still sees the OLD generation, unchanged
    assert _assign_set(pre_flip_reader) == before
    adir = tmp_path / "a" / "assign"
    assert sorted(os.listdir(adir)) == ["batch-v1", "batch-v1@cv2"]

    removed = idx.vacuum()["removed"]
    assert removed == ["assign/batch-v1", "centroids/v1"]
    assert sorted(os.listdir(adir)) == ["batch-v1@cv2"]
    # the committed generation is intact after vacuum
    assert len(_assign_set(idx.assignments())) == len(before)


def test_legacy_pointer_without_base_cv(spark, emb, tmp_path):
    """A pre-round-12 pointer has no base_cv field; such stores could
    have advanced centroid_version past 1 (repeated pre-ingest
    set_centroids) while writing BARE assign dirs. The fallback must
    resolve them — and vacuum must NOT delete them."""
    import json
    import os

    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "l"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.set_centroids(_anchor_rows(emb))  # re-freeze pre-ingest: cv=2
    idx.fold_batch(emb, 0)
    assert sorted(os.listdir(tmp_path / "l" / "assign")) == ["batch-v1"]
    # simulate the legacy pointer: strip the field the old code lacked
    ptr = tmp_path / "l" / "_current.json"
    st = json.load(open(ptr))
    assert st["centroid_version"] == 2
    del st["base_cv"]
    json.dump(st, open(ptr, "w"))
    assert idx.assignments().count() == emb.count()  # bare dirs resolve
    assert idx.vacuum()["removed"] == ["centroids/v1"]  # data untouched
    assert idx.assignments().count() == emb.count()


def test_writer_lock_fences_concurrent_stores(spark, emb, tmp_path):
    """A foreign live writer token in the store dir must make every
    mutating op refuse (WorldLockedError) instead of silently minting
    the same version number; the token is released after each op."""
    import json
    import os

    from dmds_spark.core.errors import WorldLockedError

    from dmds_spark.world import WriterLock

    store = str(tmp_path / "w")
    idx = IncrementalIVFIndex(spark, None, store, "vec_id", "embedding")
    idx.set_centroids(_anchor_rows(emb))
    lockfile = WriterLock.lock_path(store)
    assert not os.path.exists(lockfile)

    # plant a live foreign holder (our own pid, foreign token — the
    # refuse-rather-than-adopt case)
    os.makedirs(os.path.dirname(lockfile), exist_ok=True)
    with open(lockfile, "w") as fh:
        json.dump(
            {"pid": os.getpid(), "host": __import__("socket").gethostname(),
             "token": "someone-else"},
            fh,
        )
    with pytest.raises(WorldLockedError):
        idx.fold_batch(emb, 0)
    os.unlink(lockfile)
    idx.fold_batch(emb, 0)  # lock gone -> proceeds
    assert idx.assignments().count() == emb.count()


def test_drift_report_shape(spark, emb, tmp_path):
    """k rows, population + frozen-vs-mean cosine per cell; cells whose
    members equal the centroid show cosine 1.0."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "d"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    rep = idx.drift_report().collect()
    assert [r["cluster"] for r in rep] == list(range(8))
    assert sum(r["n"] for r in rep) == emb.count()
    for r in rep:
        assert r["n"] == 0 or 0.0 <= r["centroid_cosine"] <= 1.0 + 1e-9


def test_stream_foreach_batch_matches_batch(spark, emb, tmp_path):
    """Drive the IVF index from a real micro-batched stream (one file
    per trigger): the accumulated assignments must equal a single
    full-batch ingest against the same frozen centroids."""
    anchors = _anchor_rows(emb)
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "stream"), "vec_id", "embedding"
    )
    idx.set_centroids(anchors)
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

    full = IncrementalIVFIndex(
        spark, None, str(tmp_path / "full"), "vec_id", "embedding"
    )
    full.set_centroids(anchors)
    full.fold_batch(emb, 0)
    assert _assign_set(idx.assignments()) == _assign_set(full.assignments())


def test_empty_batch_does_not_poison_store(spark, emb, tmp_path):
    """Empty micro-batches (routine under foreachBatch recovery/idle
    triggers) must not commit a parquet-less version directory — that
    would fail every later assignments() schema inference. The replay
    high-water mark still advances."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "e"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    n = idx.assignments().count()
    out = idx.fold_batch(emb.filter(F.col("vec_id") < 0), 1)  # empty
    assert out["skipped"] is False
    assert idx._state()["versions"] == [1]
    assert idx._state()["last_batch_id"] == 1
    assert idx.assignments().count() == n  # store intact, not poisoned
    # replay of the empty batch id is still skipped
    assert idx.fold_batch(emb.limit(0), 1)["skipped"] is True


def test_reader_across_retrain_flip_and_vacuum(spark, emb, tmp_path):
    """Reader contract across concurrent lifecycle ops (round-12
    verdict item 7), matching World's snapshot-pinned reads:

    1. a pre-flip search_batch plan SURVIVES a retrain flip — its file
       listing is pinned to the old generation's directories, which the
       flip leaves on disk, so it keeps serving the OLD results;
    2. vacuum() reclaims those directories, after which a pinned
       reader that has to touch storage FAILS CLEANLY (missing-file
       error) — it can never silently serve partial or
       mixed-generation results (Spark's default
       ignoreMissingFiles=false is load-bearing and asserted here).

    Caveat pinned as reality, not aspiration: a pre-flip plan that
    already EXECUTED may keep answering after vacuum from its still-
    registered shuffle map outputs (Spark skips stages whose outputs
    exist — same-session ephemeral reuse, correct old-generation
    values). The hard guarantee is the cold reader: first execution
    after vacuum raises rather than fabricating rows.
    """
    anchors = _anchor_rows(emb)
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "rv"), "vec_id", "embedding"
    )
    idx.set_centroids(anchors[:4])
    idx.fold_batch(emb, 0)

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pre = idx.search_batch(queries, topk=5, nprobe=2)
    # a second pre-flip plan, deliberately NEVER executed before the
    # vacuum — no shuffle outputs to reuse, must hit the deleted files
    pre_cold = idx.search_batch(queries, topk=5, nprobe=2)
    baseline = sorted(
        (r["qid"], r["vec_id"], round(r["sim"], 9)) for r in pre.collect()
    )
    assert baseline

    # staged migration: new quantizer (reversed anchors -> different
    # cell numbering), atomic pointer flip; old generation on disk
    idx.retrain(list(reversed(anchors[:4])))

    assert (
        spark.conf.get("spark.sql.files.ignoreMissingFiles") == "false"
    ), "contract below relies on missing files raising, not skipping"
    again = sorted(
        (r["qid"], r["vec_id"], round(r["sim"], 9)) for r in pre.collect()
    )
    assert again == baseline  # pre-flip reader: old generation, intact

    post = idx.search_batch(queries, topk=5, nprobe=2)
    assert sorted((r["qid"], r["vec_id"]) for r in post.collect()) == sorted(
        (q, v) for q, v, _ in baseline
    )  # same neighbors under the migrated index (cells renumbered)

    removed = idx.vacuum()["removed"]
    assert any(name.startswith("assign/") for name in removed)
    with pytest.raises(Exception) as ei:
        pre_cold.collect()
    msg = str(ei.value)
    assert (
        "FileNotFound" in msg
        or "does not exist" in msg
        or "PATH_NOT_FOUND" in msg
        or "FAILED_READ_FILE" in msg
    ), msg
    # the committed generation is untouched by the vacuum
    assert sorted(
        (r["qid"], r["vec_id"]) for r in
        idx.search_batch(queries, topk=5, nprobe=2).collect()
    ) == sorted((q, v) for q, v, _ in baseline)


# -- PQ codes in the maintained store (round 14) -------------------------


def _pq_idx(spark, emb, path, halves=True):
    idx = IncrementalIVFIndex(spark, None, str(path), "vec_id", "embedding")
    idx.set_centroids(_anchor_rows(emb))
    idx.train_pq(emb)
    if halves:
        idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
        idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 1), 1)
        idx.fold_batch(emb.filter(F.col("vec_id") % 2 == 1), 1)  # replay
    else:
        idx.fold_batch(emb, 0)
    return idx


def test_pq_codes_increment_union_equals_full_encode(spark, emb, tmp_path):
    """Codes are a pure function of (vector, frozen codebooks), so the
    two-increment store's codes column must equal an inline
    pq_encode() of the whole corpus, row for row — the
    increment-union == full-recompute contract extended to PQ."""
    from dmds_spark.operators.pq import pq_codebooks, pq_encode, quantized

    idx = _pq_idx(spark, emb, tmp_path / "pq")
    q = quantized(emb)
    inline = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(q, pq_codebooks(q)).collect()
    }
    stored = {
        (r["vec_id"], s): c
        for r in idx.assignments().select("vec_id", "codes").collect()
        for s, c in enumerate(r["codes"])
    }
    assert stored == inline and len(stored) == emb.count() * 4


def test_adc_all_cells_matches_inline_adc(spark, emb, tmp_path):
    """search_batch_adc with nprobe == #cells is pure ADC — it must
    reproduce operators/pq.py pq_adc_topk per query exactly (the
    integer distances leave no tolerance)."""
    from dmds_spark.operators.pq import pq_codebooks, pq_encode, quantized

    idx = _pq_idx(spark, emb, tmp_path / "a")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = sorted(
        (r["qid"], r["vec_id"], r["adc_dist"])
        for r in idx.search_batch_adc(queries, topk=10, nprobe=8).collect()
    )
    q = quantized(emb)
    cb = pq_codebooks(q)
    codes = pq_encode(q, cb)
    from dmds_spark.operators.pq import pq_adc_topk

    ref = sorted(
        (qid, r["vec_id"], r["adc_dist"])
        for qid in (0, 1, 2)
        for r in pq_adc_topk(q, cb, codes, qid, 10).collect()
    )
    assert got == ref


def test_adc_rerank_matches_exact_cosine_on_shortlist(spark, emb, tmp_path):
    """The rerank path must equal an independent recompute: exact
    cosine over the ADC shortlist (rerank rows), top-k by (sim desc,
    id). Verified with a driver-side numpy recompute."""
    import math

    idx = _pq_idx(spark, emb, tmp_path / "r")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    short = idx.search_batch_adc(queries, topk=20, nprobe=2)  # == shortlist
    got = idx.search_batch_adc(queries, topk=5, nprobe=2, rerank=20)
    vecs = {
        r["vec_id"]: list(r["embedding"]) for r in emb.collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    by_q = {}
    for r in short.collect():
        by_q.setdefault(r["qid"], []).append(r["vec_id"])
    want = set()
    for qid, ids in by_q.items():
        ranked = sorted(ids, key=lambda v: (-cos(vecs[qid], vecs[v]), v))
        want |= {(qid, v) for v in ranked[:5]}
    assert {(r["qid"], r["vec_id"]) for r in got.collect()} == want
    assert set(got.columns) == {"qid", "vec_id", "cluster", "adc_dist", "sim"}


def test_pq_freeze_contract_and_error_paths(spark, emb, tmp_path):
    """PQ codebooks freeze like centroids: refused over existing
    assignments; ADC search refused without codebooks; a legacy store
    (built before PQ froze) fails with the rebuild message rather than
    fabricating codes."""
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "c"), "vec_id", "embedding"
    )
    idx.set_centroids(_anchor_rows(emb))
    idx.fold_batch(emb, 0)
    with pytest.raises(ValueError, match="pure function of the frozen"):
        idx.train_pq(emb)
    queries = emb.limit(1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="needs frozen PQ codebooks"):
        idx.search_batch_adc(queries)
    # legacy: pointer gains pq_version but rows predate codes
    import json as _json
    import os as _os

    st = idx._state()
    p2 = IncrementalIVFIndex(
        spark, None, str(tmp_path / "c"), "vec_id", "embedding"
    )
    _pq_dir = p2._pq_path(1)
    spark.createDataFrame(
        [(0, 0, [0] * 16)], "sub int, cid int, qc array<bigint>"
    ).write.parquet(_pq_dir)
    with open(_os.path.join(str(tmp_path / "c"), "_current.json"), "w") as fh:
        _json.dump({**st, "pq_version": 1}, fh)
    with pytest.raises(ValueError, match="no codes column"):
        p2.search_batch_adc(queries)


def test_retrain_carries_codes_and_vacuum_keeps_pq(spark, emb, tmp_path):
    """A coarse-quantizer retrain moves cells and must carry each
    row's codes unchanged (codes depend only on the PQ codebooks);
    vacuum keeps the current pq generation."""
    idx = _pq_idx(spark, emb, tmp_path / "m", halves=False)
    before = {r["vec_id"]: list(r["codes"])
              for r in idx.assignments().collect()}
    idx.retrain(list(reversed(_anchor_rows(emb))))
    after = {r["vec_id"]: list(r["codes"])
             for r in idx.assignments().collect()}
    assert after == before
    removed = idx.vacuum()["removed"]
    assert not any(name.startswith("pq/") for name in removed)
    import os as _os

    assert _os.path.isdir(idx._pq_path(1))


def test_adc_reader_across_retrain_flip_and_vacuum(spark, emb, tmp_path):
    """The :func:`test_reader_across_retrain_flip_and_vacuum` contract
    extended to the ADC path: a pre-flip search_batch_adc plan keeps
    serving the old generation across a retrain flip; a cold pre-flip
    plan fails cleanly (missing files) after vacuum, never silently
    serving mixed generations."""
    anchors = _anchor_rows(emb)
    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "rv"), "vec_id", "embedding"
    )
    idx.set_centroids(anchors[:4])
    idx.train_pq(emb)
    idx.fold_batch(emb, 0)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pre = idx.search_batch_adc(queries, topk=5, nprobe=2)
    pre_cold = idx.search_batch_adc(queries, topk=5, nprobe=2)
    baseline = sorted(
        (r["qid"], r["vec_id"], r["adc_dist"]) for r in pre.collect()
    )
    assert baseline
    idx.retrain(list(reversed(anchors[:4])))
    assert sorted(
        (r["qid"], r["vec_id"], r["adc_dist"]) for r in pre.collect()
    ) == baseline  # pre-flip reader: old generation, intact
    idx.vacuum()
    with pytest.raises(Exception) as ei:
        pre_cold.collect()
    msg = str(ei.value)
    assert (
        "FileNotFound" in msg
        or "does not exist" in msg
        or "PATH_NOT_FOUND" in msg
        or "FAILED_READ_FILE" in msg
    ), msg


def test_adc_scan_prunes_vector_column_and_partitions(spark, emb, tmp_path):
    """The 100 TB point of stored codes, pinned on the plan: the ADC
    phase's scan reads ONLY (id, codes) under the cluster partition
    key — the 64-float vector column must NOT appear in any ReadSchema
    of the no-rerank plan; the probed cells reach the scan as a
    partition filter; the corpus side carries no broadcast hint."""
    from dmds_spark.plans import partition_filters, read_schemas

    idx = _pq_idx(spark, emb, tmp_path / "p", halves=False)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    df = idx.search_batch_adc(queries, topk=5, nprobe=2)
    store_schemas = [s for s in read_schemas(df) if "codes" in s]
    assert store_schemas and all(
        "embedding" not in s for s in store_schemas
    ), store_schemas
    assert any("cluster" in f for f in partition_filters(df))


def test_pq_drift_report_zero_error_for_codeword_vectors(spark, emb, tmp_path):
    """Sanity invariants: population sums to the corpus per subspace;
    errors are non-negative; and a store whose vectors ARE codeword
    centroids would report zero — approximated here by checking the
    report's totals against a driver-side recompute on a sample."""
    import numpy as np

    from dmds_spark.operators.pq import PQ_M, PQ_OFF, PQ_SCALE

    idx = _pq_idx(spark, emb, tmp_path / "d", halves=False)
    rep = idx.pq_drift_report().collect()
    n = emb.count()
    by_sub = {}
    for r in rep:
        by_sub.setdefault(r["sub"], 0)
        by_sub[r["sub"]] += r["n_vectors"]
        assert r["sum_sq_err"] >= 0
    assert all(v == n for v in by_sub.values())
    # driver-side recompute for one subspace on 20 vectors
    books = idx._pq_books()
    sub_w = 64 // PQ_M
    sample = emb.filter(F.col("vec_id") < 20).collect()
    stored = {r["vec_id"]: list(r["codes"])
              for r in idx.assignments().filter(
                  F.col("vec_id") < 20).collect()}
    want = {}
    for r in sample:
        g = [int(np.floor(float(x) * PQ_SCALE)) + PQ_OFF
             for x in r["embedding"]]
        for s in range(PQ_M):
            sv = g[s * sub_w:(s + 1) * sub_w]
            cw = books[s][stored[r["vec_id"]][s]]
            err = sum((a - b) * (a - b) for a, b in zip(sv, cw))
            want[(s, stored[r["vec_id"]][s])] = (
                want.get((s, stored[r["vec_id"]][s]), 0) + err
            )
    # the sampled errors are a lower bound of each (sub, code) total
    got = {(r["sub"], r["code"]): r["sum_sq_err"] for r in rep}
    for k, v in want.items():
        assert got[k] >= v


def test_pq_nondefault_dim_end_to_end_and_width_guard(spark, emb, tmp_path):
    """A store built with dim != PQ_DIM (a supported constructor
    parameter) must train/encode/search with MATCHING codebook and
    slice widths: before round 15, pq_codebooks hardcoded PQ_DIM=64
    while _codes_expr/_adc_tbl sliced at dim//PQ_M, so zip_with padded
    nulls and every ADC distance went NULL with no error. Also pins
    the width guard: freezing wrong-width codebooks is refused."""
    dim = 32
    emb32 = emb.select("vec_id", F.slice("embedding", 1, dim).alias("embedding"))
    anchors = [a[:dim] for a in _anchor_rows(emb)]

    idx = IncrementalIVFIndex(
        spark, None, str(tmp_path / "d32"), "vec_id", "embedding", dim=dim
    )
    idx.set_centroids(anchors)
    idx.train_pq(emb32)
    # codebook rows carry dim//PQ_M-wide codewords, not PQ_SUB=16-wide
    widths = {len(r["qc"]) for r in idx.pq_codebooks_df().collect()}
    assert widths == {dim // 4}
    idx.fold_batch(emb32, 0)
    codes = idx.assignments().select("vec_id", "codes").collect()
    assert all(
        r["codes"] is not None and all(c is not None for c in r["codes"])
        for r in codes
    )
    queries = emb32.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = idx.search_batch_adc(queries, topk=5, nprobe=8).collect()
    assert len(got) == 10
    # the pre-fix failure mode was NULL distances (zip_with padding)
    assert all(r["adc_dist"] is not None for r in got)

    # width guard: 16-wide codewords refused on a dim=32 store
    bad = IncrementalIVFIndex(
        spark, None, str(tmp_path / "bad"), "vec_id", "embedding", dim=dim
    )
    with pytest.raises(ValueError, match="codeword width"):
        bad.set_pq_codebooks(
            [(s, c, [0] * 16) for s in range(4) for c in range(8)]
        )
