"""Pins for the incremental survivorship store
(operators/survivorship.py): increment-union == batch fold for every
rule family, replay safety, arrangement independence, vacuum."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

GOLDEN_COLS = ["user_id", "last_k", "best_value_cents", "modal_type",
               "first_seen_us", "last_seen_us", "n_records"]


@pytest.fixture(scope="module")
def obs(spark):
    from dmds_spark.queries.round15 import _survivorship_obs

    return _survivorship_obs(spark, SF)


def _golden_rows(df):
    return sorted(tuple(r[c] for c in GOLDEN_COLS)
                  for r in df.select(*GOLDEN_COLS).collect())


@pytest.fixture(scope="module")
def batch_rows(spark):
    from dmds_spark.queries import all_queries

    return _golden_rows(
        all_queries()["survivorship_golden_record"](spark, SF)
    )


def _store(spark, path):
    from dmds_spark.queries.round15 import _survivorship_store

    return _survivorship_store(spark, str(path))


def test_time_split_increments_plus_replay_equal_batch(
    spark, obs, batch_rows, tmp_path
):
    """The acceptance shape: CDC-ordered halves + a replayed second
    batch must reproduce the one-shot batch fold row for row."""
    mid = obs.agg(F.expr("percentile_approx(tus, 0.5)")).collect()[0][0]
    st = _store(spark, tmp_path / "s")
    st.fold_batch(obs.filter(F.col("tus") <= mid), 0)
    st.fold_batch(obs.filter(F.col("tus") > mid), 1)
    assert st.fold_batch(obs.filter(F.col("tus") > mid), 1)["skipped"]
    assert _golden_rows(st.golden()) == batch_rows


def test_arrangement_independence(spark, obs, batch_rows, tmp_path):
    """Merges are commutative/associative: a 3-way split by event id
    (interleaving every entity's history across batches, the worst
    arrangement for any order-dependent bug) folds to the same golden
    records."""
    st = _store(spark, tmp_path / "a")
    # batch ids increase (the replay high-water contract) while the
    # DATA arrives out of timestamp order
    for bid, i in enumerate((2, 0, 1)):
        st.fold_batch(obs.filter(F.col("event_id") % 3 == i), bid)
    assert _golden_rows(st.golden()) == batch_rows


def test_empty_store_and_vacuum(spark, obs, batch_rows, tmp_path):
    import os

    st = _store(spark, tmp_path / "v")
    assert st.golden() is None
    st.fold_batch(obs.filter(F.col("event_id") % 2 == 0), 0)
    st.fold_batch(obs.filter(F.col("event_id") % 2 == 1), 1)
    removed = st.vacuum()["removed"]
    # superseded v1 state + counts reclaimed, committed v2 survives
    assert "state/v1" in removed and "counts/v1" in removed
    assert os.path.isdir(st._path("state", 2))
    assert _golden_rows(st.golden()) == batch_rows


def test_state_is_entity_sized_not_history_sized(spark, obs, tmp_path):
    """The persisted state is one row per entity (plus the bounded
    per-category count grain) — the whole point vs re-folding
    history."""
    st = _store(spark, tmp_path / "n")
    st.fold_batch(obs, 0)
    n_entities = obs.select("user_id").distinct().count()
    state = spark.read.parquet(st._path("state", 1))
    assert state.count() == n_entities
    counts = spark.read.parquet(st._path("counts", 1))
    n_types = obs.select("event_type").distinct().count()
    assert counts.count() <= n_entities * n_types


def test_empty_batch_advances_replay_mark_without_version(
    spark, obs, batch_rows, tmp_path
):
    """Idle triggers are routine on a long stream: an empty micro-batch
    must advance the batch-id high-water mark WITHOUT rewriting the
    entity-sized state or minting a version (the postings/IVF
    empty-batch rule, review-confirmed round 15)."""
    st = _store(spark, tmp_path / "e")
    st.fold_batch(obs.filter(F.col("event_id") % 2 == 0), 0)
    out = st.fold_batch(obs.filter(F.col("event_id") < 0), 1)  # empty
    assert out == {"skipped": False, "version": 1, "empty": True}
    assert st._state() == {"version": 1, "last_batch_id": 1}
    st.fold_batch(obs.filter(F.col("event_id") % 2 == 1), 2)
    assert _golden_rows(st.golden()) == batch_rows
