"""CDC changeset application: latest-wins MERGE semantics (op algebra,
generation precedence, tie-breaks), net-changes compaction (all four
I/U/D/cancel branches, payload nulling), World replay idempotence, and
the plan shape (one hash aggregate, no window sort)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dmds_spark.operators.cdc import (
    apply_changeset,
    latest_wins,
    merge_net_into_world,
    net_changes,
)

KW = dict(keys=["k"], seq=["ts", "sub"], op_col="op", payload=["val"])


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, val=v, ts=t, sub=s, op=o) for (k, v, t, s, o) in rows],
        "k long, val string, ts long, sub long, op string",
    )


def _state(df):
    return {(r["k"], r["val"]) for r in df.collect()}


def test_apply_changeset_op_algebra(spark):
    base = _df(spark, [(1, "a", 10, 0, "U"), (2, "b", 10, 0, "U")])
    changes = _df(
        spark,
        [
            (1, "a2", 20, 0, "U"),  # update existing
            (2, "x", 20, 0, "D"),   # delete existing
            (3, "c", 20, 0, "U"),   # insert new
            (4, "d", 20, 0, "U"),   # insert then delete: net nothing
            (4, "d", 21, 0, "D"),
        ],
    )
    out = apply_changeset(base, changes, count_col="n_changes", **KW)
    assert _state(out) == {(1, "a2"), (3, "c")}
    counts = {r["k"]: r["n_changes"] for r in out.collect()}
    assert counts == {1: 1, 3: 1}


def test_untouched_base_keys_survive_with_zero_count(spark):
    base = _df(spark, [(7, "keep", 5, 0, "U")])
    changes = _df(spark, [(8, "new", 9, 0, "U")])
    out = apply_changeset(base, changes, count_col="n_changes", **KW)
    rows = {r["k"]: (r["val"], r["n_changes"]) for r in out.collect()}
    assert rows == {7: ("keep", 0), 8: ("new", 1)}


def test_change_beats_base_even_with_older_seq(spark):
    """Generation precedence: a change row applies over the base even
    when its seq is older than the base row's seq (the base snapshot's
    seq records when IT was written, not a fence for new ops)."""
    base = _df(spark, [(1, "base", 100, 0, "U")])
    changes = _df(spark, [(1, "chg", 50, 0, "U")])
    out = apply_changeset(base, changes, **KW)
    assert _state(out) == {(1, "chg")}


def test_seq_tiebreak_uses_second_column(spark):
    base = _df(spark, [])
    changes = _df(
        spark, [(1, "first", 10, 1, "U"), (1, "second", 10, 2, "U")]
    )
    out = apply_changeset(base, changes, **KW)
    assert _state(out) == {(1, "second")}


def test_latest_wins_keeps_op_and_seq(spark):
    changes = _df(
        spark, [(1, "v1", 10, 0, "U"), (1, "v2", 20, 0, "D")]
    )
    r = latest_wins(changes, **KW).collect()[0]
    assert (r["op"], r["val"], r["ts"]) == ("D", "v2", 20)


def test_net_changes_four_branches(spark):
    base_keys = spark.createDataFrame([Row(k=1), Row(k=2)])
    changes = _df(
        spark,
        [
            (1, "u", 20, 0, "U"),   # in base, last U -> net U
            (2, "x", 20, 0, "D"),   # in base, last D -> net D, null payload
            (3, "i", 20, 0, "U"),   # new, last U -> net I
            (4, "g", 20, 0, "U"),   # new, then D -> dropped
            (4, "g", 21, 0, "D"),
        ],
    )
    out = net_changes(changes, base_keys, **KW)
    rows = {r["k"]: (r["net_op"], r["val"]) for r in out.collect()}
    assert rows == {1: ("U", "u"), 2: ("D", None), 3: ("I", "i")}
    # seq survives on deletes so the feed stays orderable
    d = out.filter(F.col("net_op") == "D").collect()[0]
    assert d["ts"] == 20


def test_world_merge_replay_idempotent(spark, tmp_path):
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.world import World

    spec = WorldSpec(dims=(DimSpec("k", 0, 1023, 64),))
    world = World(spark, spec, str(tmp_path / "w"))
    base = _df(spark, [(1, "a", 10, 0, "U"), (2, "b", 10, 0, "U")])
    world.upsert(base.drop("op"))
    world.flush()

    changes = _df(
        spark,
        [(1, "a2", 20, 0, "U"), (2, "x", 20, 0, "D"), (3, "c", 20, 0, "U")],
    )
    net = net_changes(changes, base.select("k"), **KW)
    merge_net_into_world(world, net)
    world.flush()
    first = _state(world.snapshot().select("k", "val"))
    # at-least-once redelivery of the SAME net batch
    merge_net_into_world(world, net)
    world.flush()
    assert _state(world.snapshot().select("k", "val")) == first
    assert first == {(1, "a2"), (3, "c")}


def test_apply_changeset_plan_has_no_window_sort(spark):
    """The merge must stay a hash aggregate: a window/row_number plan
    would sort every change row at 100 TB. Pin: no WindowExec, and the
    aggregate carries max_by with a partial_max_by map-side phase."""
    from dmds_spark.plans import physical_plan

    base = _df(spark, [(1, "a", 10, 0, "U")])
    changes = _df(spark, [(1, "b", 20, 0, "U")])
    plan = physical_plan(apply_changeset(base, changes, **KW))
    assert "Window" not in plan
    assert "max_by" in plan
    assert "partial_max_by" in plan
