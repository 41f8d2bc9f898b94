"""Cross-process single-writer discipline for World (SURVEY §7 "hard
parts": chunk-granularity dynamic partition overwrite must be safe
against concurrent writers). The lock protocol is pure file ops, so
the second "session" is a real second PROCESS (subprocess) — no second
SparkSession needed to prove exclusion."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from dmds_spark.core.errors import WorldLockedError
from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.world import World, WriterLock

SPEC = WorldSpec(dims=(DimSpec("x", 0, 63, 8), DimSpec("y", 0, 63, 8)))


def _try_acquire_in_subprocess(path: str) -> dict:
    """Run a second OS process that attempts to take the writer lock;
    returns {"acquired": bool, "error": str|None}."""
    code = (
        "import json, sys\n"
        "sys.path.insert(0, %r)\n"
        "from dmds_spark.world import WriterLock\n"
        "from dmds_spark.core.errors import WorldLockedError\n"
        "lk = WriterLock(%r)\n"
        "try:\n"
        "    lk.acquire()\n"
        "    lk.release()\n"
        "    print(json.dumps({'acquired': True, 'error': None}))\n"
        "except WorldLockedError as e:\n"
        "    print(json.dumps({'acquired': False, 'error': str(e)}))\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_second_process_excluded_until_close(spark, tmp_path):
    path = str(tmp_path / "w")
    w = World(spark, SPEC, path, validate="off")
    w.insert_rows([{"x": 1, "y": 2, "v": 10}])  # takes the writer lock

    second = _try_acquire_in_subprocess(path)
    assert second["acquired"] is False
    assert "write-locked" in second["error"]

    w.close()  # flush + release
    # data made it down and the lock is gone
    assert os.path.exists(path)
    assert not os.path.exists(os.path.join(path, WriterLock.FILENAME))
    third = _try_acquire_in_subprocess(path)
    assert third["acquired"] is True


def test_same_process_second_instance_adopts(spark, tmp_path):
    """Two World instances in ONE process must not deadlock each other
    (intra-process coordination is the threading locks' job — the
    reference's lock_w is per-World too)."""
    path = str(tmp_path / "w")
    a = World(spark, SPEC, path, validate="off")
    a.insert_rows([{"x": 1, "y": 2, "v": 10}])
    b = World(spark, SPEC, path, validate="off")
    b.insert_rows([{"x": 2, "y": 3, "v": 20}])  # adopts, no error
    a.close()
    b.close()
    got = {
        (r["x"], r["y"], r["v"])
        for r in spark.read.parquet(path).select("x", "y", "v").collect()
    }
    assert got == {(1, 2, 10), (2, 3, 20)}


def test_stale_same_host_lock_is_broken(tmp_path):
    """A lock whose recorded pid is dead on this host is stale: the
    next acquire breaks it automatically."""
    path = str(tmp_path / "w")
    os.makedirs(path)
    # a pid that cannot be alive: fork-bomb-free sentinel way past
    # pid_max default; if it IS alive on some exotic host, the test
    # env is broken in ways we want to hear about
    with open(os.path.join(path, WriterLock.FILENAME), "w") as fh:
        json.dump(
            {"pid": 2**22 + 1234567, "host": __import__("socket").gethostname(),
             "token": "dead", "acquired_at": 0}, fh,
        )
    lk = WriterLock(path)
    lk.acquire()  # breaks the stale lock instead of raising
    assert json.load(open(os.path.join(path, WriterLock.FILENAME)))[
        "token"
    ] == lk.token
    lk.release()
    assert not os.path.exists(os.path.join(path, WriterLock.FILENAME))


def test_foreign_host_lock_raises_and_break_lock_clears(tmp_path):
    """Liveness on another host is undecidable: acquire must refuse,
    and the explicit break_lock escape hatch must clear it."""
    path = str(tmp_path / "w")
    os.makedirs(path)
    with open(os.path.join(path, WriterLock.FILENAME), "w") as fh:
        json.dump(
            {"pid": 1, "host": "some-other-host.example", "token": "x",
             "acquired_at": 0}, fh,
        )
    lk = WriterLock(path)
    with pytest.raises(WorldLockedError, match="some-other-host"):
        lk.acquire()
    assert World.break_lock(path) is True
    assert World.break_lock(path) is False  # idempotent
    lk.acquire()
    lk.release()


def test_release_leaves_foreign_token_alone(tmp_path):
    """release() must not delete a lock that was broken and re-taken
    by someone else (token mismatch)."""
    path = str(tmp_path / "w")
    lk = WriterLock(path)
    lk.acquire()
    # simulate a (wrongful) break + re-acquire by another writer
    os.unlink(lk.path)
    with open(lk.path, "w") as fh:
        json.dump({"pid": os.getpid(), "host": "h", "token": "other"}, fh)
    lk.release()
    assert os.path.exists(lk.path)  # the other writer's token survives
    os.unlink(lk.path)
