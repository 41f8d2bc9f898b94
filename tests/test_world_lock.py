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


def test_same_process_second_instance_shares_interned_lock(spark, tmp_path):
    """Two World instances in ONE process share the SAME interned
    WriterLock — one flush mutex (real mutual exclusion, not two
    separate threading.Locks) and one refcounted file token that
    survives until the LAST close."""
    path = str(tmp_path / "w")
    a = World(spark, SPEC, path, validate="off")
    a.insert_rows([{"x": 1, "y": 2, "v": 10}])
    b = World(spark, SPEC, path, validate="off")
    b.insert_rows([{"x": 2, "y": 3, "v": 20}])  # refcounts, no error
    assert a._writer_lock is b._writer_lock
    assert a._lock is b._lock  # shared flush mutex
    a.close()
    # b still writes: the token must survive a's close
    assert os.path.exists(os.path.join(path, WriterLock.FILENAME))
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


def test_second_direct_writerlock_same_process_raises(tmp_path):
    """A second independently-constructed WriterLock on the same dir
    (i.e. not via for_dir) must RAISE, not adopt: the old adoption path
    gave two same-process writers no shared mutual exclusion."""
    path = str(tmp_path / "w")
    a = WriterLock(path)
    a.acquire()
    b = WriterLock(path)
    with pytest.raises(WorldLockedError):
        b.acquire()
    a.release()


def test_stale_break_race_exactly_one_winner(tmp_path):
    """N processes race to break the SAME stale lock and acquire: the
    TOCTOU hazard is two breakers both unlinking (the second unlink
    removing the first winner's NEW lock), leaving two live writers.
    With the flock-serialized rename-verify break, exactly one racer
    must win and its token must be the one on disk at the end."""
    path = str(tmp_path / "w")
    os.makedirs(path)
    with open(os.path.join(path, WriterLock.FILENAME), "w") as fh:
        json.dump(
            {"pid": 2**22 + 7654321,
             "host": __import__("socket").gethostname(),
             "token": "stale", "acquired_at": 0}, fh,
        )
    code = (
        "import json, sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from dmds_spark.world import WriterLock\n"
        "from dmds_spark.core.errors import WorldLockedError\n"
        "time.sleep(0.05)  # let all racers start\n"
        "lk = WriterLock(%r)\n"
        "try:\n"
        "    lk.acquire()\n"
        "    time.sleep(0.3)  # HOLD while the losers finish: a losing\n"
        "    # breaker that wrongly unlinks would now hit OUR live lock\n"
        "    ondisk = json.load(open(lk.path))\n"
        "    lk.release()\n"
        "    print(json.dumps({'acquired': True,\n"
        "                      'saw_own_token': ondisk['token'] == lk.token}))\n"
        "except WorldLockedError:\n"
        "    print(json.dumps({'acquired': False, 'saw_own_token': None}))\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), path)
    procs = [
        subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(6)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=60)
        assert p.returncode == 0
        results.append(json.loads(out.strip().splitlines()[-1]))
    winners = [r for r in results if r["acquired"]]
    assert len(winners) == 1, results
    # the winner's lock was never clobbered by a losing breaker
    assert winners[0]["saw_own_token"] is True
    # and the stale lock is gone for good: a fresh acquire succeeds
    lk = WriterLock(path)
    lk.acquire()
    lk.release()


def test_break_lock_restores_retaken_lock(tmp_path):
    """World.break_lock must not discard a lock that was re-taken
    between the caller's read and the break (rename-verify): simulate
    by breaking once, re-creating with a new token via a racing
    acquire, then verifying a stale-handle break attempt of the OLD
    content is refused... exercised here at the primitive level: the
    renamed content check restores on token mismatch."""
    path = str(tmp_path / "w")
    lk = WriterLock(path)
    lk.acquire()
    # break_lock reads the live holder then rename-verifies: content
    # still matches what it read, so it removes it (documented escape
    # hatch for live writers too)
    assert World.break_lock(path) is True
    assert not os.path.exists(lk.path)
    assert World.break_lock(path) is False  # idempotent
    lk._refs = 0  # manual: the file is gone, don't unlink on release


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


def test_racing_first_writes_take_exactly_one_ref(spark, tmp_path):
    """Two threads racing the FIRST mutating op on one World must
    refcount into the writer token exactly once (world.py _append_op:
    the check-and-acquire runs under the shared path mutex). The
    pre-fix failure mode was refs=2 with a single release at close(),
    orphaning the lock file for the process lifetime."""
    import threading
    import time

    path = str(tmp_path / "w")
    w = World(spark, SPEC, path, validate="off")
    df_a = spark.createDataFrame([(1, 2, 10)], "x long, y long, v long")
    df_b = spark.createDataFrame([(2, 3, 20)], "x long, y long, v long")

    # widen the race window deterministically: the first thread to
    # reach acquire() parks inside it, so an unguarded check in the
    # second thread would also see _writer_ref == False and acquire
    orig_acquire = w._writer_lock.acquire
    calls = []

    def slow_acquire():
        calls.append(threading.get_ident())
        time.sleep(0.3)
        orig_acquire()

    w._writer_lock.acquire = slow_acquire
    try:
        errs = []

        def write(df):
            try:
                w.upsert(df)
            except Exception as e:  # noqa: BLE001 — surfaced below
                errs.append(e)

        ts = [threading.Thread(target=write, args=(d,)) for d in (df_a, df_b)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert not errs, errs
    finally:
        w._writer_lock.acquire = orig_acquire

    assert len(calls) == 1, "both racers entered acquire()"
    assert w._writer_lock._refs == 1
    w.close()
    assert w._writer_lock._refs == 0
    assert not os.path.exists(os.path.join(path, WriterLock.FILENAME))
    # the path is genuinely free for the next writer process
    nxt = _try_acquire_in_subprocess(path)
    assert nxt["acquired"] is True
    got = {
        (r["x"], r["y"], r["v"])
        for r in spark.read.parquet(path).select("x", "y", "v").collect()
    }
    assert got == {(1, 2, 10), (2, 3, 20)}
