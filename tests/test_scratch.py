"""Scratch-dir lifecycle (core/scratch.py): per-invocation paths are
unique, and stale siblings are swept while fresh ones survive."""

import os
import time

from dmds_spark.core.scratch import STALE_AFTER_S, scratch_dir, sweep_stale


def test_paths_unique_and_sweep(tmp_path, monkeypatch):
    import dmds_spark.core.scratch as sc

    monkeypatch.setattr(sc, "_repo_root", lambda: str(tmp_path))
    a = sc.scratch_dir("k", "/data/sf0.01")
    b = sc.scratch_dir("k", "/data/sf0.01")
    assert a != b and a.startswith(str(tmp_path))
    kind_dir = os.path.dirname(a)

    os.makedirs(os.path.join(kind_dir, "stale_entry/sub"), exist_ok=True)
    os.makedirs(os.path.join(kind_dir, "fresh_entry"), exist_ok=True)
    old = time.time() - STALE_AFTER_S - 10
    os.utime(os.path.join(kind_dir, "stale_entry"), (old, old))

    removed = sweep_stale(kind_dir)
    assert removed == 1
    assert not os.path.exists(os.path.join(kind_dir, "stale_entry"))
    assert os.path.exists(os.path.join(kind_dir, "fresh_entry"))
    # a fresh mint also sweeps: plant another stale entry
    os.makedirs(os.path.join(kind_dir, "stale2"), exist_ok=True)
    os.utime(os.path.join(kind_dir, "stale2"), (old, old))
    sc.scratch_dir("k", "/data/sf0.01")
    assert not os.path.exists(os.path.join(kind_dir, "stale2"))


def test_sweep_missing_dir_is_noop(tmp_path):
    assert sweep_stale(str(tmp_path / "nope")) == 0
