"""Per-invocation scratch directories for write-path queries.

Queries that exercise the World / incremental-store write paths
(dmds_crud_snapshot, rollup_incremental_*, dedup_incremental_minhash,
dmds_u64_snapshot, ...) materialize real parquet under
``<repo>/.scratch/<kind>/<sf>_<uuid>`` — one fresh directory per
invocation so concurrent evaluations (a bench pass overlapping the
correctness driver) never rmtree each other's live chunk tree
mid-read.

Freshness-per-invocation means the tree GROWS forever without a
sweeper: five measured bench passes per round times ~7 write-path
queries left ~350 MB of dead worlds after eight rounds. ``scratch_dir``
therefore garbage-collects SIBLING entries older than STALE_AFTER_S
(mtime of the entry root) before minting the new path — any concurrent
evaluation is minutes long, so an hour-old sibling is provably dead,
and the sweep is best-effort (races with another sweeper just mean
someone else already removed it).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

STALE_AFTER_S = 3600


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sweep_stale(kind_dir: str, stale_after_s: int = STALE_AFTER_S) -> int:
    """Remove entries under ``kind_dir`` whose mtime is older than the
    threshold. Best-effort: every error is swallowed (a concurrent
    sweeper or a live evaluation owning the entry both surface as
    transient FS errors). Returns entries removed."""
    removed = 0
    try:
        entries = os.listdir(kind_dir)
    except OSError:
        return 0
    cutoff = time.time() - stale_after_s
    for name in entries:
        path = os.path.join(kind_dir, name)
        try:
            if os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Fresh per-invocation scratch path (not created yet) under
    ``.scratch/<kind>/``, sweeping stale siblings first."""
    kind_dir = os.path.join(_repo_root(), ".scratch", kind)
    sweep_stale(kind_dir)
    return os.path.join(
        kind_dir,
        os.path.basename(sf_dir.rstrip("/")) + "_" + uuid.uuid4().hex[:12],
    )
