"""Scale-safety helpers shared by every query/operator module.

Two hazards show up when a plan written against test-scale data meets
the 100 TB north star:

1. **Forced broadcasts of SF-proportional tables.** ``F.broadcast(dim)``
   is the right hint for a dimension that stays small forever (region,
   nation, a 20-row band table) but a death sentence for one that grows
   with the corpus (customer, supplier, part): at 10^9 rows the forced
   broadcast OOMs the driver before AQE can save you.
   :func:`maybe_broadcast` keeps the hint *conditional*: it asks
   Catalyst for the plan's estimated size (no job is run — parquet
   file-size statistics propagated through filter selectivity) and only
   attaches the hint below a byte gate. Above the gate the join falls
   back to whatever AQE picks at runtime (sort-merge, or a runtime
   broadcast if the *actual* post-filter size turns out tiny).

2. **Executor-local checkpoints as materialization barriers.**
   ``localCheckpoint`` truncates lineage and stores blocks on executors
   — perfect in local mode, fatal on a real cluster if an executor is
   lost (the block is gone and the lineage needed to recompute it was
   already cut). :func:`materialize` is the single switchable barrier:
   the default stays ``localCheckpoint`` (fastest, right for local and
   for short-lived intermediates), but one env var /
   ``spark.dmds.materialize`` conf flips every call site in the engine
   to a reliable ``checkpoint()`` or a written-parquet intermediate
   without touching query code.

Reference analogue: the reference engine's flush path always writes
through its ``IoHandle`` (tokio-fs/src/lib.rs write path) — i.e. its
only barrier is the durable one; ``materialize(mode="parquet")`` is
that behavior, and the local default is the test-scale shortcut.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Estimated-size gate for conditional broadcast hints. Catalyst's
# sizeInBytes for a parquet scan is the compressed file size scaled by
# filter selectivity, so this is deliberately generous relative to the
# session's 64 MiB autoBroadcastJoinThreshold: the hint exists to beat
# stale/zero statistics at test scale, the gate exists only to stop a
# clearly-huge table from being forced into the driver.
DEFAULT_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated size of ``df``'s optimized plan in bytes.

    Plan-time only — no Spark job. For file sources this derives from
    footer/file statistics; joins/aggregates multiply through, so the
    estimate is an upper bound more often than not (safe direction for
    a broadcast gate)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def maybe_broadcast(
    df: DataFrame, *, max_bytes: int | None = None
) -> DataFrame:
    """Attach ``F.broadcast`` only when the plan's estimated size is
    under the gate; otherwise return ``df`` unchanged (identity — tests
    pin this) so AQE picks the join strategy at runtime.

    Use for every SF-proportional dimension (customer, supplier, part).
    Constant-size tables (region, nation, literal band tables, 1-row
    aggregates) keep unconditional ``F.broadcast``."""
    if max_bytes is None:
        env = os.environ.get("SPARK_GRAFT_BROADCAST_MAX_BYTES")
        max_bytes = int(env) if env else DEFAULT_BROADCAST_MAX_BYTES
    if max_bytes >= 0 and estimated_size_bytes(df) <= max_bytes:
        return F.broadcast(df)
    return df


# Materialization barrier modes, in increasing durability / cost:
#   local    — df.localCheckpoint(eager): executor-local blocks, lineage
#              cut. Fastest; blocks die with an executor. The default.
#   reliable — df.checkpoint(eager): blocks written to the checkpoint
#              dir (any Hadoop FS — HDFS/S3 on a cluster); survives
#              executor loss.
#   parquet  — write a real parquet intermediate and read it back:
#              durable, restart-resumable, and the new read gets its
#              own file statistics (best for barriers whose output
#              feeds further joins).
_MODES = ("local", "reliable", "parquet")


def materialize_mode(spark=None) -> str:
    """Deployment's barrier mode: the ``SPARK_GRAFT_MATERIALIZE`` env
    var wins, then the ``spark.dmds.materialize`` session conf (so a
    cluster deployment can flip it in spark-defaults without touching
    the driver environment), then ``local``."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE")
    if mode is None and spark is not None:
        mode = spark.conf.get("spark.dmds.materialize", None)
    if mode is None:
        mode = "local"
    if mode not in _MODES:
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE / spark.dmds.materialize must be "
            f"one of {_MODES}, got {mode!r}"
        )
    return mode


# Per-process root for parquet-mode intermediates. Deliberately NOT
# under .scratch/: parquet barriers return a LAZY spark.read.parquet
# that is re-scanned on every downstream action, so a pipeline running
# past the scratch sweeper's staleness horizon (or a concurrent process
# minting scratch dirs) must never be able to delete files a live plan
# still references. mkdtemp gives a per-session dir nothing sweeps;
# deployments point SPARK_GRAFT_CHECKPOINT_DIR at a durable FS and
# parquet intermediates co-locate with reliable checkpoints there.
_MZ_ROOT: str | None = None
_MZ_SEQ = 0


def _materialize_path() -> str:
    global _MZ_ROOT, _MZ_SEQ
    if _MZ_ROOT is None:
        base = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if base:
            import uuid

            # uuid, not pid: drivers on different hosts (or containers,
            # where the driver is commonly pid 1) share the durable
            # checkpoint FS, and a colliding path would let one
            # driver's overwrite delete files another's live lazy
            # barrier still reads
            _MZ_ROOT = os.path.join(
                base, f"materialize_{uuid.uuid4().hex}"
            )
            os.makedirs(_MZ_ROOT, exist_ok=True)
        else:
            import tempfile

            _MZ_ROOT = tempfile.mkdtemp(prefix="dmds_spark_mz_")
    _MZ_SEQ += 1
    return os.path.join(_MZ_ROOT, f"mz_{_MZ_SEQ:06d}")


def materialize(df: DataFrame, *, mode: str | None = None) -> DataFrame:
    """Cut lineage and pin ``df``'s current contents behind a barrier.

    Every engine call site that needs 'compute once, consume many /
    freeze nondeterminism / break a self-overwrite cycle' goes through
    here; the barrier's durability is a deployment decision
    (``SPARK_GRAFT_MATERIALIZE=local|reliable|parquet``), not a query
    author's."""
    if mode is None:
        mode = materialize_mode(df.sparkSession)
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        spark = df.sparkSession
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            # NOT under .scratch/: checkpoint blocks live for the whole
            # session and checkpoint() CUTS lineage, so a concurrent
            # process's stale-sibling sweep (core/scratch.py) deleting
            # an hour-old dir would destroy blocks that cannot be
            # recomputed. Deployments set SPARK_GRAFT_CHECKPOINT_DIR to
            # a durable FS (HDFS/S3); the default is a per-session
            # local dir nothing else sweeps.
            ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            if not ckdir:
                import tempfile

                ckdir = tempfile.mkdtemp(prefix="dmds_spark_ck_")
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=True)
    if mode == "parquet":
        spark = df.sparkSession
        path = _materialize_path()
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    raise ValueError(f"unknown materialize mode {mode!r}")
