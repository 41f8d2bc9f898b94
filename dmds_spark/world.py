"""``World`` — the engine's counterpart of the reference's
``World<T, DIMS, Io>`` (reference: src/world.rs:251-267), re-expressed
as a chunk-partitioned Parquet table plus a pending-writes buffer.

Mapping (SURVEY.md §1.5):

- the chunk grid (reference: src/range.rs, src/world.rs:198-250) becomes
  Hive-style partition columns ``c0=…/c1=…`` computed as
  ``floor((dim_i - start_i) / spacing_i)``, so Catalyst partition pruning
  plays the role of the reference's Shape-driven chunk enumeration;
- the in-memory dirty buffer pool (``chunks_buf``, src/world.rs:254) is
  a driver-tracked op log of upsert/delete batches, merged into every
  read (the reference's iterator likewise merges buffered chunks with
  on-disk chunks, src/world/iter.rs:726-750);
- ``insert``/``try_insert``/``remove`` (src/world.rs:553-584,77-87) are
  batch operations keyed on dim 0;
- relocation (``Lazy::close``, src/world/iter.rs:193-211) is automatic:
  partition columns are recomputed from the new dim values at flush;
- flush (``Chunk::write_buf`` + ``FsHandle::write_chunk``,
  src/world.rs:96-122, tokio-fs/src/lib.rs:85-107) is a
  dynamic-partition-overwrite rewrite of exactly the dirty chunks —
  the same whole-chunk-rewrite granularity as the reference.

Scale design (100 TB): a huge logical grid must not produce millions of
tiny files, so each dimension takes a ``physical_factor`` that groups
``factor`` adjacent chunks into one physical partition directory. The
planner's pruning stays exact: value predicates are always applied, and
the partition predicate is widened by the factor (still a contiguous
range — no precision loss at the directory level beyond the grouping).
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import threading
import time
import uuid
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dmds_spark.core.dims import WorldSpec
from dmds_spark.core.select import Select, Shape
from dmds_spark.core.errors import (
    ValueOutOfRangeError,
    WorldFencedError,
    WorldLockedError,
)
from dmds_spark.core.engine import materialize


class WriterLock:
    """Cross-process single-writer token for a world directory: a
    ``_writer.lock`` file created with O_CREAT|O_EXCL (atomic on POSIX
    and on HDFS-compatible stores' create-exclusive), holding the
    writer's pid/host/session token. The lock file lives in a SIBLING
    directory (``<path>.lockd/``), never inside the Spark-owned data
    directory: a static-mode ``INSERT OVERWRITE`` deletes the whole
    target directory before writing, and round 14 proved a lock stored
    inside it gets wiped by the engine's own first flush under a
    default-config session (``partitionOverwriteMode=STATIC``), fencing
    the writer against its own write. Mutual-exclusion state must not
    share a directory with data any engine rewrite can clobber. The in-process ``threading.Lock``
    serializes flush-vs-writer within one session (the reference's
    ``lock_w``, src/world.rs:58, guards a single process the same
    way); THIS lock extends the single-writer discipline across
    processes sharing the filesystem, which chunk-granularity dynamic
    partition overwrite requires (two writers flushing from different
    base snapshots would silently drop each other's rows).

    Process-wide interning (``WriterLock.for_dir``): every ``World``
    on the same realpath shares ONE instance — one flush ``mutex``
    (so two same-process writers on the same directory really are
    mutually excluded, not just holding separate ``threading.Lock``s)
    and one refcounted file token (first acquire creates the file,
    last release removes it).

    Failure modes, documented:
    - A crashed writer leaves a stale lock. Same-host staleness is
      detected (recorded pid no longer alive) and the lock is broken
      automatically on the next acquire. Concurrent breakers are
      serialized on a flock'd sidecar (``_writer.lock.break``) that
      the kernel releases on process death, and the break itself is a
      rename-to-unique-name + content re-verify — so a NEW holder's
      lock that appears between a waiter's staleness read and its
      break is never discarded (the classic unlink-break TOCTOU).
    - CROSS-HOST staleness is handled by lease: a holder that opts in
      (``heartbeat(lease_sec)`` — ``FlushDaemon`` does this every
      interval) records ``heartbeat_at``/``lease_sec`` in the lock
      file, and any waiter may reclaim a lock whose lease has expired,
      through the same sidecar-serialized, re-verified break path. A
      holder that never heartbeats (no daemon) writes no lease and is
      NEVER auto-reclaimed cross-host — break it explicitly with
      ``World.break_lock(path)`` after confirming the writer is dead.
      Lease clocks are wall clocks on different hosts: pick lease_sec
      >> heartbeat interval + worst-case clock skew (the daemon's
      default is 10 intervals, floor 60 s).
    - The lock is ADVISORY: it fences cooperating ``World`` writers
      only. A rogue process writing parquet into the directory without
      going through ``World`` is not stopped (plain parquet layouts
      have no server to enforce leases; same trust model as the
      reference's in-process lock).
    - Fencing token at commit points: ``verify_token()`` re-reads the
      lock file immediately before every manifest/pointer commit
      (``World.flush``/``compact``, IVF pointer flips) and raises
      ``WorldFencedError`` if the token changed — a live writer whose
      lock was broken (manually or by lease reclaim) aborts BEFORE
      clobbering the new holder's state. The residual window is the
      non-versioned dynamic partition overwrite itself, which is not
      atomic: the check runs before the write starts, so prefer
      ``versioned=True`` worlds where concurrent breakers are a real
      possibility (their data writes land in fresh ``_v{N}`` dirs and
      only the verified manifest flip publishes them)."""

    FILENAME = "_writer.lock"
    LOCK_DIR_SUFFIX = ".lockd"

    _BY_DIR: dict[str, "WriterLock"] = {}
    _BY_DIR_GUARD = threading.Lock()

    @classmethod
    def lock_path(cls, dir_path: str) -> str:
        """Filesystem path of the lock file guarding ``dir_path`` — in
        the sibling ``<dir>.lockd/`` directory, OUTSIDE the data dir
        (see class docstring for why it must not live inside)."""
        return os.path.join(
            dir_path.rstrip("/") + cls.LOCK_DIR_SUFFIX, cls.FILENAME
        )

    @classmethod
    def for_dir(cls, dir_path: str) -> "WriterLock":
        """The process-wide interned lock for a directory. ``World``
        always goes through here, so N same-process Worlds on one path
        share one flush mutex and one refcounted token — the shared
        mutual exclusion a per-instance ``threading.Lock`` could not
        give them."""
        key = os.path.realpath(dir_path)
        with cls._BY_DIR_GUARD:
            lk = cls._BY_DIR.get(key)
            if lk is None:
                lk = cls(dir_path)
                cls._BY_DIR[key] = lk
            return lk

    def __init__(self, dir_path: str):
        self.dir_path = dir_path
        self.path = self.lock_path(dir_path)
        self.token = uuid.uuid4().hex
        # flush-vs-writer serialization, shared across all Worlds on
        # this path via for_dir (the reference's lock_w, src/world.rs:58)
        self.mutex = threading.Lock()
        self._mu = threading.Lock()  # guards _refs + lock-file ops
        self._refs = 0
        # monotone on-disk-state version, bumped by every flush /
        # compact through ANY World on this path (interned, so all
        # same-process instances see it): the invalidation key for
        # each World's cached base relation (see World._base)
        self.data_version = 0

    def _holder(self) -> dict | None:
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None  # vanished or torn write: treat as contended

    @staticmethod
    def _alive_same_host(holder: dict | None) -> bool | None:
        """True/False when the holder's liveness is decidable (same
        host), None when it is not (other host or unreadable)."""
        if not holder or holder.get("host") != socket.gethostname():
            return None
        try:
            os.kill(int(holder["pid"]), 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by another user
        except (OSError, ValueError):
            return None

    @staticmethod
    def _lease_expired(holder: dict | None) -> bool:
        """True iff the holder OPTED INTO leasing (wrote both
        ``heartbeat_at`` and ``lease_sec``) and the lease has lapsed.
        A lease-less lock never expires — only holders that promise
        heartbeats can be reclaimed on missed heartbeats."""
        if not holder:
            return False
        try:
            hb = float(holder["heartbeat_at"])
            lease = float(holder["lease_sec"])
        except (KeyError, TypeError, ValueError):
            return False
        return time.time() - hb > lease

    def _is_stale(self, holder: dict | None) -> bool:
        """A lock is stale when its holder is PROVABLY gone: same-host
        pid dead (exact), or cross-host/undecidable with an expired
        lease. A live same-host pid is never stale, even with a lapsed
        lease — the pid probe is strictly better evidence."""
        alive = self._alive_same_host(holder)
        if alive is not None:
            return not alive
        return self._lease_expired(holder)

    def acquire(self) -> None:
        """Take (or refcount into) the writer token. Each caller must
        pair its acquire with exactly one release; ``World`` tracks its
        own ref so per-op calls stay O(1) with no lock-file re-parse."""
        with self._mu:
            if self._refs > 0:
                self._refs += 1
                return
            self._acquire_file()
            self._refs = 1

    def _acquire_file(self) -> None:
        os.makedirs(self.dir_path, exist_ok=True)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        now = time.time()
        payload = json.dumps(
            {
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "token": self.token,
                "acquired_at": now,
                # lease fields land with the first heartbeat(); until
                # then heartbeat_at alone (no lease_sec) never expires
                "heartbeat_at": now,
            }
        ).encode()
        for _ in range(5):  # stale breaks + create races, bounded
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, payload)
                finally:
                    os.close(fd)
                return
            except FileExistsError:
                holder = self._holder()
                if holder is None:
                    continue  # vanished or torn mid-read: retry create
                if self._is_stale(holder):
                    # same-host dead pid, or cross-host expired lease:
                    # stale. Break under the flock'd sidecar; retry the
                    # create either way (False = another breaker is on
                    # it — its finish frees the path for the next
                    # iteration).
                    self._break_stale(holder)
                    continue
                # live, undecidable, or OUR OWN pid outside this
                # interned instance (a second direct WriterLock on the
                # same dir — a programming error; Worlds share via
                # for_dir): refuse rather than adopt, adoption gave two
                # writers no shared mutual exclusion.
                raise WorldLockedError(self.dir_path, holder)
        raise WorldLockedError(self.dir_path, self._holder() or {})

    def _break_stale(self, holder: dict) -> bool:
        """Remove the lock file ONLY if it still belongs to ``holder``
        and is still stale under the sidecar mutex (same-host pid
        verified dead, or cross-host lease verified expired — a
        heartbeat that lands before the re-read rescues the holder).
        Breakers serialize on a flock'd sidecar — flock is
        kernel-released on process death, so the break mutex itself
        cannot go stale — and the removal is rename-to-unique +
        re-verify, never a blind unlink: a new holder's lock that
        raced in is renamed back, not discarded."""
        try:
            import fcntl
        except ImportError:  # non-POSIX: no safe auto-break
            return False
        fd = os.open(self.path + ".break", os.O_CREAT | os.O_RDWR, 0o644)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                return False  # another breaker mid-break
            cur = self._holder()
            if cur is None:
                return True  # already broken
            if cur.get("token") != holder.get("token"):
                return False  # a new holder took over — contended
            if not self._is_stale(cur):
                return False  # revived / heartbeated under the mutex
            moved = f"{self.path}.broken.{self.token}"
            try:
                os.rename(self.path, moved)
            except FileNotFoundError:
                return True
            try:
                with open(moved) as fh:
                    content = json.load(fh)
            except (OSError, ValueError):
                content = None
            if content is not None and content.get("token") != cur.get(
                "token"
            ):
                # unreachable while every breaker honors the sidecar
                # mutex; restore rather than discard a live token
                os.rename(moved, self.path)
                return False
            os.unlink(moved)
            return True
        finally:
            os.close(fd)  # releases the flock

    def heartbeat(self, lease_sec: float) -> bool:
        """Refresh this holder's lease: rewrite the lock file with a
        fresh ``heartbeat_at`` and the promised ``lease_sec`` (atomic
        temp + rename; readers see old or new, never torn). Writing the
        lease is the holder's OPT-IN to cross-host reclaim — miss
        heartbeats for longer than lease_sec and any waiter may break
        the lock, so call this from a live loop (``FlushDaemon`` does),
        never from ad-hoc code. Returns False without writing when we
        do not hold the lock (released, broken, or reclaimed) — the
        caller's next commit will be fenced by ``verify_token``.

        The read-verify-replace runs UNDER the same flock'd breaker
        sidecar the stale-break path uses: otherwise a zombie holder's
        delayed heartbeat (read before a reclaim, replace after) would
        clobber the NEW holder's lock file and invert the fencing
        guarantee — the new holder gets fenced, the zombie commits.
        Under the sidecar, either the heartbeat lands first (the
        breaker's re-check then sees a fresh lease and aborts) or the
        reclaim lands first (the heartbeat's re-read sees the new
        token and returns False). Without flock (non-POSIX) heartbeats
        refuse rather than race — leases then simply never refresh,
        degrading to the explicit break_lock story."""
        with self._mu:
            if self._refs == 0:
                return False
            try:
                import fcntl
            except ImportError:
                return False  # no safe CAS: do not lease on this OS
            fd = os.open(self.path + ".break", os.O_CREAT | os.O_RDWR,
                         0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)  # blocking: breaks are
                #                                 short (rename+verify)
                holder = self._holder()
                if not holder or holder.get("token") != self.token:
                    return False  # broken/reclaimed: do not resurrect
                payload = {
                    **holder,
                    "heartbeat_at": time.time(),
                    "lease_sec": float(lease_sec),
                }
                tmp = f"{self.path}.hb.{self.token}"
                with open(tmp, "w") as fh:
                    json.dump(payload, fh)
                os.replace(tmp, self.path)
                return True
            finally:
                os.close(fd)  # releases the flock

    def verify_token(self) -> None:
        """Fencing check for commit points: re-read the lock file and
        raise ``WorldFencedError`` unless it still carries OUR token.
        Called immediately before every manifest/pointer flip and
        before a non-versioned partition overwrite starts, so a writer
        whose lock was broken or lease-reclaimed mid-write aborts
        instead of clobbering the new holder's state."""
        holder = self._holder()
        if self._refs == 0 or not holder or holder.get("token") != self.token:
            raise WorldFencedError(self.dir_path, holder or {})

    def release(self) -> None:
        with self._mu:
            if self._refs == 0:
                return
            self._refs -= 1
            if self._refs > 0:
                return
            holder = self._holder()
            # only remove our own token (a broken-then-reacquired lock
            # belongs to someone else now)
            if holder and holder.get("token") == self.token:
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass
            # best-effort sibling-dir cleanup: rmdir succeeds only when
            # empty. The ``.break`` sidecar is deliberately NOT
            # unlinked — a concurrent breaker may hold its flock, and
            # replacing a flocked inode would give two breakers two
            # different sidecars (no serialization). A store that ever
            # heartbeated or broke a stale lock therefore keeps its
            # ``<dir>.lockd/`` with that one file — bounded, documented
            # litter; callers deleting a store should rmtree the
            # sibling too.
            try:
                os.rmdir(os.path.dirname(self.path))
            except OSError:
                pass


class World:
    """A dimensional store over partitioned Parquet.

    ``dim_cols`` come from the spec; any extra columns in upserted
    DataFrames are the payload (the reference's opaque versioned payload,
    src/lib.rs:26-49 — here decoded columns, the idiomatic-Spark choice
    documented in SURVEY.md §1.5).
    """

    def __init__(
        self,
        spark: SparkSession,
        spec: WorldSpec,
        path: str,
        physical_factors: Sequence[int] | None = None,
        pending_limit: int | None = 64,
        validate: str = "flush",
        versioned: bool = False,
    ):
        self.spark = spark
        self.spec = spec
        # versioned=True: every flush/compact COMMITS a new immutable
        # snapshot version instead of overwriting partitions in place —
        # data files go to append-only ``_v{N}/`` directories and a
        # manifest maps each live partition to the version that owns
        # its current rows (Iceberg-lite). ``snapshot(version=K)``
        # reads any retained committed state; ``vacuum_snapshots``
        # reclaims. The reference's 4-byte version header
        # (tokio-fs/src/lib.rs:89-90) generalized from payload bytes to
        # table state. Manifests are local-FS JSON (same constraint as
        # the WriterLock files). The ``_`` prefix is deliberate: Spark
        # file indexes treat it as hidden (same convention as
        # ``_delta_log``), so a naive ``spark.read.parquet(root)`` of a
        # versioned world sees NOTHING instead of double-counting every
        # version — readers must come through the manifest. Each commit
        # logs one cosmetic "DataSource: All paths were ignored" WARN
        # (write-side resolution of the hidden target dir); explicit
        # per-directory reads are unaffected.
        self.versioned = bool(versioned)
        self._dim_index = {d.name: i for i, d in enumerate(spec.dims)}
        self.path = path
        if physical_factors is None:
            # default: bound physical partition count to ~4096 dirs total
            physical_factors = self._default_factors(spec)
        if len(physical_factors) != spec.ndims:
            raise ValueError("physical_factors rank mismatch")
        self.factors = tuple(int(f) for f in physical_factors)
        # pending op log: list of (seq, kind, DataFrame) — kind in
        # {"upsert", "delete"}; the reference's dirty-chunk buffer pool
        # (src/world.rs:254) with explicit op ordering instead of locks
        self._ops: list[tuple[int, str, DataFrame]] = []
        self._seq = 0
        # cross-process single-writer token + per-path flush mutex,
        # interned so every World on this path shares BOTH (see
        # WriterLock for the protocol and its failure modes); the token
        # is taken lazily at the first mutating op, held until close()
        self._writer_lock = WriterLock.for_dir(path)
        self._lock = self._writer_lock.mutex  # reference lock_w, src/world.rs:58
        self._writer_ref = False
        # (version, DataFrame|None) — see _base(); keyed on the
        # interned lock's data_version so any same-process flush
        # invalidates it
        self._base_cache: tuple[int, DataFrame | None] | None = None
        # buffer cap (reference ``World::set_chunks_limit`` eviction,
        # src/world.rs:295-299,462-512): past the limit the op log
        # auto-flushes, so read planning cost and driver references stay
        # bounded however long the writer session lives. None = unbounded.
        self.set_pending_limit(pending_limit)
        if validate not in ("eager", "flush", "off"):
            raise ValueError("validate must be eager|flush|off")
        # "eager": range-check each batch at upsert (one collect per
        # batch — the batch is computed twice). "flush": fold the check
        # into the flush pass as raise_error guards on the dim columns
        # (one scan produces both the check and the write). "off": trust
        # the writer.
        self.validate = validate

    # -- geometry -----------------------------------------------------------

    @staticmethod
    def _default_factors(spec: WorldSpec, target_dirs: int = 4096) -> tuple[int, ...]:
        """Pick per-dim grouping factors so the physical directory count
        stays bounded however large the logical grid is."""
        factors = [1] * spec.ndims
        def total(fs):
            t = 1
            for d, f in zip(spec.dims, fs):
                t *= max(1, -(-d.chunks_len // f))
            return t
        while total(factors) > target_dirs:
            # double the factor of the dim with the most physical chunks
            i = max(
                range(spec.ndims),
                key=lambda j: -(-spec.dims[j].chunks_len // factors[j]),
            )
            factors[i] *= 2
        return tuple(factors)

    def partition_cols(self) -> list[str]:
        return [f"c{i}" for i in range(self.spec.ndims)]

    @staticmethod
    def _dim_lit(d, v: int):
        """Typed literal in the dim's column domain: DECIMAL(20,0) for
        u64 dims (values past 2^63 don't fit a long literal), plain
        long otherwise."""
        if d.u64:
            return F.expr(f"CAST('{int(v)}' AS DECIMAL(20,0))")
        return F.lit(int(v))

    def _with_partition_cols(self, df: DataFrame) -> DataFrame:
        """Append physical partition columns computed from dim values —
        the reference's ``chunk_pos_of_data`` routing
        (src/world.rs:544-551) divided by the grouping factor.

        Integer ``div`` end to end, never double division: floor((v-s)/
        spacing) over doubles mis-buckets once v-s exceeds the 53-bit
        mantissa (a value just below a chunk boundary rounds up across
        it), and u64 dims don't fit a double at all. ``div`` is exact
        on both long and decimal operands and returns a long."""
        for i, (d, f) in enumerate(zip(self.spec.dims, self.factors)):
            start = (
                f"CAST('{d.start}' AS DECIMAL(20,0))" if d.u64 else f"{d.start}L"
            )
            df = df.withColumn(
                f"c{i}",
                F.expr(
                    f"((`{d.name}` - {start}) div {d.spacing}) div {int(f)}"
                ).cast("long"),
            )
        return df

    def _physical_partition_predicate(self, shape: Shape):
        """Chunk-index Shape -> predicate over physical partition cols.
        Chunk ranges are widened to the physical grouping (floor-div by
        factor) — pruning stays correct, value predicates stay exact."""
        if shape.is_none():
            return F.lit(False)
        pred = None
        for box in shape.boxes:
            box_pred = None
            for i, (s, e) in enumerate(zip(box.start, box.end)):
                d, f = self.spec.dims[i], self.factors[i]
                ps, pe = s // f, e // f
                full = (d.chunks_len - 1) // f
                if ps == 0 and pe == full:
                    continue
                c = F.col(f"c{i}")
                p = (c == ps) if ps == pe else ((c >= ps) & (c <= pe))
                box_pred = p if box_pred is None else (box_pred & p)
            if box_pred is None:
                box_pred = F.lit(True)
            pred = box_pred if pred is None else (pred | box_pred)
        return pred

    # -- schema / validation -------------------------------------------------

    def _validate_dims(self, df: DataFrame) -> None:
        for d in self.spec.dims:
            if d.name not in df.columns:
                raise ValueError(f"missing dim column {d.name}")

    def _check_domain(self, df: DataFrame) -> DataFrame:
        """Eager range check (``validate="eager"``), mirroring
        ``Error::ValueOutOfRange`` (src/lib.rs:136-142). Runs as one
        aggregate over the batch (no driver-side row loop) — but it DOES
        force the batch to be computed once here and again at flush;
        the default ``validate="flush"`` mode avoids that."""
        conds = [
            (
                F.min(F.col(d.name) >= self._dim_lit(d, d.start))
                & F.min(F.col(d.name) <= self._dim_lit(d, d.end))
            ).alias(d.name)
            for d in self.spec.dims
        ]
        row = df.agg(*conds).collect()[0]
        for i, d in enumerate(self.spec.dims):
            ok = row[d.name]
            if ok is False:
                raise ValueOutOfRangeError(i, -1, d.start, d.end)
        return df

    _GUARD_MARK = "DMDS_RANGE"

    def _domain_guard(self, df: DataFrame) -> DataFrame:
        """Wrap each dim column in a raise_error guard: the check runs
        inside the same executor pass that materializes the flush
        output — zero extra scans, fully distributed. The error message
        carries dim index + bounds so the driver re-raises a typed
        ValueOutOfRangeError (``_reraise_domain``)."""
        cols = []
        for i, d in enumerate(self.spec.dims):
            c = F.col(d.name)
            bad = c.isNotNull() & (
                (c < self._dim_lit(d, d.start)) | (c > self._dim_lit(d, d.end))
            )
            msg = F.concat(
                F.lit(f"{self._GUARD_MARK}:{i}:{d.start}:{d.end}:"),
                c.cast("string"),
            )
            cols.append(F.when(bad, F.raise_error(msg)).otherwise(c).alias(d.name))
        guarded = {d.name for d in self.spec.dims}
        return df.select(
            *cols, *[F.col(c) for c in df.columns if c not in guarded]
        )

    def _reraise_domain(self, exc: Exception):
        """Translate an executor-side guard failure back into the typed
        error; re-raise the original otherwise."""
        import re

        m = re.search(rf"{self._GUARD_MARK}:(\d+):(-?\d+):(-?\d+):(-?\d+)", str(exc))
        if m:
            dim, start, end, val = (int(g) for g in m.groups())
            raise ValueOutOfRangeError(dim, val, start, end) from exc
        raise exc

    # -- lifecycle -----------------------------------------------------------

    def exists(self) -> bool:
        """True iff the world has any persisted data files. Uses the
        Hadoop FileSystem API so any supported scheme (file/hdfs/s3a)
        works; empty partition-directory skeletons don't count."""
        if self.versioned:
            v = self.current_version()
            return v > 0 and bool(self._read_owner(v))
        jvm = self.spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(self.spark.sparkContext._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return False
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            name = it.next().getPath().getName()
            if name.endswith(".parquet"):
                return True
        return False

    def _base(self) -> DataFrame | None:
        """The persisted base relation, cached per on-disk-state
        version. ``spark.read.parquet`` builds a fresh file index
        (a full recursive listing) on every call; read-heavy loops —
        point-gets, select iterations, pending-merge reads — were
        paying that listing each time. The cache key is the interned
        WriterLock's ``data_version``, bumped by every flush/compact
        through ANY same-process World on this path, so writers
        invalidate all readers' caches. This is the engine's analogue
        of the reference's ``hint_is_valid`` negative cache
        (tokio-fs/src/lib.rs:38-73): O(1) re-answers for repeated
        existence/listing questions, with the same staleness contract
        — a DIFFERENT PROCESS writing the path is not seen until this
        process's next version bump (single-writer discipline makes
        that the reader-side trade-off the reference also accepts;
        call ``invalidate_base_cache()`` to force a re-list)."""
        version = self._writer_lock.data_version
        cached = self._base_cache
        if cached is not None and cached[0] == version:
            return cached[1]
        if self.versioned:
            cur = self.current_version()
            df = (
                self._resolve_manifest(self._read_owner(cur)) if cur else None
            )
        else:
            df = self.spark.read.parquet(self.path) if self.exists() else None
        self._base_cache = (version, df)
        return df

    def invalidate_base_cache(self) -> None:
        """Force the next read to re-list the directory (needed only
        when an EXTERNAL process wrote the path)."""
        self._base_cache = None

    # -- snapshot manifests (versioned mode) ----------------------------------

    @property
    def _snapdir(self) -> str:
        return os.path.join(self.path, "_snapshots")

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"_v{v}")

    def current_version(self) -> int:
        """Latest committed snapshot version (0 = nothing committed)."""
        cur = os.path.join(self._snapdir, "current.json")
        if not os.path.exists(cur):
            return 0
        with open(cur) as fh:
            return int(json.load(fh)["current"])

    def snapshot_versions(self) -> list[int]:
        """Every retained committed version, oldest first."""
        if not os.path.isdir(self._snapdir):
            return []
        return sorted(
            int(n[1:-5])
            for n in os.listdir(self._snapdir)
            if n.startswith("v") and n.endswith(".json")
        )

    def _read_owner(self, version: int) -> dict[str, int]:
        """partition-key ("3/7") -> owning data-version map for one
        committed snapshot."""
        p = os.path.join(self._snapdir, f"v{version}.json")
        if not os.path.exists(p):
            raise ValueError(
                f"snapshot v{version} not found (retained: "
                f"{self.snapshot_versions()})"
            )
        with open(p) as fh:
            return {k: int(v) for k, v in json.load(fh)["owner"].items()}

    def _commit_snapshot(self, v: int, owner: dict[str, int]) -> None:
        """Write manifest v, then atomically flip current.json — a
        crash between data write and flip leaves the previous snapshot
        served and the new files orphaned-but-unread (same discipline
        as operators/rollup.py)."""
        from dmds_spark.operators.rollup import _atomic_flip

        # fencing token: abort BEFORE publishing if our lock was broken
        # or lease-reclaimed while the version dir was being written
        # (the data files are orphaned-but-unread, reclaimed by
        # vacuum_snapshots — never served)
        self._writer_lock.verify_token()
        os.makedirs(self._snapdir, exist_ok=True)
        # committed_at: the key snapshot_as_of() resolves timestamps
        # against (Iceberg's snapshot timestamp). Enforced MONOTONE in
        # version order at commit time: a new manifest's committed_at
        # is max(prev + 1us, now), so a cross-writer handoff across
        # hosts with skewed clocks can never publish v+1 "before" v
        # and reorder as-of resolution. Engine metadata only; never
        # part of any query result.
        committed = time.time()
        prev = os.path.join(self._snapdir, f"v{v - 1}.json")
        try:
            with open(prev) as fh:
                prev_at = float(json.load(fh).get("committed_at", 0.0))
            committed = max(committed, prev_at + 1e-6)
        except (OSError, ValueError):
            pass  # first snapshot, or legacy manifest without the field
        _atomic_flip(
            os.path.join(self._snapdir, f"v{v}.json"),
            {"version": v, "owner": owner, "committed_at": committed},
        )
        _atomic_flip(
            os.path.join(self._snapdir, "current.json"), {"current": v}
        )

    def snapshot_as_of(self, ts: float) -> int:
        """Resolve a WALL-CLOCK timestamp (epoch seconds) to the last
        snapshot version committed at or before it — Iceberg's
        AS-OF-TIMESTAMP time travel on the manifest's ``committed_at``
        field. Returns the version number (feed it to
        ``snapshot(version=...)``). Raises if no retained snapshot is
        old enough (vacuumed history, or ts before the first commit);
        manifests written before the field existed (pre-round-13)
        resolve as if committed at epoch 0 — a conservative "always
        old enough" for legacy histories.

        Monotone by construction since round 14: _commit_snapshot
        writes ``committed_at = max(prev + 1us, now)``, so version
        order and committed_at order always agree — a cross-writer
        handoff from a fast-clock host to a slow-clock host cannot
        make a LATER version resolve as older (pinned by the
        skewed-clock test in tests/test_world_snapshots.py). A
        backdated ``ts`` still pins by version when exactness
        matters."""
        if not self.versioned:
            raise ValueError(
                "as-of-timestamp reads need World(versioned=True)"
            )
        best = None
        for v in self.snapshot_versions():
            p = os.path.join(self._snapdir, f"v{v}.json")
            try:
                with open(p) as fh:
                    committed = float(json.load(fh).get("committed_at", 0.0))
            except (OSError, ValueError):
                continue  # torn/unreadable manifest: not resolvable
            if committed <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(
                f"no retained snapshot committed at or before {ts} "
                f"(retained: {self.snapshot_versions()})"
            )
        return best

    def _part_key(self, row) -> str:
        return "/".join(str(int(row[c])) for c in self.partition_cols())

    def _commit_version_write(
        self, out: DataFrame, dirty_keys: set[str] = frozenset()
    ) -> int:
        """Write ``out`` (rows + partition cols) as the next immutable
        version directory, then commit a manifest that carries forward
        every non-dirty partition from the previous snapshot and points
        the written partitions at the new version. O(changed) write
        volume — untouched partitions are never rewritten or copied."""
        cur = self.current_version()
        v = cur + 1
        out.write.partitionBy(*self.partition_cols()).mode(
            "overwrite"
        ).parquet(self._version_dir(v))
        # partition keys from the written directory tree (no Spark job;
        # bounded by the ~4096 physical-partition cap) — also correct
        # when the write is EMPTY (all dirty rows deleted): zero keys,
        # so the dirty partitions simply drop out of the manifest
        written = self._written_partitions(self._version_dir(v))
        owner = {
            k: ov
            for k, ov in (self._read_owner(cur) if cur else {}).items()
            if k not in dirty_keys
        }
        owner.update({k: v for k in written})
        self._commit_snapshot(v, owner)
        return v

    def _written_partitions(self, vdir: str) -> list[str]:
        """Partition keys ("3/7") present in a just-written version
        directory, from the c0=../c1=.. layout (local FS, like the
        manifests)."""
        ndims = self.spec.ndims
        keys = []
        for root, _dirs, files in os.walk(vdir):
            if not any(f.endswith(".parquet") for f in files):
                continue
            rel = os.path.relpath(root, vdir)
            parts = [
                seg.split("=", 1)[1]
                for seg in rel.split(os.sep)
                if "=" in seg
            ]
            if len(parts) == ndims:
                keys.append("/".join(str(int(p)) for p in parts))
        return keys

    def vacuum_snapshots(self, retain_last: int = 1) -> int:
        """Drop manifests older than the newest ``retain_last`` and
        delete every version directory no retained manifest references.
        Returns directories deleted. Readers pinned to a vacuumed
        snapshot fail loudly on their next manifest resolve."""
        import shutil

        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        cur = self.current_version()
        # anchor retention on the COMMITTED pointer, never the manifest
        # listing: a crash between the v{N}.json write and the
        # current.json flip leaves an ORPHAN manifest > cur which was
        # never served — treating it as the newest snapshot would
        # vacuum away the manifest current.json points to and brick the
        # world. Orphans are dropped here too (their data dirs were
        # never read).
        vs = [v for v in self.snapshot_versions() if v <= cur]
        orphans = [v for v in self.snapshot_versions() if v > cur]
        keep, drop = vs[-retain_last:], vs[:-retain_last]
        referenced = set()
        for v in keep:
            referenced.update(self._read_owner(v).values())
        for v in drop + orphans:
            os.remove(os.path.join(self._snapdir, f"v{v}.json"))
        deleted = 0
        for v in drop + orphans:
            if v not in referenced and os.path.isdir(self._version_dir(v)):
                shutil.rmtree(self._version_dir(v))
                deleted += 1
        return deleted

    def _resolve_manifest(self, owner: dict[str, int]) -> DataFrame | None:
        """Manifest -> DataFrame: for each data version owning live
        partitions, ONE scan of its ``_v{K}`` directory filtered (on
        the partition-directory columns, so pruning happens at file
        listing) to the partitions it still owns; union across
        versions. The filter is an isin over at most ~4096 keys (the
        physical-partition bound ``_default_factors`` enforces)."""
        if not owner:
            return None
        by_ver: dict[int, list[str]] = {}
        for key, ver in owner.items():
            by_ver.setdefault(ver, []).append(key)
        pcols = self.partition_cols()
        tag = F.concat_ws("/", *[F.col(c).cast("string") for c in pcols])
        out = None
        for ver in sorted(by_ver):
            part = self.spark.read.parquet(self._version_dir(ver)).filter(
                tag.isin(by_ver[ver])
            )
            out = part if out is None else out.unionByName(part)
        return out

    # -- write path (reference: src/world.rs:553-584) -------------------------

    def set_pending_limit(self, limit: int | None) -> None:
        """Cap the pending op log (reference ``set_chunks_limit``,
        src/world.rs:295-299): when the number of buffered ops reaches
        the limit, the next write triggers an automatic flush — the
        honest Spark analogue of the reference's buffer-pool eviction
        (there is no partial eviction here because the op log is a
        logical diff, not a page cache)."""
        if limit is not None and limit < 1:
            raise ValueError("pending_limit must be >= 1 or None")
        self._pending_limit = limit

    def _append_op(self, kind: str, df: DataFrame) -> None:
        with self._lock:
            # check-and-acquire under the shared path mutex: two
            # threads racing the FIRST mutating op on one World must
            # not both refcount into the writer token (that left
            # refs=2 with one release at close(), orphaning the lock
            # file for the process lifetime). One ref per World; O(1)
            # after the first op.
            if not self._writer_ref:
                self._writer_lock.acquire()  # WorldLockedError if
                self._writer_ref = True      # another process writes
            self._seq += 1
            self._ops.append((self._seq, kind, df))
            over = (
                self._pending_limit is not None
                and len(self._ops) >= self._pending_limit
            )
        if over:
            self.flush()

    def _cast_dims(self, df: DataFrame) -> DataFrame:
        """Normalize dim columns to their declared Spark types (long,
        or DECIMAL(20,0) for u64 dims) so every pending op carries one
        schema regardless of how the caller built the batch (inferred
        longs, wider decimals, Arrow ints)."""
        return df.select(
            *[
                F.col(c).cast(self.spec.dims[self._dim_index[c]].spark_type).alias(c)
                if c in self._dim_index
                else F.col(c)
                for c in df.columns
            ]
        )

    def upsert(self, df: DataFrame) -> None:
        """Batch upsert keyed on dim 0 (reference ``World::insert``,
        src/world.rs:553-567: replace-by-id). Later batches win over
        earlier ones; within a batch, ids must be unique."""
        self._validate_dims(df)
        df = self._cast_dims(df)
        if self.validate == "eager":
            self._check_domain(df)
        self._append_op("upsert", df)

    def insert_rows(self, rows: Iterable[dict]) -> None:
        """Convenience: upsert a small batch of row dicts (tests, REPL).
        Ints destined for u64 dim columns are converted to Decimal
        before schema inference (a Python int past 2^63 won't fit the
        inferred LongType)."""
        rows = list(rows)
        u64_dims = {d.name for d in self.spec.dims if d.u64}
        if u64_dims:
            from decimal import Decimal

            rows = [
                {
                    k: Decimal(v) if k in u64_dims and isinstance(v, int) else v
                    for k, v in r.items()
                }
                for r in rows
            ]
        df = self.spark.createDataFrame(rows)
        self.upsert(df)

    def try_insert(self, df: DataFrame) -> None:
        """Insert-if-absent (reference ``World::try_insert``,
        src/world.rs:569-584): rows whose id already exists — on disk or
        pending — are dropped, not replaced."""
        self._validate_dims(df)
        df = self._cast_dims(df)
        if self.validate == "eager":
            self._check_domain(df)
        id_col = self.spec.id_dim.name
        existing = self.snapshot().select(id_col)
        new_rows = df.join(existing, on=id_col, how="left_anti")
        self._append_op("upsert", new_rows)

    def delete_ids(self, ids: Iterable[int]) -> None:
        """Delete by id (reference ``Chunk::remove`` / ``Lazy::destroy``,
        src/world.rs:77-87, src/world/iter.rs:254-265)."""
        id_dim = self.spec.id_dim
        if id_dim.u64:
            from decimal import Decimal

            field = T.StructField(id_dim.name, T.DecimalType(20, 0))
            rows = [(Decimal(int(i)),) for i in ids]
        else:
            field = T.StructField(id_dim.name, T.LongType())
            rows = [(int(i),) for i in ids]
        df = self.spark.createDataFrame(rows, T.StructType([field]))
        self._append_op("delete", df)

    def delete_where(self, sel: Select) -> None:
        """Predicate delete: everything the selection matches."""
        ids = self.read(sel).select(self.spec.id_dim.name)
        self._append_op("delete", ids)

    # -- pending-buffer resolution --------------------------------------------

    def _resolved_pending(self) -> tuple[DataFrame | None, DataFrame | None]:
        """Collapse the op log to (latest upsert rows, all touched ids).
        Latest op per id wins — a window over __seq, the deterministic
        replacement for the reference's chunk/item write locks."""
        if not self._ops:
            return None, None
        from pyspark.sql import Window as W

        id_col = self.spec.id_dim.name
        parts = []
        for seq, kind, df in self._ops:
            if kind == "upsert":
                parts.append(
                    df.withColumn("__seq", F.lit(seq)).withColumn("__del", F.lit(False))
                )
            else:
                parts.append(
                    df.select(id_col)
                    .withColumn("__seq", F.lit(seq))
                    .withColumn("__del", F.lit(True))
                )
        # align schemas: deletes carry only the id column
        all_cols = []
        for p in parts:
            for c in p.columns:
                if c not in all_cols:
                    all_cols.append(c)
        aligned = []
        for p in parts:
            for c in all_cols:
                if c not in p.columns:
                    p = p.withColumn(c, F.lit(None))
            aligned.append(p.select(all_cols))
        log = aligned[0]
        for p in aligned[1:]:
            log = log.unionByName(p)
        w = W.partitionBy(id_col).orderBy(F.col("__seq").desc())
        # materialize the collapsed log ONCE: its consumers (live for
        # the merge/new-partition sides, touched for the dirty/anti
        # joins) would otherwise each re-run every pending op's source
        # plan — a CDC merge buffers the whole net-changes pipeline
        # here, and flush consumed it four times (guide §2.4). The
        # barrier is micro-batch-sized (the pending buffer), never
        # table-sized.
        latest = (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        ).transform(materialize)
        # every touched id has exactly one rn=1 row, so the touched set
        # reads off the collapsed log — no second pass over the raw ops
        touched = latest.select(id_col)
        live = latest.filter(~F.col("__del")).drop("__seq", "__del")
        # delete-only op logs leave live empty AND missing dim columns —
        # give it the full dim schema so downstream plans resolve
        for d in self.spec.dims:
            if d.name not in live.columns:
                live = live.withColumn(d.name, F.lit(None).cast(d.spark_type))
        return live, touched

    @staticmethod
    def _align_to(df: DataFrame, ref: DataFrame) -> DataFrame:
        """Project ``df`` to ``ref``'s columns/types for a union:
        shared columns cast to ref's type, ref-only columns become
        typed nulls, df-only columns (payload schema evolution — a
        later batch introduced a new column) ride along at the end."""
        rtypes = dict(ref.dtypes)
        return df.select(
            *[
                (
                    F.col(c).cast(rtypes[c])
                    if c in df.columns
                    else F.lit(None).cast(rtypes[c])
                ).alias(c)
                for c in ref.columns
            ],
            *[F.col(c) for c in df.columns if c not in rtypes],
        )

    # -- read path (reference: §3A) -------------------------------------------

    def select(self, dim: int, bounds) -> Select:
        """Seed a selection (reference ``World::select``,
        src/world.rs:302-329)."""
        return Select.dim(self.spec, dim, bounds)

    def select_all(self) -> Select:
        """Full-scan seed (reference src/world.rs:332-335)."""
        return Select.all(self.spec)

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Current logical state: on-disk chunks merged with the pending
        buffer (the reference's iterator merges buffered chunks with IO
        chunks, src/world/iter.rs:726-750).

        ``version=N`` (versioned worlds only) pins the read to committed
        snapshot N — exactly the rows that flush served, EXCLUDING any
        pending buffer: the manifest is immutable, so the same version
        hashes identically forever however much the world advances
        (corpus-release reproducibility at 100 TB)."""
        if version is not None:
            if not self.versioned:
                raise ValueError(
                    "version-pinned reads need World(versioned=True)"
                )
            pinned = self._resolve_manifest(self._read_owner(version))
            if pinned is None:
                # committed-but-empty snapshot: take the schema from any
                # retained version's files so payload columns survive
                # (a dims-only fabrication would break unionByName with
                # non-empty versions); dims-only only when NO version
                # dir exists at all
                for v in reversed(self.snapshot_versions()):
                    # a dir is only readable if it holds actual parquet
                    # (an all-deleted commit leaves _SUCCESS alone)
                    if self._written_partitions(self._version_dir(v)):
                        return (
                            self.spark.read.parquet(self._version_dir(v))
                            .drop(*self.partition_cols())
                            .limit(0)
                        )
                schema = T.StructType(
                    [T.StructField(d.name, T.LongType()) for d in self.spec.dims]
                )
                return self.spark.createDataFrame([], schema)
            return pinned.drop(*self.partition_cols())
        base = self._base()
        live, touched = self._resolved_pending()
        id_col = self.spec.id_dim.name
        if base is not None:
            base = base.drop(*self.partition_cols())
        if base is None and live is None:
            # empty world with just the dim columns
            schema = T.StructType(
                [T.StructField(d.name, T.LongType()) for d in self.spec.dims]
            )
            return self.spark.createDataFrame([], schema)
        if live is None:
            return base
        if base is None:
            return live
        base_kept = base.join(touched, on=id_col, how="left_anti")
        live = self._align_to(live, base)
        return base_kept.unionByName(live, allowMissingColumns=True)

    def read(self, sel: Select) -> DataFrame:
        """Execute a selection: partition pruning on the on-disk side
        (physical chunk predicate) + exact value predicate everywhere +
        pending-buffer merge. This is the reference's
        ``Select::iter`` (src/world.rs:638-643) as one DataFrame."""
        value_pred = sel.to_predicate()
        base = self._base()
        live, touched = self._resolved_pending()
        id_col = self.spec.id_dim.name
        out = None
        if base is not None:
            pruned = base.filter(self._physical_partition_predicate(sel.shape()))
            pruned = pruned.filter(value_pred).drop(*self.partition_cols())
            if touched is not None:
                pruned = pruned.join(touched, on=id_col, how="left_anti")
            out = pruned
        if live is not None:
            live_sel = live.filter(value_pred)
            if out is None:
                out = live_sel
            else:
                live_sel = self._align_to(live_sel, out)
                out = out.unionByName(live_sel, allowMissingColumns=True)
        if out is None:
            return self.snapshot().filter(value_pred)
        return out

    def get(self, id_value: int) -> DataFrame:
        """Point lookup by id — one pruned chunk on the IO side
        (reference ``chunk_pos_of_data`` routing, src/world.rs:544-551)."""
        return self.read(self.select(0, int(id_value)))

    # -- zone maps: data skipping on non-dimension columns --------------------

    def zonemap_refresh(self, cols: list[str]) -> dict:
        """Recompute per-partition min/max zones for ``cols``,
        dirty-only (unchanged partitions keep their stored zones). See
        core/zonemap.py for the safety model — refresh is a performance
        maintenance call, never a correctness dependency."""
        from dmds_spark.core.zonemap import refresh

        return refresh(self, cols)

    def zonemap_prune_report(self, bounds: dict[str, tuple]) -> dict:
        """How many partitions a ``read_where(bounds)`` would skip."""
        from dmds_spark.core.zonemap import prune_report

        return prune_report(self, bounds)

    def read_where(self, bounds: dict[str, tuple], sel=None) -> DataFrame:
        """Range read with zone-map skipping on non-dimension columns
        (the reference's hint negative-cache generalized to value
        bounds). Bounds are inclusive, in canonical space (unix micros
        for timestamps); stale/unmapped partitions are conservatively
        scanned."""
        from dmds_spark.core.zonemap import read_where

        return read_where(self, bounds, sel)

    # -- interop with the reference's on-disk format ---------------------------

    def import_chunk_tree(self, root: str, decoder=None, payload_schema=None) -> int:
        """Bulk-load a chunk tree written by the reference engine (or by
        ``export_chunk_tree``) into this world: binaryFile scan ->
        distributed frame decode (sources/codec.py, byte-compatible with
        src/world.rs:33-47) -> one upsert batch. Returns rows loaded."""
        from dmds_spark.sources.codec import raw_payload_decoder, read_chunk_tree

        df = read_chunk_tree(
            self.spark, root, self.spec,
            decoder or raw_payload_decoder, payload_schema,
        )
        self.upsert(df)
        return df.count()

    def export_chunk_tree(self, root: str, version: int = 0,
                          payload_col: str | None = None, nested: bool = True,
                          snapshot_version: int | None = None) -> int:
        """Write the world's current snapshot as a reference-compatible
        chunk tree (one file per chunk, items sorted by id — the
        BTreeMap order, src/world.rs:25). Returns chunk files written.

        ``snapshot_version`` (versioned worlds) exports a PINNED
        committed snapshot instead of the live state — publishing
        release v{K} in the reference engine's own on-disk format,
        reproducibly, however far the world has advanced since."""
        from dmds_spark.sources.codec import write_chunk_tree

        src = (
            self.snapshot(version=snapshot_version)
            if snapshot_version is not None
            else self.snapshot()
        )
        return write_chunk_tree(
            src, root, self.spec, version,
            payload_col=payload_col, nested=nested,
        )

    # -- flush (reference: §3B) ------------------------------------------------

    @property
    def writes(self) -> int:
        """Pending op count — flush eligibility, mirroring the chunk
        ``writes`` counter (src/world.rs:52-54)."""
        return len(self._ops)

    def chunk_states(self) -> DataFrame:
        """Per-chunk dirty view for daemons (reference ``World::chunks``
        iterator, src/world.rs: the maintenance loop inspects each
        buffered chunk's write count): one row per physical partition
        the pending buffer would touch, with pending upsert/delete row
        counts. Distributed — partition keys only ever reach the
        caller, never rows."""
        live, touched = self._resolved_pending()
        pcols = self.partition_cols()
        if live is None:
            schema = T.StructType(
                [T.StructField(c, T.LongType()) for c in pcols]
                + [T.StructField("pending_upserts", T.LongType()),
                   T.StructField("pending_deletes", T.LongType())]
            )
            return self.spark.createDataFrame([], schema)
        id_col = self.spec.id_dim.name
        up = (
            self._with_partition_cols(live)
            .groupBy(*pcols)
            .agg(F.count(F.lit(1)).alias("pending_upserts"))
        )
        base = self._base()
        if base is not None and touched is not None:
            # deletes/relocations dirty the partition currently holding
            # the touched id on disk
            dels = (
                base.join(touched, on=id_col, how="left_semi")
                .groupBy(*pcols)
                .agg(F.count(F.lit(1)).alias("pending_deletes"))
            )
            out = up.join(dels, on=pcols, how="full_outer")
        else:
            out = up.withColumn("pending_deletes", F.lit(None).cast("long"))
        return out.select(
            *[F.col(c).cast("long").alias(c) for c in pcols],
            F.coalesce("pending_upserts", F.lit(0)).alias("pending_upserts"),
            F.coalesce("pending_deletes", F.lit(0)).alias("pending_deletes"),
        )

    def flush(self) -> int:
        """Persist the pending buffer: rewrite exactly the dirty chunks
        via dynamic partition overwrite (the reference's whole-chunk
        rewrite, src/world.rs:96-122 + tokio-fs/src/lib.rs:85-107).
        With ``validate="flush"`` the domain check rides along as
        raise_error guards in the same pass. Returns ops flushed."""
        with self._lock:
            if not self._ops:
                return 0
            try:
                n = self._flush_locked()
            except ValueOutOfRangeError:
                raise
            except Exception as e:  # noqa: BLE001 — guard translation
                self._reraise_domain(e)
            # new on-disk state: invalidate every same-process World's
            # cached base relation (the interned version is the key)
            self._writer_lock.data_version += 1
            return n

    def _flush_locked(self) -> int:
        n_ops = len(self._ops)
        live, touched = self._resolved_pending()
        if self.validate == "flush" and live is not None:
            live = self._domain_guard(live)
        id_col = self.spec.id_dim.name
        base = self._base()

        if base is None:
            out = self._with_partition_cols(live)
            if self.versioned:
                self._commit_version_write(out)
            else:
                self._writer_lock.verify_token()  # fence the overwrite
                # per-write dynamic mode, like the dirty-partition path
                # below and compact(): a session left at Spark's STATIC
                # default would otherwise delete-and-recreate the whole
                # directory (correctness must not depend on session
                # conf — the round-14 driver session proved it doesn't
                # set this)
                (
                    out.write.partitionBy(*self.partition_cols())
                    .mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(self.path)
                )
            self._ops = []
            return n_ops

        # dirty physical partitions = those holding any touched id
        # (old location: deletes/relocations) or any new row (new
        # location) — both sides, so a relocated row vanishes from
        # its old chunk and appears in the new one atomically.
        # Materialized once (it is small: partition keys only) and used
        # BOTH as the semi-join filter — never a driver-built OR chain,
        # which blows up planning past a few thousand dirty partitions —
        # and as the driver-side list for empty-directory cleanup.
        base_touched = base.join(touched, on=id_col, how="left_semi")
        old_parts = base_touched.select(*self.partition_cols()).distinct()
        new_parts = (
            self._with_partition_cols(live)
            .select(*self.partition_cols())
            .distinct()
        )
        # ONE action: collect the dirty set and rebuild the filter
        # relation locally — the former materialize-then-collect pair
        # paid a checkpoint job just to read back rows the driver needs
        # anyway (the set is partition keys only, bounded by chunk
        # count, and both consumers see the identical collected rows)
        dirty_rows = old_parts.unionByName(new_parts).distinct().collect()
        dirty = [tuple(r) for r in dirty_rows]
        if not dirty:
            self._ops = []
            return n_ops
        dirty_df = self.spark.createDataFrame(dirty_rows, old_parts.schema)

        base_part = base.join(
            F.broadcast(dirty_df), on=self.partition_cols(), how="left_semi"
        ).drop(*self.partition_cols())
        kept = base_part.join(touched, on=id_col, how="left_anti")
        live_cast = self._align_to(live, base_part)
        merged = kept.unionByName(live_cast, allowMissingColumns=True)
        out = self._with_partition_cols(merged)
        if self.versioned:
            # fresh immutable version dir: no self-overwrite, so no
            # materialization barrier; vanished partitions drop out of
            # the manifest instead of needing directory cleanup
            self._commit_version_write(
                out, {"/".join(str(int(x)) for x in pos) for pos in dirty}
            )
            self._ops = []
            return n_ops
        # STAGE-AND-SWAP instead of materialize-then-self-overwrite:
        # ``out`` reads the very files a dynamic overwrite of
        # ``self.path`` would delete, which forced an eager
        # materialization barrier (a full extra pass over the flushed
        # rows) before every non-versioned flush. Writing to a sibling
        # staging directory needs no barrier — the ONE write job both
        # computes and commits the merged dirty partitions — and
        # publish is a per-partition directory swap (local-FS renames,
        # bounded by the dirty-partition count, the same move-based
        # commit Spark's own dynamic overwrite performs internally).
        # ``out`` contains ONLY dirty-partition rows by construction
        # (base_part is semi-join-filtered to the dirty set, and every
        # live row's partition is dirty), so: a staged dir exists ->
        # the partition's new contents; no staged dir -> every row the
        # dirty partition held relocated away, clear it (the reference
        # rewrites every dirty chunk, even to empty:
        # src/world.rs:96-122 skips moved items but still writes).
        staging = f"{self.path}.staging-{uuid.uuid4().hex[:12]}"
        try:
            (
                out.write.partitionBy(*self.partition_cols())
                .mode("overwrite")
                .parquet(staging)
            )
            self._writer_lock.verify_token()  # fence the swap
            for pos in dirty:
                dst = self._part_dir(pos)
                src = "/".join(
                    [staging]
                    + [
                        f"{c}={int(v)}"
                        for c, v in zip(self.partition_cols(), pos)
                    ]
                )
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.isdir(src):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(src, dst)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        self._ops = []
        return n_ops

    def _part_dir(self, pos) -> str:
        return "/".join(
            [self.path]
            + [f"{c}={int(v)}" for c, v in zip(self.partition_cols(), pos)]
        )

    def zvalue(self) -> F.Column:
        """Morton (Z-order) key over the world's dims: bit-interleave
        the dim offsets so rows close in EVERY dimension are close in
        the sort order. Sorting files by this key gives parquet
        row-group min/max stats pruning power on all dims at once —
        an id-only sort (the BTreeMap order) prunes id point-gets but
        leaves secondary-dim range scans reading every row group.
        Pure integer expression (shifts/ors), codegen-friendly."""
        ndims = self.spec.ndims
        bits = 63 // ndims
        z = F.lit(0).cast("long")
        for i, d in enumerate(self.spec.dims):
            # only the low ``bits`` bits of each offset feed the key:
            # reduce mod 2^bits in the column's exact domain first (a
            # u64 offset doesn't fit a long; the reduction is exact in
            # decimal and changes nothing for long dims). At ndims=1
            # the modulus 2^63 is itself past the long-literal domain:
            # a long offset is already < 2^63 (no reduction needed),
            # a u64 offset reduces against a decimal literal.
            delta = F.col(d.name) - self._dim_lit(d, d.start)
            if d.u64:
                off = F.pmod(
                    delta, F.expr(f"CAST('{2**bits}' AS DECIMAL(20,0))")
                ).cast("long")
            elif bits >= 63:
                off = delta.cast("long")
            else:
                off = F.pmod(delta, F.lit(2**bits)).cast("long")
            for b in range(bits):
                bit = F.shiftright(off, b).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, b * ndims + i))
        return z

    def compact(self, max_files_per_partition: int = 1,
                order: str = "id") -> int:
        """Rewrite fragmented physical partitions down to one file each,
        rows sorted by id within the file.

        Every flush appends-by-overwrite at whole-partition granularity,
        but a long upsert history still fragments partitions written by
        different Spark jobs (and at 100 TB the small-file problem is
        the #1 scan-throughput killer: each file costs a task + a
        footer read). Compaction = the reference's whole-chunk rewrite
        (src/world.rs:96-122) applied for layout instead of
        durability; sorting by id restores the BTreeMap order
        (src/world.rs:25) so parquet row-group min/max stats prune id
        point-gets again.

        ``order`` picks the within-file sort: ``"id"`` restores the
        BTreeMap id order (best for point-gets), ``"zorder"`` sorts by
        the Morton key (``zvalue``) so row-group stats prune range
        scans on EVERY dim — the right choice when the workload filters
        on secondary dims as often as on id.

        Only partitions holding more than ``max_files_per_partition``
        files are rewritten. Requires a clean buffer (flush first) so
        the rewrite cannot race pending ops. Returns the number of
        partitions compacted."""
        if order not in ("id", "zorder"):
            raise ValueError("order must be 'id' or 'zorder'")
        with self._lock:
            if self._ops:
                raise RuntimeError("flush pending ops before compact()")
            # compact REWRITES data files: it needs the cross-process
            # writer token exactly like an upsert (same check-and-
            # acquire as _append_op; held until close())
            if not self._writer_ref:
                self._writer_lock.acquire()
                self._writer_ref = True
            base = self._base()
            if base is None:
                return 0
            pcols = self.partition_cols()
            # small (partition keys only): materialize once, use as a
            # broadcast semi-join filter — thousands of fragmented
            # partitions are the NORMAL state at scale, and a
            # driver-built OR chain over them blows up planning
            frag_df = (
                base.select(*pcols, F.input_file_name().alias("__f"))
                .groupBy(*pcols)
                .agg(F.count_distinct("__f").alias("__nf"))
                .filter(F.col("__nf") > max_files_per_partition)
                .select(*pcols)
                .transform(materialize)
            )
            n_frag = frag_df.count()
            if not n_frag:
                return 0
            id_col = self.spec.id_dim.name
            sort_key = self.zvalue() if order == "zorder" else F.col(id_col)
            out = (
                base.join(F.broadcast(frag_df), on=pcols, how="left_semi")
                # one task (=> one file) per physical partition, rows
                # sorted within it for row-group stats pruning
                .repartition(*[F.col(c) for c in pcols])
                .sortWithinPartitions(*pcols, sort_key)
            )
            if self.versioned:
                keys = {self._part_key(r) for r in frag_df.collect()}
                self._commit_version_write(out, keys)
            else:
                # materialize before self-overwrite (fresh version dirs
                # don't need the barrier)
                out = out.transform(materialize)
                self._writer_lock.verify_token()  # fence the overwrite
                (
                    out.write.partitionBy(*pcols)
                    .mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(self.path)
                )
            self._writer_lock.data_version += 1  # invalidate base caches
            return n_frag

    def stats(self) -> DataFrame:
        """ANALYZE-style storage profile: one row per physical
        partition with row count, file count, approximate bytes, and
        the id min/max — the report behind ``compact()``/zorder
        decisions (which partitions are fragmented, how skewed chunk
        sizes are) and the parity for the reference's maintenance
        loop inspecting its chunk map (src/world.rs ``chunks``).

        Fully distributed: file identity and block lengths come from
        the scan itself (``input_file_name`` /
        ``input_file_block_*``), never a driver-side directory walk,
        and only O(partitions) rows ever reach the caller. Bytes are
        the sum of distinct block lengths actually carrying rows —
        exact for row-bearing blocks, which is what scan cost tracks.
        Reports the ON-DISK state only; pending buffered ops are
        ``chunk_states()``'s job."""
        pcols = self.partition_cols()
        id_col = self.spec.id_dim.name
        id_type = (
            T.DecimalType(20, 0) if self.spec.id_dim.u64 else T.LongType()
        )
        base = self._base()
        if base is None:
            schema = T.StructType(
                [T.StructField(c, T.LongType()) for c in pcols]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("n_files", T.LongType()),
                    T.StructField("approx_bytes", T.LongType()),
                    T.StructField("min_id", id_type),
                    T.StructField("max_id", id_type),
                ]
            )
            return self.spark.createDataFrame([], schema)
        blk = base.select(
            *pcols,
            F.col(id_col),
            F.input_file_name().alias("__f"),
            F.input_file_block_start().alias("__bs"),
            F.input_file_block_length().alias("__bl"),
        )
        per_block = blk.groupBy(*pcols, "__f", "__bs").agg(
            F.first("__bl").alias("__bl"),
            F.count(F.lit(1)).alias("__rows"),
            F.min(id_col).alias("__min_id"),
            F.max(id_col).alias("__max_id"),
        )
        return per_block.groupBy(*pcols).agg(
            F.sum("__rows").cast("long").alias("n_rows"),
            F.countDistinct("__f").cast("long").alias("n_files"),
            F.sum("__bl").cast("long").alias("approx_bytes"),
            F.min("__min_id").cast(self.spec.id_dim.spark_type).alias("min_id"),
            F.max("__max_id").cast(self.spec.id_dim.spark_type).alias("max_id"),
        )


    # -- writer-session lifecycle -------------------------------------------

    def heartbeat(self, lease_sec: float) -> bool:
        """Refresh this writer's cross-host lease (see
        ``WriterLock.heartbeat``). No-op (False) for a World that holds
        no writer token — read-only Worlds never lease. ``FlushDaemon``
        calls this every interval; calling it from ad-hoc code without
        a live loop behind it invites lease reclaim of a live writer."""
        if not self._writer_ref:
            return False
        return self._writer_lock.heartbeat(lease_sec)

    def close(self) -> None:
        """Flush anything pending and release the cross-process writer
        lock — the reference's flush-on-drop (ShutdownHandle,
        tokio-fs/src/lib.rs:158-200) plus lock release. Idempotent; a
        World used only for reads never took the lock and this is a
        pure no-op."""
        try:
            if self._ops:
                self.flush()
        finally:
            # release even when the final flush raises — a failed
            # flush must not leak the cross-process lock until a
            # dead-pid break (the ops stay buffered; a caller that
            # catches and retries re-acquires on the next write)
            with self._lock:
                # mirror of the _append_op acquire: ref handoff under
                # the same mutex so a close racing a first write cannot
                # drop a ref the writer thread is still establishing
                if self._writer_ref:
                    self._writer_ref = False
                    self._writer_lock.release()

    def __enter__(self) -> "World":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    @staticmethod
    def break_lock(path: str) -> bool:
        """Forcibly remove a world's writer lock file. ONLY for locks
        whose holder is confirmed dead on a host we cannot probe from
        here (same-host dead holders are broken automatically on the
        next acquire) — breaking a live writer's lock forfeits the
        single-writer guarantee for its in-flight flush (see
        WriterLock failure modes). Returns True if a lock was
        removed."""
        p = WriterLock.lock_path(path)
        try:
            with open(p) as fh:
                holder = json.load(fh)
        except FileNotFoundError:
            return False
        except (OSError, ValueError):
            holder = None  # torn content: still breakable
        moved = f"{p}.broken.{uuid.uuid4().hex}"
        try:
            os.rename(p, moved)
        except FileNotFoundError:
            return False
        # re-verify the renamed content is the lock we read — a lock
        # re-taken between read and rename is restored, not discarded
        try:
            with open(moved) as fh:
                content = json.load(fh)
        except (OSError, ValueError):
            content = None
        if (
            holder is not None
            and content is not None
            and content.get("token") != holder.get("token")
        ):
            os.rename(moved, p)
            return False
        os.unlink(moved)
        return True


class FlushDaemon:
    """Periodic flush loop (reference ``daemon`` + ``ShutdownHandle``,
    tokio-fs/src/lib.rs:207-235,158-200): every ``interval`` seconds,
    flush each world with ``writes >= 1``; ``close()`` flushes a final
    time (the reference's flush-on-drop).

    A SEPARATE heartbeat thread renews each world's writer lease
    (``lease_sec`` defaults to 10 flush intervals, floor 60 s; the
    heartbeat cadence is lease_sec/4) — which is the cross-host
    crash-recovery story: a remote writer that dies with the daemon
    running stops heartbeating, its lease lapses, and the next waiter
    reclaims the lock automatically instead of wedging until a human
    calls ``World.break_lock``. Heartbeats deliberately do NOT share
    the flush loop's thread: a single long flush would otherwise
    starve every world's lease and let waiters reclaim locks from
    live, healthy writers mid-flush. Leases can still lapse if a
    flush outlasts the whole lease while the GIL-holding JVM call
    starves the heartbeat thread — size lease_sec at or above your
    worst-case flush wall time. Pass ``lease_sec=None`` to opt out
    (locks then never expire cross-host)."""

    LEAST_WRITES = 1  # tokio-fs/src/lib.rs:213

    def __init__(
        self,
        worlds: Sequence[World],
        interval: float,
        lease_sec: float | None = -1.0,
    ):
        self.worlds = list(worlds)
        self.interval = interval
        if lease_sec is not None and lease_sec < 0:
            lease_sec = max(60.0, 10.0 * interval)
        self.lease_sec = lease_sec
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._hb_thread = None
        if lease_sec is not None:
            self._hb_thread = threading.Thread(
                target=self._hb_loop, daemon=True
            )
            self._hb_thread.start()

    def _loop(self):
        while not self._stop.wait(self.interval):
            for w in self.worlds:
                if w.writes >= self.LEAST_WRITES:
                    w.flush()

    def _hb_loop(self):
        # renew well inside the lease (4 beats per lease window) and
        # never slower than the flush interval
        beat = min(self.lease_sec / 4.0, self.interval)
        while not self._stop.wait(beat):
            for w in self.worlds:
                w.heartbeat(self.lease_sec)

    def close(self):
        """Stop the loop and flush everything dirty — the reference's
        ShutdownHandle::drop (tokio-fs/src/lib.rs:174-200)."""
        self._stop.set()
        self._thread.join(timeout=30)
        if self._hb_thread is not None:
            self._hb_thread.join(timeout=30)
        for w in self.worlds:
            if w.writes >= 1:
                w.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
