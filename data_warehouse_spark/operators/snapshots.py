"""Snapshot-versioned tables: multi-version writes + time-travel reads
(U9 [cap]) without any external table format.

The reference's warehouse overwrites in place (ON CONFLICT DO UPDATE,
trips_lambda.py:180-206) — yesterday's state is gone after tonight's
load. Production warehouses keep it: auditing a report means re-reading
the table AS OF the version the report saw. Table formats (Delta,
Iceberg) provide this via manifest files over immutable data; this
module implements the same core mechanic with plain parquet + JSON
manifests, no dependencies:

  table_dir/
    data/v000001/...parquet     immutable per-version data
    _versions/v000001.json      manifest, written AFTER the data commit

Write protocol: data files land first; the manifest is then staged and
os.rename()d into place — atomic on POSIX — so a reader either sees a
complete version or not at all, and a crashed writer leaves no visible
half-version (just an orphaned data dir the next write ignores).
Readers list _versions/ and open the requested manifest's data path;
"latest" is the max version present. Old versions are immutable by
construction — a later write never touches an earlier data dir — which
is what makes time travel a metadata operation at any table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_versions")


def versions(table_dir: str) -> list[int]:
    """Committed version numbers, ascending (empty for a fresh dir)."""
    vdir = _versions_dir(table_dir)
    if not os.path.isdir(vdir):
        return []
    out = []
    for f in os.listdir(vdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


# A crashed writer's per-version lock older than this is presumed dead
# and its version number is reclaimed; a YOUNGER lock means a live
# concurrent writer and the commit fails loudly instead of destroying
# its in-progress data dir.
LOCK_GRACE_S = 900

# Ultimate fallback against pid reuse: a lock whose recorded pid LOOKS
# alive (os.kill-0 succeeds) but whose mtime is older than this is
# treated as a recycled pid (reboot / pid-space wrap) and reclaimed —
# otherwise one crashed writer whose pid an unrelated daemon inherited
# would wedge the table forever. Single snapshot commits longer than a
# day are out of contract (documented here).
LOCK_HARD_GRACE_S = 86_400


def _lock_holder_alive(lock: str) -> bool | None:
    """Liveness of the pid recorded in a lock file: True/False when it
    can be determined (same host — the plain-filesystem snapshot store
    is single-host by construction), None when the file is unreadable
    or carries no pid. The body is a plain ``pid`` (kept so across the
    round-10 token change for mixed-version readers); a ``pid:...``
    prefix would still parse."""
    try:
        with open(lock) as fh:
            pid = int(fh.read().strip().split(":", 1)[0] or "0")
    except (OSError, ValueError):
        return None
    if pid <= 0:
        return None
    from data_warehouse_spark.scratch import _pid_alive
    return _pid_alive(pid)


def _release_version_lock(lock: str, token: str | None = None) -> None:
    """Release ONLY if the lock at the path is still ours. A stale-lock
    stealer may have renamed our lock away (pid-recycle adjudication)
    and a third writer's fresh lock may now sit at the path — a blind
    unlink would remove that LIVE lock and hand two writers the same
    version. Identity is per-ACQUISITION (round-10 advice fix): the
    token carries (pid, inode, mtime_ns) captured at lock creation, so
    even two writer THREADS in the same process are distinct — a
    pid-only compare would let same-pid siblings unlink each other's
    live lock. The lock BODY stays a plain pid on purpose: a
    pre-round-10 reader's ``int(body)`` must keep parsing it, or its
    liveness check silently degrades to the 900 s mtime grace during a
    mixed-version window and a live long-committing writer gets stolen
    (the second r10 review pass). ``token=None`` (legacy callers/
    tests) falls back to the pid compare. An unreadable/absent/foreign
    lock is left alone. Identity and body come from ONE file handle
    (fstat on the open fd, r11 advice fix): a separate stat-then-open
    pair could mix a PREVIOUS lock's inode/mtime with a same-pid
    sibling's fresh body if the lock is stolen and re-acquired between
    the two syscalls, and the mixed comparison would falsely match."""
    try:
        with open(lock) as fh:
            st = os.fstat(fh.fileno())
            body = fh.read().strip()
    except OSError:
        return  # gone (stolen) or unreadable: not provably ours
    if token is not None:
        now = f"{body}:{st.st_ino}:{st.st_mtime_ns}"
        if now != token:
            return  # replaced — possibly a same-pid sibling thread's
    else:
        try:
            pid = int(body.split(":", 1)[0] or "0")
        except ValueError:
            return
        if pid != os.getpid():
            return  # someone else's live lock sits at the path
    try:
        os.unlink(lock)
    except OSError:
        pass


# Test seams: called with the lock path just before a steal's rename
# (resp. just before an identity-mismatch restore), so tests can
# deterministically interleave a concurrent stealer / third writer in
# those windows. None in production.
_pre_steal_hook = None
_pre_restore_hook = None


def _acquire_version_lock(table_dir: str, v: int) -> tuple[str, str]:
    """O_CREAT|O_EXCL per-version lock: turns the compute-max+1 /
    rmtree race between two concurrent writers into a loud failure for
    the loser. A dead holder's lock (pid no longer exists — checked
    via the pid recorded in the lock, NOT mtime age alone: a live
    writer's large parquet write can legitimately exceed any fixed
    grace period) is stolen; a live holder raises up to
    LOCK_HARD_GRACE_S, past which the pid is presumed recycled
    (reboot / pid-space wrap) and the lock reclaimed. mtime grace
    (LOCK_GRACE_S) is the fallback when the pid can't be read.
    Steals are ATOMIC (rename-then-delete) and IDENTITY-CHECKED: the
    rename alone only prevents double-claim of the same inode — if a
    faster stealer already replaced the stale lock with its own FRESH
    one, our rename would grab the winner's live lock. The post-rename
    st_ino/st_mtime_ns compare against the inspected file detects
    that, restores the winner's lock, and fails loudly."""
    import time

    os.makedirs(_versions_dir(table_dir), exist_ok=True)
    lock = os.path.join(_versions_dir(table_dir), f".v{v:06d}.lock")
    for _ in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            # Per-acquisition token (round-10 advice fix): pid alone
            # cannot distinguish two writer THREADS in one process.
            # The nonce is the created file's (inode, mtime_ns) from
            # fstat — NOT written into the body, which stays a plain
            # pid so pre-round-10 readers' int(body) liveness check
            # keeps working during a mixed-version window (second r10
            # review pass). Release opens the path once and takes
            # identity + body off that single fd (fstat), then
            # compares the full triple.
            pid = str(os.getpid())
            os.write(fd, pid.encode())
            st = os.fstat(fd)
            os.close(fd)
            return lock, f"{pid}:{st.st_ino}:{st.st_mtime_ns}"
        except FileExistsError:
            try:
                st = os.stat(lock)
            except OSError:
                continue  # holder just committed/released; retry
            age = time.time() - st.st_mtime
            alive = _lock_holder_alive(lock)
            if alive is None:
                alive = age < LOCK_GRACE_S
            elif alive and age > LOCK_HARD_GRACE_S:
                # pid LOOKS alive but the lock predates any plausible
                # single commit: recycled pid (reboot / wrap), reclaim
                alive = False
            if alive:
                raise RuntimeError(
                    f"version v{v:06d} of {table_dir} is being written "
                    "by another live process; snapshot tables are "
                    "single-writer per version — retry after the other "
                    "commit finishes") from None
            # Dead holder: steal ATOMICALLY via rename — two concurrent
            # stealers must not both proceed (a bare unlink would let
            # the slow stealer delete the fast one's freshly created
            # NEW lock and hand both writers the same version). Only
            # one rename on the same source INODE succeeds; the loser
            # either gets FileNotFoundError (fast stealer renamed it
            # first) or — the TOCTOU the identity check below closes —
            # renames the fast stealer's freshly CREATED replacement
            # lock, because rename resolves the path again and does
            # not verify file identity.
            if _pre_steal_hook is not None:
                _pre_steal_hook(lock)  # test seam: interleave a racer
            claimed = f"{lock}.stale.{os.getpid()}.{time.monotonic_ns()}"
            try:
                os.rename(lock, claimed)
            except FileNotFoundError:
                continue  # another stealer claimed it first
            try:
                cst = os.stat(claimed)
            except OSError:
                continue
            if (cst.st_ino, cst.st_mtime_ns) != (st.st_ino, st.st_mtime_ns):
                # We grabbed a DIFFERENT file than the one we judged
                # dead: a concurrent stealer won the race and already
                # holds this version under its own fresh lock. Restore
                # it NON-DESTRUCTIVELY and fail as a live-holder
                # conflict. link (not rename): link fails EEXIST if
                # anything now sits at the lock path — a third writer's
                # fresh O_EXCL lock, or the winner's next incarnation —
                # where rename would silently clobber it; EEXIST means
                # the path is already protected, so just drop our
                # claim. Residual window (documented, not closed): if
                # the winner RELEASED in the few instructions between
                # our rename and this link and no one has re-locked the
                # path yet, the restored lock names a live-but-done pid.
                # Harmless if the winner committed (next writers compute
                # v+1 past the manifest); if it released on its failure
                # path, v is wedged until that pid exits or
                # LOCK_HARD_GRACE_S — bounded. Strictly narrower than
                # the old rename, which additionally clobbered any
                # third writer's fresh lock.
                if _pre_restore_hook is not None:
                    _pre_restore_hook(lock)  # test seam: third writer
                restored = False
                try:
                    os.link(claimed, lock)
                    restored = True
                except FileExistsError:
                    # Path re-protected by a THIRD writer's fresh O_EXCL
                    # lock. Do NOT restore over it — but also do NOT
                    # drop the claimed file: it is the race winner's
                    # only surviving lock copy (the winner's release is
                    # identity-checked, _release_version_lock, so it
                    # will leave the third writer's lock alone — but
                    # deleting the winner's copy would erase the only
                    # record that it holds v). Keeping the claimed file
                    # (restored stays False) preserves it; debris under
                    # a unique .stale.* name never blocks future O_EXCL
                    # acquisitions.
                    pass
                except OSError:
                    # link unsupported/failed (EPERM on some mounts,
                    # EIO): fall back to the old rename restore —
                    # clobbering a racer's lock is recoverable (it
                    # fails loudly), whereas dropping the claimed file
                    # without restoring would leave v UNLOCKED while
                    # the winner is mid-write
                    try:
                        os.rename(claimed, lock)
                        restored = True
                    except OSError:
                        pass
                if restored:
                    # after a rename restore the claimed path is
                    # already gone — the unlink is then a no-op ENOENT
                    try:
                        os.unlink(claimed)
                    except OSError:
                        pass
                # if NEITHER restore worked, keep the claimed file: it
                # is the only surviving copy of the winner's lock, and
                # deleting it would leave v unlocked mid-write
                raise RuntimeError(
                    f"version v{v:06d} of {table_dir} is being written "
                    "by another live process (lost a concurrent "
                    "stale-lock steal); snapshot tables are "
                    "single-writer per version — retry after the "
                    "other commit finishes") from None
            try:
                os.unlink(claimed)
            except OSError:
                pass
    raise RuntimeError(f"could not acquire version lock for v{v:06d}")


def write_snapshot(df: DataFrame, table_dir: str,
                   partition_by: list[str] | None = None) -> int:
    """Commit `df` as the table's next immutable version; returns the
    version number. The manifest rename is the commit point.

    `partition_by` (r16) lays the version's data out hive-partitioned
    on the given columns and records the layout in the manifest:
    time-travel reads then get PARTITION PRUNING on those columns (a
    dt-filtered audit read of one version touches one day's files,
    not the version — plan-asserted in tests/test_snapshot_lifecycle),
    and erase_keys_all_versions preserves the layout across rewrites.
    At 100 TB this is the difference between a version being an
    opaque blob and being a real table: the reference's daily cadence
    makes dt the natural key, exactly like io.write_partitioned.

    Concurrency contract: one writer per VERSION, enforced by an
    O_CREAT|O_EXCL lock file — two concurrent writers both computing
    max+1 no longer rmtree each other's in-progress data; the loser
    fails loudly (live holder) or takes the next number (holder
    already committed and released). Locks left by crashed writers
    are reclaimed by pid-liveness check (mtime grace as fallback)."""
    import shutil

    while True:
        v = (versions(table_dir) or [0])[-1] + 1
        lock, token = _acquire_version_lock(table_dir, v)
        # Re-validate AFTER the lock: another writer may have computed
        # the same v, committed it, and RELEASED its lock between our
        # versions() read and the os.open — without this check we
        # would treat the winner's COMMITTED data dir as a crashed
        # writer's orphan and rmtree an immutable version. Committed
        # manifest present -> drop the lock and take the next number.
        if not os.path.exists(os.path.join(_versions_dir(table_dir),
                                           f"v{v:06d}.json")):
            break
        _release_version_lock(lock, token)
    try:
        # abspath: the manifest must resolve from ANY later working
        # directory / Spark default FS, not just the writer's cwd
        data_path = os.path.abspath(
            os.path.join(table_dir, "data", f"v{v:06d}"))
        if os.path.exists(data_path):
            # data dir without a manifest = a crashed writer's orphan
            # (the manifest rename never happened, so no reader ever
            # saw it; a LIVE writer would have held the lock above) —
            # reclaim it instead of wedging every future write on
            # errorifexists
            shutil.rmtree(data_path)
        writer = df.write.mode("errorifexists")
        if partition_by:
            missing = [c for c in partition_by if c not in df.columns]
            if missing:
                raise ValueError(
                    f"write_snapshot: partition_by column(s) {missing} "
                    "not in the DataFrame")
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)
        manifest = {"version": v, "data": data_path,
                    "schema": df.schema.json()}
        if partition_by:
            manifest["partition_by"] = list(partition_by)
        staged = os.path.join(_versions_dir(table_dir),
                              f".v{v:06d}.json.tmp.{os.getpid()}")
        final = os.path.join(_versions_dir(table_dir), f"v{v:06d}.json")
        with open(staged, "w") as fh:
            json.dump(manifest, fh)
            # fsync before the rename: rename-without-fsync can surface
            # the committed name with truncated contents after power
            # loss, breaking the all-or-nothing contract
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(staged, final)  # the atomic commit
        try:  # directory fsync for durability; best-effort on odd FSes
            dfd = os.open(_versions_dir(table_dir), os.O_RDONLY)
            os.fsync(dfd)
            os.close(dfd)
        except OSError:
            pass
    finally:
        # release (also on failure — don't wedge retries on grace);
        # token-checked so a stolen-and-replaced path — or a same-pid
        # sibling thread's fresh lock — is left alone
        _release_version_lock(lock, token)
    return v


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Time-travel read: the table AS OF `version` (default: latest).

    An EXPIRED version (see :func:`expire_versions`) raises ValueError
    here — its manifest is gone, so it is absent from `versions()` —
    never a partial read. The schema is applied from the manifest, not
    re-inferred from footers, so a version whose data dir holds zero
    row files (an all-rows-erased rewrite by
    :func:`erase_keys_all_versions`) still reads back as a valid empty
    DataFrame with the committed schema instead of failing inference.
    """
    from pyspark.sql.types import StructType

    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"version {v} not committed or expired (have {vs})")
    with open(os.path.join(_versions_dir(table_dir), f"v{v:06d}.json")) as fh:
        manifest = json.load(fh)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    out = spark.read.schema(schema).parquet(manifest["data"])
    # partitioned versions: Spark appends partition columns after the
    # data columns even under a user schema; project back to the
    # committed order so readers see the schema they wrote
    return out.select(*schema.fieldNames())


def snapshot_changes(spark: SparkSession, table_dir: str,
                     from_version: int, to_version: int,
                     keys: list[str]) -> DataFrame:
    """CDC-style diff between two committed versions: one row per
    changed key with change_type in {insert, update, delete}.

    The incremental-consumer read (Delta's CDF / Iceberg's incremental
    scan): a downstream job that processed v_from needs exactly what
    changed by v_to, not a rescan. One full-outer join of the two
    immutable snapshots on the key, null-safe so NULL key values
    diff like any other key; change classification projects off the
    single join. At warehouse scale both sides prune to the join keys
    + compared columns (column pruning), and the join shuffles once on
    the PK — O(|v_from| + |v_to|), never a rescan of history.
    """
    from pyspark.sql import functions as F

    old = read_snapshot(spark, table_dir, from_version)
    new = read_snapshot(spark, table_dir, to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "snapshot_changes requires congruent schemas; versions "
            f"{from_version}/{to_version} differ: "
            f"{sorted(set(old.columns) ^ set(new.columns))} — diff "
            "after projecting both to the shared columns, or migrate "
            "the older version first")
    value_cols = [c for c in new.columns if c not in keys]
    o = old.select(*[F.col(k).alias(f"__o_{k}") for k in keys],
                   *[F.col(c).alias(f"__o_{c}") for c in value_cols],
                   F.lit(True).alias("__o_present"))
    n = new.select(*keys, *value_cols, F.lit(True).alias("__n_present"))
    cond = [n[k].eqNullSafe(o[f"__o_{k}"]) for k in keys]
    j = n.join(o, on=cond, how="full_outer")
    # key-only tables have no value columns: every matched row is
    # unchanged (True), leaving only inserts/deletes — a None here
    # would crash the unary ~ at plan-build time
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    change = (F.when(F.col("__o_present").isNull(), "insert")
              .when(F.col("__n_present").isNull(), "delete")
              .when(~same, "update"))
    out_keys = [F.coalesce(F.col(k), F.col(f"__o_{k}")).alias(k)
                for k in keys]
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .select(*out_keys, "change_type",
                    *[F.col(c).alias(f"new_{c}") for c in value_cols],
                    *[F.col(f"__o_{c}").alias(f"old_{c}")
                      for c in value_cols]))


# ---------------------------------------------------------------------------
# Retention / GC / erasure — the lifecycle half of snapshot versioning.
# write_snapshot accretes immutable version dirs forever; a daily load
# (the reference's cadence, trips_lambda.py:218-246) makes that
# unbounded storage within a quarter. Delta/Iceberg pair time travel
# with VACUUM/expire_snapshots + orphan-file GC; these are the plain-
# parquet equivalents, with the same commit discipline as
# write_snapshot: the MANIFEST rename is the only visibility switch,
# data files move strictly after it.


def expire_versions(table_dir: str, keep_last: int | None = None,
                    before_version: int | None = None,
                    older_than_s: float | None = None) -> list[int]:
    """Drop expired versions (manifest + data), returning the version
    numbers removed. Retention is `keep_last=N` (keep the N newest),
    `before_version=v` (drop everything < v), and/or `older_than_s`
    (drop versions COMMITTED more than that many seconds ago — the
    Delta VACUUM / Iceberg expire_snapshots retention convention;
    commit time is the manifest's mtime, which the atomic rename
    stamps at the commit point). Given several, the doom set is the
    union. The CURRENT (latest) version is never dropped, whatever
    the arguments say.

    Commit protocol per doomed version (concurrent-reader-safe):

      1. acquire the per-version lock (blocks a concurrent
         erase_keys_all_versions rewrite of the same version; a LIVE
         holder makes the expiry fail loudly rather than pull data out
         from under a rewrite);
      2. os.rename() the manifest to a dot-hidden tombstone — atomic:
         from this instant the version is absent from versions() and
         read_snapshot(v) raises ValueError. No reader can BEGIN a
         read of the version past this point;
      3. rmtree the data dir, unlink the tombstone.

    A reader that resolved the manifest BEFORE step 2 and is mid-scan
    during step 3 fails LOUDLY (Spark's scan throws on missing input
    files with default ignoreMissingFiles=false) — never a silent
    partial result; pytest pins that contract
    (tests/test_snapshot_concurrency.py). That is the same contract
    Delta's VACUUM documents for readers older than the retention
    window. At 100 TB this is a metadata decision plus O(expired
    bytes) of deletes — nothing scans surviving data.
    """
    import shutil

    if keep_last is None and before_version is None \
            and older_than_s is None:
        raise ValueError("expire_versions: give keep_last, "
                         "before_version and/or older_than_s "
                         "(refusing to guess retention)")
    if keep_last is not None and keep_last < 1:
        raise ValueError("expire_versions: keep_last must be >= 1 "
                         "(the current version is never expired)")
    vs = versions(table_dir)
    if not vs:
        return []
    doomed: set[int] = set()
    if keep_last is not None:
        doomed |= set(vs[:-keep_last])
    if before_version is not None:
        doomed |= {v for v in vs if v < before_version}
    if older_than_s is not None:
        import time as _t

        cutoff = _t.time() - older_than_s
        for v in vs:
            try:
                mt = os.path.getmtime(os.path.join(
                    _versions_dir(table_dir), f"v{v:06d}.json"))
            except OSError:
                continue  # expired concurrently
            if mt < cutoff:
                doomed.add(v)
    doomed.discard(vs[-1])  # the current version is untouchable
    removed = []
    for v in sorted(doomed):
        lock, token = _acquire_version_lock(table_dir, v)
        try:
            manifest = os.path.join(_versions_dir(table_dir),
                                    f"v{v:06d}.json")
            try:
                with open(manifest) as fh:
                    data_path = json.load(fh).get("data")
            except OSError:
                continue  # already expired by a concurrent call
            tomb = (f"{manifest}.expired."
                    f"{os.getpid()}.{__import__('time').monotonic_ns()}")
            try:
                os.rename(manifest, tomb)  # the atomic expiry point
            except FileNotFoundError:
                continue  # lost the race to a concurrent expiry
            if data_path and os.path.isdir(data_path):
                shutil.rmtree(data_path, ignore_errors=True)
            try:
                os.unlink(tomb)
            except OSError:
                pass
            removed.append(v)
        finally:
            _release_version_lock(lock, token)
    return removed


def gc_orphans(table_dir: str, grace_s: float = LOCK_GRACE_S) -> list[str]:
    """Remove unreferenced debris older than `grace_s`: data dirs no
    manifest points at — crashed writers (the commit rename never
    happened) and SUPERSEDED erase rewrites (the manifest swap landed
    but the old dir's rmtree failed/crashed) — plus staged
    `.json.tmp.*` manifests. Returns the paths removed.

    The grace period is what makes this safe against a LIVE writer:
    write_snapshot lands data files first and commits the manifest
    after, so a young manifest-less dir may be an in-flight commit —
    only dirs whose newest mtime predates the grace window are
    reclaimed, and a dir whose version lock has a live holder is
    skipped outright. Mirrors Iceberg's remove_orphan_files
    `older_than` contract. O(debris), never touches committed data.
    """
    import shutil
    import time

    removed: list[str] = []
    now = time.time()
    committed = {f"v{v:06d}" for v in versions(table_dir)}
    # each committed version's CURRENT data dir (manifest-referenced):
    # any other dir sharing its version prefix is a SUPERSEDED erase
    # rewrite whose post-swap rmtree failed/crashed — reclaimable like
    # any orphan (it is unreferenced and no reader can resolve it)
    live_dirs = set()
    for prefix in committed:
        try:
            with open(os.path.join(_versions_dir(table_dir),
                                   f"{prefix}.json")) as fh:
                live_dirs.add(os.path.basename(json.load(fh)["data"]))
        except (OSError, ValueError, KeyError):
            live_dirs.add(prefix)  # unreadable: be conservative
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            if name in live_dirs:
                continue  # a committed version's current data
            path = os.path.join(data_root, name)
            if not os.path.isdir(path):
                continue
            lock = os.path.join(_versions_dir(table_dir),
                                f".{name.split('.')[0]}.lock")
            if os.path.exists(lock) and _lock_holder_alive(lock):
                continue  # in-flight commit holds the version lock
            try:
                newest = max((os.path.getmtime(os.path.join(dp, f))
                              for dp, _, fs in os.walk(path) for f in fs),
                             default=os.path.getmtime(path))
            except OSError:
                continue
            if now - newest < grace_s:
                continue
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    vdir = _versions_dir(table_dir)
    if os.path.isdir(vdir):
        for name in sorted(os.listdir(vdir)):
            if ".json.tmp." not in name and ".expired." not in name:
                continue
            path = os.path.join(vdir, name)
            try:
                if now - os.path.getmtime(path) < grace_s:
                    continue
                os.unlink(path)
                removed.append(path)
            except OSError:
                pass
    return removed


def erase_keys_all_versions(spark: SparkSession, table_dir: str,
                            delete_keys: DataFrame,
                            keys: list[str]) -> list[int]:
    """GDPR-style erasure that COMPOSES with time travel: rewrite every
    retained version to exclude the key list, so no readable version —
    current or historical — serves an erased key. Returns the versions
    actually rewritten.

    delete_by_keys (operators/maintenance.py) erases the LIVE table;
    on a versioned table that is not erasure at all — every old
    snapshot still serves the keys via read_snapshot. Per version:

      1. acquire the version lock (serializes against a concurrent
         expire_versions / second erasure of the same version);
      2. probe: null-safe LEFT SEMI join of the version against the
         key list, LIMIT 1 — a version holding no doomed row is
         skipped untouched (no rewrite amplification; the probe is a
         column-pruned scan of the key columns only);
      3. rewrite survivors into a fresh immutable dir
         `data/vNNNNNN.erased.<nonce>` (null-safe LEFT ANTI join —
         NULL key values are erasable, the delete_by_keys contract);
      4. stage a manifest pointing at the new dir (+ an `erased`
         audit field), fsync, os.rename() OVER the old manifest —
         atomic replace: a reader sees the old content or the new,
         never a mix — then rmtree the old data dir.

    Version NUMBERS and count are preserved: u9 time travel still
    resolves every version, minus the erased keys. A reader mid-scan
    of the old data dir when step 4's rmtree lands fails loudly (the
    expire_versions contract). Cost is O(sum of versions holding the
    keys), never O(history) for untouched versions; each rewrite is
    one anti-join — at 100 TB with dt-partitioned version data the
    same touched-partition discipline as delete_by_keys would apply
    inside each version.
    """
    import shutil
    import time

    dk = delete_keys.select(*keys).distinct()
    rewritten: list[int] = []
    for v in versions(table_dir):
        lock, token = _acquire_version_lock(table_dir, v)
        try:
            manifest_path = os.path.join(_versions_dir(table_dir),
                                         f"v{v:06d}.json")
            try:
                with open(manifest_path) as fh:
                    manifest = json.load(fh)
            except OSError:
                continue  # expired under us — nothing left to erase
            cur = read_snapshot(spark, table_dir, v)
            missing = [k for k in keys if k not in cur.columns]
            if missing:
                raise ValueError(
                    f"erase_keys_all_versions: version {v} lacks key "
                    f"column(s) {missing} — erasure would silently "
                    "no-op on this version")
            semi = [cur[k].eqNullSafe(dk[k]) for k in keys]
            if not (cur.select(*keys).join(dk, on=semi, how="left_semi")
                    .limit(1).take(1)):
                continue  # version holds no doomed key: leave immutable
            anti = [cur[k].eqNullSafe(dk[k]) for k in keys]
            kept = cur.join(dk, on=anti, how="left_anti")
            old_data = manifest["data"]
            new_data = os.path.abspath(os.path.join(
                table_dir, "data",
                f"v{v:06d}.erased.{os.getpid()}.{time.monotonic_ns()}"))
            writer = kept.write.mode("errorifexists")
            if manifest.get("partition_by"):
                # the rewrite preserves the version's committed layout,
                # so post-erasure readers keep partition pruning
                writer = writer.partitionBy(*manifest["partition_by"])
            writer.parquet(new_data)
            manifest = dict(manifest, data=new_data,
                            erased=manifest.get("erased", 0) + 1)
            staged = os.path.join(_versions_dir(table_dir),
                                  f".v{v:06d}.json.tmp.{os.getpid()}")
            with open(staged, "w") as fh:
                json.dump(manifest, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.rename(staged, manifest_path)  # atomic content swap
            try:
                dfd = os.open(_versions_dir(table_dir), os.O_RDONLY)
                os.fsync(dfd)
                os.close(dfd)
            except OSError:
                pass
            if old_data != new_data and os.path.isdir(old_data):
                shutil.rmtree(old_data, ignore_errors=True)
            rewritten.append(v)
        finally:
            _release_version_lock(lock, token)
    return rewritten
