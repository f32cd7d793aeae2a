"""Process-scoped /tmp directories with two-level reaping.

Per-process paths (``{prefix}_{pid}``) keep concurrent sessions from
clobbering each other's materialized tables (bucketed layouts, PNG
fixtures, sink scratch), but naively they accrete: every benchmark run
leaves a full table copy behind. Two reapers bound that:

  - atexit: this process removes its own dirs on normal interpreter
    exit (pure-Python rmtree — safe even after the JVM is gone);
  - on creation, sibling dirs of the same prefix whose pid no longer
    exists are removed (covers SIGKILLed/crashed runs, which atexit
    cannot).

A live process's dirs are never touched: liveness is os.kill(pid, 0).

SINGLE-HOST / SAME-PID-NAMESPACE ASSUMPTION (same contract as
operators/snapshots.py): os.kill(pid, 0) only answers liveness for
pids visible in THIS process's namespace. If two containers (or host
plus container) ever shared a /tmp mount, each would see the other's
live pids as nonexistent and reap in-use dirs mid-query. The scratch
store is process-local benchmark plumbing, never a shared data path,
so the single-host assumption is by construction — but do not point
TMPDIR at a cross-namespace shared mount.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_REGISTERED: set[str] = set()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _reap_orphans(prefix: str) -> None:
    tmp = tempfile.gettempdir()
    try:
        entries = os.listdir(tmp)
    except OSError:
        return
    for name in entries:
        if not name.startswith(prefix + "_"):
            continue
        suffix = name[len(prefix) + 1:]
        if not suffix.isdigit() or _pid_alive(int(suffix)):
            continue
        shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)


def process_dir(prefix: str) -> str:
    """Create-or-return ``$TMPDIR/{prefix}_{pid}``, registered for
    atexit removal; reaps same-prefix dirs of dead processes."""
    d = os.path.join(tempfile.gettempdir(), f"{prefix}_{os.getpid()}")
    if d not in _REGISTERED:
        _reap_orphans(prefix)
        _REGISTERED.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
