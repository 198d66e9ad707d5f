"""Recycled per-query scratch directories.

Queries that materialize an on-disk artifact mid-plan (WAP publish,
XML round-trip, partitioned-layout reads, streaming workdirs) used to
``tempfile.mkdtemp`` a fresh dir per invocation and never clean up —
bench reps (3x per query) and repeated driver rounds accumulated
unbounded stale parquet under /tmp. ``scratch_dir(name)`` instead
hands out a DETERMINISTIC per-query path and wipes it on entry, so
total scratch footprint is bounded by one live dir per query name no
matter how many times the catalog re-runs.

The root is namespaced per USER and per PROCESS (round-8 ADVICE fix):
a fixed world-shared path meant any concurrent run of the repo
(parallel bench/driver/pytest sessions, or another user on the host)
could wipe a live query's bucketed tables or streaming checkpoint
mid-collect, and a predictable /tmp path is a symlink/pre-creation
hazard. Each process now recycles only its OWN dirs; dead siblings'
leftovers are reaped lazily (pid liveness check) and our own root is
removed atexit, so the bounded-footprint property survives.

The dir must survive until the driver collects the returned (lazy)
DataFrame, so cleanup happens at the NEXT invocation rather than on
return — recycle-on-entry, not delete-on-return.
"""

from __future__ import annotations

import atexit
import errno
import os
import shutil
import tempfile

_USER_ROOT = os.path.join(tempfile.gettempdir(), f"mmr_spark_scratch_{os.getuid()}")
_ROOT = os.path.join(_USER_ROOT, str(os.getpid()))
_initialized = False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM
    return True


def _init_root() -> None:
    """First use in this process: reap dead siblings, arm atexit."""
    global _initialized
    os.makedirs(_USER_ROOT, mode=0o700, exist_ok=True)
    for entry in os.listdir(_USER_ROOT):
        if entry.isdigit() and not _pid_alive(int(entry)):
            shutil.rmtree(os.path.join(_USER_ROOT, entry), ignore_errors=True)
    atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    _initialized = True


def scratch_dir(name: str) -> str:
    """Return an empty scratch dir unique to (this process, ``name``),
    wiping any leftover contents from a previous invocation of the
    same query in this process."""
    if not _initialized:
        _init_root()
    d = os.path.join(_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
