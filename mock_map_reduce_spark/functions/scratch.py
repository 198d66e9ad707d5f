"""Recycled per-query scratch directories.

Queries that materialize an on-disk artifact mid-plan (WAP publish,
XML round-trip, partitioned-layout reads, streaming workdirs) used to
``tempfile.mkdtemp`` a fresh dir per invocation and never clean up —
bench reps (3x per query) and repeated driver rounds accumulated
unbounded stale parquet under /tmp. ``scratch_dir(name)`` instead
hands out a DETERMINISTIC per-query path and wipes it on entry, so
total scratch footprint is bounded by one live dir per query name no
matter how many times the catalog re-runs.

The dir must survive until the driver collects the returned (lazy)
DataFrame, so cleanup happens at the NEXT invocation rather than on
exit — recycle-on-entry, not delete-on-return.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_ROOT = os.path.join(tempfile.gettempdir(), "mmr_spark_scratch")


def scratch_dir(name: str) -> str:
    """Return an empty scratch dir unique to ``name``, wiping any
    leftover contents from a previous invocation of the same query."""
    d = os.path.join(_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
