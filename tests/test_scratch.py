"""scratch_dir: per-process namespacing + recycle-on-entry contract."""

from __future__ import annotations

import os

from mock_map_reduce_spark.functions import scratch


def test_scratch_is_namespaced_per_user_and_pid():
    d = scratch.scratch_dir("t_ns")
    assert f"mmr_spark_scratch_{os.getuid()}" in d
    assert os.sep + str(os.getpid()) + os.sep in d
    assert os.path.isdir(d)


def test_scratch_recycles_on_entry_and_separates_names():
    d1 = scratch.scratch_dir("t_recycle")
    marker = os.path.join(d1, "leftover")
    open(marker, "w").close()
    d2 = scratch.scratch_dir("t_other")
    assert d2 != d1
    assert os.path.exists(marker)  # other names don't wipe this one
    d1b = scratch.scratch_dir("t_recycle")
    assert d1b == d1
    assert not os.path.exists(marker)  # same name wipes on entry


def test_dead_sibling_roots_are_reaped():
    """A stale pid dir from a dead process is removed on (re)init."""
    fake = os.path.join(scratch._USER_ROOT, "999999999")
    os.makedirs(fake, exist_ok=True)
    scratch._initialized = False
    scratch.scratch_dir("t_reap")
    assert not os.path.exists(fake)
