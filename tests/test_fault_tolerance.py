"""Task-failure re-execution — the reference's M3/M4 fault story.

The reference re-executes failed map/reduce tasks (master.cc heartbeat
+ reassignment); in this engine that control plane is delegated to
Spark (SURVEY §4). This test PROVES the delegation works: a task that
fails on its first attempt is retried and the job completes with the
full, correct result.

Runs in a subprocess because retries need ``local[N, maxFailures]``
at SparkContext construction — the shared test session (maxFailures=1)
cannot be reconfigured live.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4, 2]")  # 2 task attempts
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)


def flaky(it):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    yield from it


rdd = spark.sparkContext.parallelize(range(100), 4).mapPartitions(flaky)
total = rdd.sum()
assert total == sum(range(100)), total

# DataFrame path too: the same injection under a groupBy survives retry
df = spark.createDataFrame([(i, i % 5) for i in range(100)], "v long, k long")
flaked = spark.createDataFrame(
    df.rdd.mapPartitions(flaky), "v long, k long"
)
got = {r.k: r.s for r in flaked.groupBy("k").sum("v").withColumnRenamed("sum(v)", "s").collect()}
want = {k: sum(v for v in range(100) if v % 5 == k) for k in range(5)}
assert got == want, (got, want)
print("RETRY OK")
"""


def test_task_retry_reexecutes_failed_partition():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RETRY OK" in out.stdout


_CURATION_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4, 2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)


def flaky(it):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    yield from it

from mock_map_reduce_spark.operators import curation as cu

rows = [(i, f"src{i % 4}") for i in range(200)]
clean = spark.createDataFrame(rows, "doc_id long, source string")
flaked = spark.createDataFrame(
    clean.rdd.repartition(4).mapPartitions(flaky), "doc_id long, source string"
)
want = sorted(tuple(r) for r in cu.temperature_mixture(clean).collect())
got = sorted(tuple(r) for r in cu.temperature_mixture(flaked).collect())
assert want == got and len(want) > 0, (len(want), len(got))
print("CURATION RETRY OK")
"""


def test_curation_sample_is_retry_deterministic():
    """The curation reproducibility contract under the fault story:
    an md5-keyed sample must survive task re-execution bit-for-bit —
    no RNG state or row-order dependence for a retry to perturb."""
    out = subprocess.run(
        [sys.executable, "-c", _CURATION_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CURATION RETRY OK" in out.stdout
