"""materialize() — the fault-tolerant pin replacing localCheckpoint.

Three contracts:
  1. result values are the input's values (it only pins, never alters);
  2. without a checkpoint dir it persists WITH lineage retained (the
     fault-tolerance fix: a lost executor recomputes instead of
     failing the job) and evaluates eagerly;
  3. with a reliable checkpoint dir configured it returns a
     checkpointed frame (lineage cut onto the reliable FS).
"""

from pyspark.sql import functions as F

from mock_map_reduce_spark.functions.materialize import materialize


def test_materialize_preserves_values(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = materialize(df)
    assert sorted(r["v"] for r in out.collect()) == [2 * i for i in range(100)]


def test_materialize_persist_path_keeps_lineage(spark):
    # cut_lineage=False always takes the persist path, even when an
    # earlier test's cut_lineage call auto-provisioned a checkpoint
    # dir on the shared session (order-independence).
    df = spark.range(50).withColumn("v", F.col("id") + 1)
    out = materialize(df)
    # Persisted (one computation shared by consumers) ...
    assert out.storageLevel.useMemory or out.storageLevel.useDisk
    # ... but the logical plan still reaches the source Range — lineage
    # was NOT truncated, so partition loss is recomputable.
    assert "Range" in out._jdf.queryExecution().logical().toString()
    out.unpersist()


def test_materialize_checkpoint_path(spark, tmp_path):
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        df = spark.range(20).withColumn("v", F.col("id") * 3)
        out = materialize(df, cut_lineage=True)
        # A reliable checkpoint: lineage is truncated (the plan no
        # longer reaches the Range source) and the backing blocks were
        # written under the configured reliable dir.
        assert "Range" not in out._jdf.queryExecution().logical().toString()
        import glob

        assert glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))
        assert sorted(r["v"] for r in out.collect()) == [3 * i for i in range(20)]
    finally:
        # pyspark has no unsetCheckpointDir; restore via the JVM so
        # tests sharing the session see the prior state again.
        if prev is None:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        else:
            sc.setCheckpointDir(prev)


def test_materialize_cut_lineage_autoprovisions_local_dir(spark):
    """cut_lineage=True in local mode must self-provision a reliable
    checkpoint dir and actually cut the plan (the iterative-loop
    regression guard: +31-37% bench cost when round pins kept
    lineage)."""
    sc = spark.sparkContext
    had = sc.getCheckpointDir()
    df = spark.range(30).withColumn("v", F.col("id") + 7)
    out = materialize(df, cut_lineage=True)
    try:
        assert sc.getCheckpointDir() is not None
        assert "Range" not in out._jdf.queryExecution().logical().toString()
        assert sorted(r["v"] for r in out.collect()) == [i + 7 for i in range(30)]
    finally:
        if had is None:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_materialize_persist_path_survives_block_loss(spark):
    """THE fault-tolerance claim, demonstrated: drop every cached block
    after the pin (the local-mode stand-in for losing the executors
    that held them) — consumers still compute correct values because
    lineage was kept. localCheckpoint could not survive this: its
    blocks ARE the only copy once lineage is truncated."""
    from pyspark.sql import functions as F

    df = spark.range(1000).withColumn("v", F.col("id") * 2 + 1)
    out = materialize(df)
    assert out.storageLevel.useMemory or out.storageLevel.useDisk
    # simulate losing the persisted blocks
    out.unpersist(blocking=True)
    assert sum(r["v"] for r in out.collect()) == sum(2 * i + 1 for i in range(1000))
