"""Bucketing + AQE plan behavior — the co-located-join scale story.

Bucketed tables joined on the bucket key need no exchange at join
time: at 100 TB this removes the dominant shuffle of fact-fact joins.
Local test uses a tmp warehouse + in-memory derby metastore.
"""

from __future__ import annotations

import pytest

from mock_map_reduce_spark.plans import final_plan
from mock_map_reduce_spark.sources import load_table


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # external tables (explicit path): spark.sql.warehouse.dir is a
    # static conf and cannot be redirected on a live session
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(tmp_path / "b_orders"))
     .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(tmp_path / "b_lineitem"))
     .mode("overwrite").saveAsTable("b_lineitem"))
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
    ).select("l_orderkey", "o_totalprice")
    plan = final_plan(joined)
    # co-bucketed join: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == li.count()


def test_aqe_coalesces_small_shuffle(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
    )
    plan = final_plan(df)
    # AQE collapsed the 8-partition shuffle for a 5-group aggregate
    assert "AQEShuffleRead coalesced" in plan


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join split — the other half of the skew story
    next to explicit salting: a hot key concentrating ~83% of the probe
    side gets its shuffle partition split at runtime (SortMergeJoin
    carries skew=true) and the join still returns every row."""
    from pyspark.sql import functions as F

    from mock_map_reduce_spark.plans import final_plan

    conf = spark.conf
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: conf.get(k) for k in keys}
    try:
        # shrink the thresholds so the toy hot partition counts as skewed
        conf.set(keys[0], "16384")
        conf.set(keys[1], "8192")
        conf.set(keys[2], "2")
        conf.set(keys[3], "-1")  # force a shuffle join
        big = spark.range(0, 60000).select(
            F.when(F.col("id") < 50000, F.lit(7)).otherwise(F.col("id") % 500).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        small = spark.range(0, 500).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = big.join(small, "k")
        assert j.count() == 60000  # no row lost or duplicated by the split
        plan = final_plan(j)
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
    finally:
        for k, v in saved.items():
            conf.set(k, v)
