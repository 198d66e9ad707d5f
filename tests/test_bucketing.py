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
