"""Bucketed co-located join — the layout that deletes the join shuffle.

SURVEY.md §2.2 data-layout slice. The reference repartitions by key
range once and reuses that layout for the reduce (master.cc:472-515);
the warehouse-scale analog is BUCKETED tables: both fact tables
hash-bucketed on the join key at WRITE time, so every future join on
that key is a zero-exchange sort-merge — at 100 TB this removes the
dominant shuffle of fact-fact joins entirely, paying it once at
ingest instead of per query.

tests/test_bucketing.py pins the plan property in isolation; this
catalog entry puts the whole flow (bucketed write -> catalog table ->
exchange-free join) into the driver's hard correctness gate, with the
plan assertion INSIDE the query so a regression to a shuffling join
fails the gate even if results stay right.

NOTE imported last in catalog/__init__: registration order feeds the
driver's sampled prefix; new queries must queue behind the existing
confirmation debt (registry.compute_rotation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

_BUCKETS = 8


@query(
    "layout_bucketed_join",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       round(sum(o.o_totalprice * (1 - 0.01 * c.c_nationkey)), 2) AS adj_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_orderpriority
""",
)
def q_layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders and customer bucketed by custkey, then join them
    through the catalog: the join must plan as a sort-merge over the
    co-located buckets with NO exchange below it (asserted at plan
    time — only the final groupBy may shuffle). The merge hint keeps
    the small side out of a broadcast so the demonstrated property is
    the bucket layout, not broadcastability."""
    from mock_map_reduce_spark.functions.scratch import scratch_dir

    d = scratch_dir("bucketed_join")
    spark.sql("DROP TABLE IF EXISTS b7_orders")
    spark.sql("DROP TABLE IF EXISTS b7_customer")
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .write.bucketBy(_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{d}/b7_orders")
        .mode("overwrite")
        .saveAsTable("b7_orders")
    )
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .write.bucketBy(_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{d}/b7_customer")
        .mode("overwrite")
        .saveAsTable("b7_customer")
    )
    orders = spark.table("b7_orders")
    cust = spark.table("b7_customer")
    joined = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    )
    out = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice") * (1 - 0.01 * F.col("c_nationkey"))), 2
        ).alias("adj_revenue"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_at = plan.find("SortMergeJoin")
    if join_at == -1:
        raise AssertionError("bucketed join did not plan as sort-merge:\n" + plan)
    # executed plans print top-down: anything AFTER the join line is
    # BELOW it. No shuffle may feed the join's children.
    if "Exchange hashpartitioning" in plan[join_at:]:
        raise AssertionError(
            "bucketed join shuffled its inputs — bucket co-location lost:\n" + plan
        )
    return out
