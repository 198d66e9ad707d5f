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

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

import itertools

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

_BUCKETS = 8
# Per-invocation table-name suffixes: fixed global names (b7_orders)
# raced concurrent invocations in the shared metastore (round-8
# ADVICE). Names carry pid + a counter; the previous invocation's
# tables are dropped on entry so the session catalog stays bounded.
_seq = itertools.count()
_prev_tables: list[str] = []


@query(
    "layout_bucketed_join",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)) * (100 - c.c_nationkey)) AS DOUBLE)
         / 100 AS adj_revenue
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
    the bucket layout, not broadcastability.

    adj_revenue is summed as exact DECIMAL(18,2) x integer (the repo's
    money convention — round-7's one driver failure was a raw-double
    sum whose addition order put Spark and DuckDB one cent apart
    across a .005 rounding boundary). No round() on top: the sf0.01
    2-HIGH group's exact sum lands on a half-cent, where Spark
    (HALF_UP on the decimal string) and DuckDB (on the binary double)
    round differently — instead the identical exact sum is cast to
    double and /100'd, both IEEE-deterministic scalar ops.

    Production pays the bucketing ONCE at ingest — that is the entire
    point of the layout. This gate entry re-buckets per invocation
    only so the driver exercises the full write->catalog->join flow;
    its measured cost is dominated by the writes, not the
    exchange-free join being demonstrated (tests/test_bucketing.py
    times the join alone)."""
    from mock_map_reduce_spark.functions.scratch import scratch_dir

    d = scratch_dir("bucketed_join")
    for t in _prev_tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    _prev_tables.clear()
    tag = f"{os.getpid()}_{next(_seq)}"
    t_orders, t_cust = f"b7_orders_{tag}", f"b7_customer_{tag}"
    _prev_tables.extend([t_orders, t_cust])
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .write.bucketBy(_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{d}/{t_orders}")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .write.bucketBy(_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{d}/{t_cust}")
        .mode("overwrite")
        .saveAsTable(t_cust)
    )
    orders = spark.table(t_orders)
    cust = spark.table(t_cust)
    joined = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    )
    out = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
                * (F.lit(100) - F.col("c_nationkey"))
            ).cast("double")
            / 100
        ).alias("adj_revenue"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Under AQE the string can append an "Initial Plan" dump whose
    # pre-optimization exchanges are never executed — cut before
    # searching (round-8 ADVICE; same convention as tests/test_plans).
    plan = plan.split("Initial Plan")[0]
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


@query(
    "layout_compact_small_files",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY 1
""",
)
def q_layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the OPTIMIZE maintenance job) inside the
    hard gate: fragment orders into 64 tiny parquet files (the shape
    every per-micro-batch / per-task sink degenerates into), compact
    with sources.compact_parquet (size-targeted round-robin rewrite),
    assert the file count actually collapsed, and hand the COMPACTED
    table's aggregate to the oracle — so the rewrite is proven
    lossless, not just smaller. At 100 TB the fragmented layout wrecks
    scan planning (a split + footer fetch per file) long before it
    wrecks storage; compaction runs per-partition behind WAP so
    readers never see a half-rewritten table (catalog/lifecycle.py)."""
    from mock_map_reduce_spark.functions.scratch import scratch_dir
    from mock_map_reduce_spark.sources.tables import compact_parquet

    d = scratch_dir("compact_files")
    src, dst = f"{d}/fragmented", f"{d}/compacted"
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartition(64)
        .write.parquet(src)
    )
    n_in = len(spark.read.parquet(src).inputFiles())
    n_out = compact_parquet(spark, src, dst)
    if not n_out < n_in:
        raise AssertionError(f"compaction did not shrink: {n_in} -> {n_out} files")
    return (
        spark.read.parquet(dst)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
