"""Semantic pins for the part-2 SQL-API catalog (TPC-H shapes).

Engine-vs-engine value parity is the oracle gate's job
(tools/check_oracle.py); here we pin a few invariants that would
catch a *mis-specified* query that still matches its own oracle
(the SQL string is shared, so oracle parity alone can't see a wrong
predicate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mock_map_reduce_spark import registry
from mock_map_reduce_spark.sources import load_table

registry.load_all()


def _q(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir)


def test_q13_histogram_covers_every_customer(spark, sf_dir):
    rows = _q(spark, sf_dir, "sql_q13_customer_distribution").collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust  # partition of customers


def test_q15_is_the_argmax_supplier(spark, sf_dir):
    rows = _q(spark, sf_dir, "sql_q15_top_supplier").collect()
    assert len(rows) >= 1
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
            ).alias("r")
        )
    )
    top = rev.agg(F.max("r")).collect()[0][0]
    assert all(abs(r.total_revenue - float(top)) < 1e-6 for r in rows)


def test_q4_exists_counts_only_qualifying_orders(spark, sf_dir):
    rows = _q(spark, sf_dir, "sql_q4_order_priority").collect()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expect = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
        )
        .join(
            li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .count()
    )
    assert sum(r.order_count for r in rows) == expect


def test_q21_sole_blame_excludes_shared_blame_orders(spark, sf_dir):
    # Every counted (supplier, order) must be the ONLY 'R' supplier on a
    # multi-supplier finished order; recompute via window instead of
    # EXISTS to cross-check the decorrelation.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = (
        li.join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
                "n_blamed"
            ),
        )
    )
    sole = per_order.filter((F.col("n_supp") > 1) & (F.col("n_blamed") == 1)).count()
    rows = _q(spark, sf_dir, "sql_q21_suppliers_kept_waiting").collect()
    assert rows, "q21 must select rows at sf0.001"
    # The query counts (supplier, line) pairs; with one blamed supplier
    # per qualifying order and >=1 'R' line each, total numwait >= sole
    # order count is the weakest safe bound; equality when no supplier
    # has two 'R' lines in one order.
    assert sum(r.numwait for r in rows) >= sole > 0 or sole == 0


def test_q18_semijoin_threshold(spark, sf_dir):
    rows = _q(spark, sf_dir, "sql_q18_large_volume_customer").collect()
    for r in rows:
        assert r.sum_qty > 250  # HAVING threshold survived the re-aggregation

def test_q11_threshold_is_global_share(spark, sf_dir):
    # Every surviving part's stock value must exceed 0.05% of the
    # nation-filtered grand total, recomputed independently here.
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
    per_part = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(18,2)")
            ).alias("val")
        )
    )
    total = float(per_part.agg(F.sum("val")).collect()[0][0])
    rows = _q(spark, sf_dir, "sql_q11_important_stock").collect()
    assert rows, "q11 must select rows at sf0.001"
    cutoff = total * 0.0005
    assert all(r.stock_value > cutoff for r in rows)
    # and completeness: the query returns EVERY part above the cutoff
    n_above = per_part.filter(F.col("val") > cutoff * 1.0000001).count()
    assert len(rows) >= n_above
