"""Advanced aggregate / reshape catalog: exact variance via decimal
sums, interpolated percentiles, ordered string aggregation, unpivot,
null-handling functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table


@query(
    "agg_variance_exact",
    oracle="""
WITH s AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sq,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       ROUND((sq - sm * sm / n) / n, 2) AS var_pop,
       ROUND(sqrt((sq - sm * sm / n) / n), 2) AS stddev_pop
FROM s
""",
)
def q_agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance from exact decimal sums — order-independent.

    Native var_pop/stddev streams doubles in partition order
    (nondeterministic across engines/retries at the last ulps); sum
    and sum-of-squares over DECIMAL are exact, so the variance is a
    deterministic function of exact inputs.
    """
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(dec).cast("double").alias("sm"),
            F.sum(dec * dec).cast("double").alias("sq"),
            F.count("*").alias("n"),
        )
    )
    var = (F.col("sq") - F.col("sm") * F.col("sm") / F.col("n")) / F.col("n")
    return s.select(
        "o_orderpriority",
        "n",
        F.round(var, 2).alias("var_pop"),
        F.round(F.sqrt(var), 2).alias("stddev_pop"),
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation).

    100 TB note: exact percentile requires a sort of the group — use
    approx_percentile (t-digest, mergeable sketch) on huge groups; the
    exact form is the verification baseline.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "agg_string_collect",
    oracle="""
SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
       COUNT(DISTINCT l_linestatus) AS n_statuses
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sorted -> joined: deterministic ordered aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@query(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
""",
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape via unpivot (melt)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val")


@query(
    "null_handling",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       CAST(c_acctbal < 0 AS INT) AS overdrawn,
       ifnull(NULL, c_custkey) AS keyed
FROM customer
""",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
        (F.col("c_acctbal") < 0).cast("int").alias("overdrawn"),
        F.ifnull(F.lit(None).cast("long"), F.col("c_custkey")).alias("keyed"),
    )


@query(
    "try_error_handling",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       ROUND(CASE WHEN o_custkey % 3 = 0 THEN NULL
                  ELSE CAST(o_totalprice AS DOUBLE) / (o_custkey % 3) END, 4) AS try_div
FROM orders
""",
)
def q_try_error_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe error handling: try_cast yields NULL instead of
    raising on malformed input, try_divide on division by zero — the
    functions that keep a 100 TB job from dying on one bad row. The
    oracle spells try_divide as an explicit CASE (DuckDB has TRY_CAST
    but no try_divide)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
        F.round(
            F.expr("try_divide(CAST(o_totalprice AS DOUBLE), o_custkey % 3)"), 4
        ).alias("try_div"),
    )
