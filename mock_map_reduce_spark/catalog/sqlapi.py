"""SQL-API catalog — queries expressed as spark.sql over registered
views (same Catalyst plans as the DataFrame API; demonstrates the
engine's SQL surface, SURVEY §2.2 "SQL parser/catalog" row).

Shapes are TPC-H Q3/Q5 adapted to the driver schema (orders carries
o_orderpriority instead of o_shippriority; supplier joins through
s_nationkey = c_nationkey as in Q5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import register_views

_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       {date_fmt} AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, {date_fmt}, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query(
    "sql_q3_shipping_priority",
    oracle=_Q3.format(date_fmt="strftime(o_orderdate, '%Y-%m-%d')"),
)
def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q3.format(date_fmt="date_format(o_orderdate, 'yyyy-MM-dd')"))


@query(
    "sql_q5_local_supplier_volume",
    oracle=_Q5,
)
def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q5)


_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("sql_q6_forecast_revenue", oracle=_Q6)
def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — the pushdown showcase (every
    predicate reaches the parquet scan; no joins, one partial/final
    agg pair, exchange carries one row per partition)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6)


@query("sql_q10_returned_items", oracle=_Q10)
def q_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (driver schema: no phone/address/comment):
    returned-item revenue top-20 — fact-fact join then bounded top-k
    (TakeOrderedAndProject), nation broadcast."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10)
