"""Data-governance catalog: privacy risk audits over the warehouse.

Complements textops' PII *scrubbing* (redact what's in the text) with
release-risk *measurement* (what the joined relational data reveals):
k-anonymity — how many quasi-identifier groups are small enough to
single people out — and l-diversity — whether a group's sensitive
attribute is uniform enough to infer even without singling out.
Both are pure integer aggregations, so the audit sits in the
bit-exact hash gate like any other query.

Registered after the main catalog block ON PURPOSE (see
catalog/__init__) so round-new queries queue behind the outstanding
driver-confirmation debt in the sampled prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

K_ANON = 5  # groups below this size are re-identification risks


@query(
    "privacy_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT c.c_nationkey,
         o.o_orderpriority,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
         o.o_orderstatus
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT c_nationkey, o_orderpriority, order_year,
         count(*) AS n, count(DISTINCT o_orderstatus) AS ndv
  FROM qi GROUP BY 1, 2, 3
)
SELECT c_nationkey,
       count(*) AS n_groups,
       CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT) AS n_suppressed,
       MIN(ndv) AS min_l_diversity
FROM g GROUP BY 1
""",
)
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit (Sweeney 2002;
    Machanavajjhala et al. 2007) per nation: quasi-identifier =
    (nation, order priority, order year); sensitive attribute =
    order status. A QI group smaller than K_ANON rows would single
    out individuals in a data release, so its rows are counted as
    must-suppress; min_l_diversity is the worst-case count of
    distinct sensitive values across the nation's groups (1 means
    some group leaks its status to anyone who can name the group).

    Plan shape: broadcast the customer dim onto the orders scan, one
    map-side-combinable groupBy at QI cardinality (|nations| x
    |priorities| x |years| — tiny next to the fact table even at
    100 TB), then a second agg over the group table. The audit's
    cost IS the fact scan; everything after is metadata-scale.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("order_year"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    qi = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    g = qi.groupBy("c_nationkey", "o_orderpriority", "order_year").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderstatus").alias("ndv"),
    )
    small = F.col("n") < K_ANON
    return g.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).alias("n_small_groups"),
        F.sum("n").alias("n_rows"),
        F.sum(F.when(small, F.col("n")).otherwise(0)).alias("n_suppressed"),
        F.min("ndv").alias("min_l_diversity"),
    )
