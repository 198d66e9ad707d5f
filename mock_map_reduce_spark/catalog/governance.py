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

    Plan shape: join the customer dim onto the orders scan (no
    forced broadcast hint — customer scales WITH the fact table in
    TPC-H, so at 100 TB it may exceed broadcast size; AQE/size
    thresholds pick broadcast when it fits and fall back to a
    shuffle join when it doesn't), one map-side-combinable groupBy
    at QI cardinality (|nations| x |priorities| x |years| — tiny
    next to the fact table even at 100 TB), then a second agg over
    the group table. Everything after the scan+join is
    metadata-scale.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("order_year"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    qi = orders.join(cust, orders.o_custkey == cust.c_custkey)
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


@query(
    "privacy_k_anonymity_generalize",
    oracle=f"""
WITH qi AS (
  SELECT c.c_nationkey AS nk,
         o.o_orderpriority AS pr,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
r AS (
  SELECT nk, pr, yr, CAST(floor((yr - 1992) / 3) AS BIGINT) AS yb FROM qi
),
g0 AS (SELECT nk, pr, yr, count(*) AS n0 FROM r GROUP BY 1, 2, 3),
g1 AS (SELECT nk, pr, yb, count(*) AS n1 FROM r GROUP BY 1, 2, 3),
g2 AS (SELECT nk, pr, count(*) AS n2 FROM r GROUP BY 1, 2),
lv AS (
  SELECT r.nk,
         CASE WHEN g0.n0 >= {K_ANON} THEN 0
              WHEN g1.n1 >= {K_ANON} THEN 1
              WHEN g2.n2 >= {K_ANON} THEN 2
              ELSE 3 END AS lvl
  FROM r
  JOIN g0 ON r.nk = g0.nk AND r.pr = g0.pr AND r.yr = g0.yr
  JOIN g1 ON r.nk = g1.nk AND r.pr = g1.pr AND r.yb = g1.yb
  JOIN g2 ON r.nk = g2.nk AND r.pr = g2.pr
)
SELECT nk AS c_nationkey,
       CAST(SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS released_exact_year,
       CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS released_year_band,
       CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS released_no_year,
       CAST(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS suppressed
FROM lv GROUP BY 1
""",
)
def q_privacy_k_anonymity_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymization ALGORITHM on top of the audit: a
    generalization LADDER (the Datafly/Incognito full-domain recoding
    idea) over the year attribute — exact year -> 3-year band -> year
    dropped — where each row is released at the FIRST rung whose
    group (computed over all rows at that rung) reaches K_ANON, and
    suppressed only if even (nation, priority) stays small. Rung
    counts are monotone because the keys nest, so the ladder is
    well-defined; the per-nation release profile (how much temporal
    precision the data keeps) is the query's output — all integers,
    hash-exact.

    Plan shape: three groupBy aggregates at (nested) QI cardinality
    — each map-side combinable, each metadata-scale — BROADCAST back
    onto the single fact scan (the g0/g1/g2 tables really are
    bounded by QI cardinality, unlike customer, which is joined
    with no forced hint for the same reason as the audit query);
    the classification is a codegen'd CASE; the final rollup is one
    exchange at nation cardinality. Cost at 100 TB: one scan of the
    fact table, as the audit's.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("pr"),
        F.year("o_orderdate").cast("long").alias("yr"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    r = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_nationkey").alias("nk"),
            "pr",
            "yr",
            F.floor((F.col("yr") - 1992) / 3).cast("long").alias("yb"),
        )
    )
    g0 = r.groupBy("nk", "pr", "yr").agg(F.count(F.lit(1)).alias("n0"))
    g1 = r.groupBy("nk", "pr", "yb").agg(F.count(F.lit(1)).alias("n1"))
    g2 = r.groupBy("nk", "pr").agg(F.count(F.lit(1)).alias("n2"))
    lv = (
        r.join(F.broadcast(g0), ["nk", "pr", "yr"])
        .join(F.broadcast(g1), ["nk", "pr", "yb"])
        .join(F.broadcast(g2), ["nk", "pr"])
        .select(
            "nk",
            F.when(F.col("n0") >= K_ANON, 0)
            .when(F.col("n1") >= K_ANON, 1)
            .when(F.col("n2") >= K_ANON, 2)
            .otherwise(3)
            .alias("lvl"),
        )
    )
    return lv.groupBy(F.col("nk").alias("c_nationkey")).agg(
        F.sum((F.col("lvl") == 0).cast("int")).cast("long").alias("released_exact_year"),
        F.sum((F.col("lvl") == 1).cast("int")).cast("long").alias("released_year_band"),
        F.sum((F.col("lvl") == 2).cast("int")).cast("long").alias("released_no_year"),
        F.sum((F.col("lvl") == 3).cast("int")).cast("long").alias("suppressed"),
    )
