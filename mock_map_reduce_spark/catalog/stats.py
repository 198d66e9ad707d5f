"""Statistics catalog: crosstab, exact correlation, approximate quantiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table


@query(
    "stat_crosstab",
    oracle="""
SELECT l_returnflag AS l_returnflag_l_linestatus,
       COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
       COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
FROM lineitem GROUP BY l_returnflag
""",
)
def q_stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via df.stat.crosstab (pairwise frequency counts)."""
    li = load_table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    return ct.select("l_returnflag_l_linestatus", "F", "O")


@query(
    "agg_correlation_exact",
    oracle="""
WITH s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem
)
SELECT ROUND((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / n / n, 2) AS cov_pop,
       n
FROM s
""",
)
def q_agg_correlation_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance from exact decimal
    sums — deterministic where native corr()'s streaming float update
    is partition-order-dependent."""
    qx = F.col("l_quantity").cast("decimal(18,2)")
    py = F.col("l_extendedprice").cast("decimal(18,2)")
    s = load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n"),
        F.sum(qx).cast("double").alias("sx"),
        F.sum(py).cast("double").alias("sy"),
        F.sum(qx * qx).cast("double").alias("sxx"),
        F.sum(py * py).cast("double").alias("syy"),
        F.sum(qx * py).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"])
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    cov = (n * sxy - sx * sy) / n / n
    return s.select(
        F.round(corr, 6).alias("corr_qty_price"),
        F.round(cov, 2).alias("cov_pop"),
        "n",
    )


_QUANTILES = [0.25, 0.5, 0.75, 0.99]


@query(
    "approx_quantiles",
    oracle=f"""
SELECT l_returnflag, q.quantile, TRUE AS within_tol
FROM (SELECT DISTINCT l_returnflag FROM lineitem)
CROSS JOIN (SELECT CAST(unnest({list(_QUANTILES)}) AS DOUBLE) AS quantile) q
""",
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the mergeable-sketch quantile for 100 TB
    groups (exact percentile sorts the group; see agg_percentiles for
    the exact baseline).

    Oracle strategy (t-digest values differ per engine, so raw sketch
    output can never hash-match): per (group, quantile) the query
    emits ONLY a boolean — |approx − exact| ≤ 2% of the group's value
    range — computed against Spark's own exact percentile, whose
    engine parity `agg_percentiles` already proves. The oracle expects
    TRUE for every row, so any sketch-accuracy regression flips a
    cell and fails the hash. No cross-engine float ever reaches the
    compare.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qlit = F.array(*[F.lit(q) for q in _QUANTILES])
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", _QUANTILES, 10000).alias("qs"),
        F.percentile("l_extendedprice", qlit).alias("exact"),
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("rng"),
    )
    return agg.select(
        "l_returnflag", "rng", F.posexplode(F.arrays_zip("qs", "exact")).alias("pos", "z")
    ).select(
        "l_returnflag",
        F.element_at(qlit, F.col("pos") + 1).alias("quantile"),
        (F.abs(F.col("z.qs") - F.col("z.exact")) <= 0.02 * F.col("rng")).alias("within_tol"),
    )
