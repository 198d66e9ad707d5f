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


@query(
    "agg_mad_robust",
    oracle="""
WITH m AS (SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med FROM orders GROUP BY 1),
d AS (SELECT o.o_orderpriority, ABS(o.o_totalprice - m.med) AS ad, m.med
      FROM orders o JOIN m USING (o_orderpriority))
SELECT o_orderpriority, ROUND(ANY_VALUE(med), 2) AS median_price,
       ROUND(quantile_cont(ad, 0.5), 2) AS mad
FROM d GROUP BY 1
""",
)
def q_agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the outlier-immune spread
    measure (stddev is hostage to a single corrupt row; MAD isn't).

    Two exact-percentile passes: the per-group median table is
    group-cardinality-sized, so it broadcasts back onto the fact scan
    and only the two percentile aggregations shuffle. 100 TB: swap
    both for approx_percentile (mergeable t-digest), same shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    d = orders.join(F.broadcast(m), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("ad"),
    )
    return d.groupBy("o_orderpriority").agg(
        F.round(F.first("med"), 2).alias("median_price"),
        F.round(F.percentile("ad", F.lit(0.5)), 2).alias("mad"),
    )


@query(
    "agg_regression_by_type",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 - 1704067200 AS DECIMAL(18,0)) AS x,
         CAST(value AS DECIMAL(18,2)) AS y
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(x*y) AS sxy
  FROM e GROUP BY 1
)
SELECT event_type, n,
       ROUND(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 9) AS slope,
       ROUND((CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n, 6) AS intercept
FROM s
""",
)
def q_agg_regression_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact OLS fit (value vs. time) per event type from DECIMAL
    moment sums — the same merge-safe aggregate algebra as
    agg_variance_exact, extended to two variables.

    Native regr_slope streams doubles in partition order
    (nondeterministic last ulps); decimal Sx/Sy/Sxx/Sxy are exact and
    associative, so partial aggregation and AQE re-planning cannot
    change the answer. x is seconds since 2024-01-01 (small decimals;
    products stay far from DECIMAL(38) overflow at any SF).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (
        (F.unix_micros("ts") / F.lit(1_000_000)).cast("long") - F.lit(1_704_067_200)
    ).cast("decimal(18,0)")
    y = F.col("value").cast("decimal(18,2)")
    s = ev.select(F.col("event_type"), x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n")
    return s.select(
        "event_type",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


@query(
    "events_outliers_robust",
    oracle="""
WITH e AS (SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
m AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM e GROUP BY 1),
d AS (SELECT e.event_id, e.event_type, e.value, m.med
      FROM e JOIN m USING (event_type)),
s AS (SELECT event_type, quantile_cont(ABS(value - med), 0.5) AS mad FROM d GROUP BY 1)
SELECT d.event_type,
       COUNT(*) AS n_outliers,
       MIN(d.value) AS min_outlier,
       MAX(d.value) AS max_outlier
FROM d JOIN s USING (event_type)
WHERE s.mad > 0 AND ABS(d.value - d.med) / (1.4826 * s.mad) > 3.5
GROUP BY 1
""",
)
def q_events_outliers_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: flag values whose modified z-score
    |x − median| / (1.4826·MAD) exceeds 3.5 — the standard
    outlier rule that, unlike mean/stddev z-scores, cannot be dragged
    by the outliers it is hunting. Median/MAD tables are
    group-cardinality-sized and broadcast back onto the fact scan;
    the flagging predicate rides the scan.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )
    m = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    d = ev.join(F.broadcast(m), "event_type")
    s = d.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    flagged = d.join(F.broadcast(s), "event_type").filter(
        (F.col("mad") > 0)
        & (F.abs(F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad")) > 3.5)
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_outliers"),
        F.min("value").alias("min_outlier"),
        F.max("value").alias("max_outlier"),
    )
