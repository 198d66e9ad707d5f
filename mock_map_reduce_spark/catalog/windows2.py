"""Second window-function batch + remaining relational odds and ends:
ranking variants, range frames, bag set ops, histograms, correlated
subqueries, outer explode, string functions round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table, register_views


@query(
    "window_ranking_variants",
    oracle="""
SELECT o_orderkey,
       ntile(4)       OVER w AS quartile,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS prank,
       cume_dist()    OVER w AS cdist,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_window_ranking_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        # RAW doubles, deliberately un-rounded: both engines derive
        # these from the same integer rank/count division, so the IEEE
        # result is bit-identical — while round(x, 6) DIVERGES on exact
        # mid-tie ratios (sf10's n=2,992,000 partitions make k/n hit
        # ...25e-7 exactly: Spark rounds the shortest-decimal repr via
        # BigDecimal.valueOf -> HALF_UP -> up, DuckDB/Python round the
        # binary value just below the tie -> down; 93 rows diverged).
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("o_orderkey", 2).over(wrows).alias("second_key"),
    )


@query(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                      RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS orders_last_90d
FROM orders
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch days: trailing-90-day order count per customer.

    A rows-frame counts N physical rows; the range frame counts rows
    within a VALUE window — the correct semantics for trailing-period
    metrics with irregular event spacing.
    """
    df = load_table(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-90, Window.currentRow)
    )
    return df.select(
        "o_orderkey", "o_custkey", F.count("*").over(w).alias("orders_last_90d")
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect (multiplicity = min of the two sides)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersectAll(f)


@query(
    "set_except_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics except (multiplicity = left minus right, floored at 0)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.exceptAll(f)


@query(
    "histogram_totalprice",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM orders GROUP BY 1
""",
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — the scan-once profile of a 100 TB column."""
    df = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return df.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


_CORR = """
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS n_finished
FROM customer
"""


@query("correlated_scalar_subquery", oracle=_CORR)
def q_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into a
    left outer aggregate join (no per-row re-scan)."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR)


@query(
    "explode_outer_null_preserved",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN NULL
              ELSE string_split_regex(lang, '\s+') END AS tags
  FROM documents
)
SELECT doc_id, CASE WHEN tags IS NULL THEN NULL ELSE unnest(tags) END AS tag FROM t
UNION ALL
SELECT doc_id, NULL AS tag FROM t WHERE tags IS NULL
""",
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with NULL arrays survive with a NULL element
    (plain explode would drop them)."""
    docs = load_table(spark, sf_dir, "documents")
    tags = F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
        F.split(F.col("lang"), r"\s+")
    )
    return docs.select("doc_id", F.explode_outer(tags).alias("tag"))


@query(
    "string_funcs2",
    oracle="""
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       replace(p_type, 'ECONOMY', 'ECO') AS type_short,
       upper(p_brand) AS brand_upper,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       reverse(p_name) AS name_rev,
       CAST(strpos(p_name, ' ') AS INT) AS space_at
FROM part
""",
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.upper("p_brand").alias("brand_upper"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_name").alias("name_rev"),
        F.instr(F.col("p_name"), " ").cast("int").alias("space_at"),
    )


@query(
    "window_ntile_quartiles",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
FROM orders
""",
)
def q_window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning per group: NTILE(4) over (price, key) — the
    deterministic tie-break keeps both engines' bucket boundaries
    identical. One shuffle on the partition key; at 100 TB swap for
    approx_percentile cutpoints to avoid the per-group sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_orderpriority", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "revenue_share_by_nation",
    oracle="""
WITH rev AS (
  SELECT n_name AS nation,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS r
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1
)
SELECT nation, CAST(r AS DOUBLE) AS revenue,
       ROUND(CAST(r AS DOUBLE) / CAST(SUM(r) OVER () AS DOUBLE), 6) AS share,
       CAST(RANK() OVER (ORDER BY r DESC) AS INT) AS rnk
FROM rev
""",
)
def q_revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis (ratio-to-report): each nation's revenue,
    its share of the global total, and its rank — the unpartitioned
    window runs over the nation-cardinality aggregate (25 rows at any
    data scale), so the single-partition stage is free; the star join
    + groupBy upstream is the only corpus-scale work. Decimal revenue
    keeps the shares deterministic under re-aggregation.
    """
    from mock_map_reduce_spark.sources import load_tables

    li, orders, cust, nation = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    rev_expr = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev_expr).cast("decimal(38,6)").alias("r"))
    )
    wall = Window.partitionBy()
    return rev.select(
        "nation",
        F.col("r").cast("double").alias("revenue"),
        F.round(
            F.col("r").cast("double") / F.sum("r").over(wall).cast("double"), 6
        ).alias("share"),
        F.rank().over(Window.orderBy(F.desc("r"))).cast("int").alias("rnk"),
    )


@query(
    "sql_gaps_and_islands",
    oracle="""
WITH keep AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 0
),
marked AS (
  SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM keep
)
SELECT MIN(k) AS island_start, MAX(k) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS island_len
FROM marked GROUP BY grp
""",
)
def q_sql_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the classic warehouse pattern: maximal runs
    of consecutive keys after deterministic deletions (every 7th key
    dropped), found with the k − ROW_NUMBER() constant-per-run trick.
    All integers → hash-exact.

    Scale note: the global ROW_NUMBER here IS the single-partition
    window (fine for a keyspace audit, the usual use); the scalable
    form substitutes layout_global_row_number's range-partitioned
    numbering and groups on the same difference — identical islands,
    no one-task sort.
    """
    keep = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 != 0)
        .select(F.col("o_orderkey").alias("k"))
    )
    w = Window.orderBy("k")
    marked = keep.withColumn("grp", F.col("k") - F.row_number().over(w))
    return marked.groupBy("grp").agg(
        F.min("k").alias("island_start"),
        F.max("k").alias("island_end"),
        F.count(F.lit(1)).cast("long").alias("island_len"),
    ).drop("grp")
