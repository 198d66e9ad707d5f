"""SQL-API catalog, part 2 — the remaining TPC-H query shapes, adapted
to the driver schema (no partsupp table, no l_commitdate/receiptdate/
shipmode, synthetic dimension values NATION_n / PROMO / Brand#n).

Each entry runs ONE shared ANSI-SQL string through both engines —
``spark.sql`` and the DuckDB oracle — so parity is structural: any
mismatch is an engine-semantics bug, not a translation bug. Shapes
were chosen to exercise planner features the part-1 module doesn't:

* Q4   EXISTS               -> left-semi join rewrite
* Q20  IN (agg subquery)    -> semi join over a HAVING aggregate
* Q21  EXISTS + NOT EXISTS  -> semi + anti join on the same fact
* Q17  correlated AVG       -> per-key scalar agg join
* Q2   correlated MAX w/ its own join tree
* Q15  CTE + scalar-subquery MAX over the CTE (plan reuse)
* Q22  NOT EXISTS + uncorrelated scalar filter
* Q13  outer-join double aggregation
* Q7/Q8/Q9  multi-join star with disjunctive nation pairs / market
  share ratio / year rollups
* Q12/Q14  conditional aggregation (CASE inside SUM)
* Q16  distinct-agg after anti-ish predicates
* Q18/Q19  HAVING-driven semi join; disjunction-of-conjunctions
  pushdown (each OR-arm prunable at the scan)

Determinism: money aggregates go through exact DECIMAL sums cast to
double at the end (float summation order can't drift — see
operators/similarity and the pricing_summary pattern,
catalog/relational.py); quantities are integral doubles, so raw SUM/
AVG over them is exact in IEEE double in any order. Timestamp output
columns are CAST to DATE (both engines' drivers render dates
identically).

Reference: the reference engine has no SQL surface at all (its query
"language" is the map/reduce UDF contract, slave.cc:77-203); this
module is part of the SURVEY §2.2 general-relational extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mock_map_reduce_spark.functions.materialize import materialize
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import register_views

# Shared money expression: exact decimal revenue.
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))"


def _sql(name: str, sql: str, doc: str):
    """Register a shared-string SQL query: Spark runs the same text DuckDB does."""

    @query(name, oracle=sql)
    def run(spark: SparkSession, sf_dir: str, _sql_text: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql_text)

    run.__doc__ = doc
    run.__name__ = f"q_{name}"
    return run


_sql(
    "sql_q4_order_priority",
    f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    """TPC-H Q4 shape: EXISTS -> left-semi join (lineitem probe side
    never widens the orders row), then a tiny 5-group agg. Adapted:
    'late' lineitem = l_returnflag 'R' (no l_commitdate in schema).""",
)

_sql(
    "sql_q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         {_REV} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    """TPC-H Q7 shape: two broadcast nation dims aliased twice with a
    disjunctive pair predicate, fact-fact join, year rollup.""",
)

_sql(
    "sql_q8_market_share",
    f"""
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN volume ELSE 0 END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         {_REV} AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    """TPC-H Q8 shape: market-share ratio — conditional decimal sum over
    total decimal sum, both exact before the final double division, so
    the ratio is bit-stable across engines.""",
)

_sql(
    "sql_q9_product_type_profit",
    f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         {_REV} AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    """TPC-H Q9 shape (adapted: no partsupp, so profit = discounted
    revenue): LIKE-filtered part dim, 4-way join, (nation, year)
    rollup. The p_name predicate prunes part before the join.""",
)

_sql(
    "sql_q12_priority_lines",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    """TPC-H Q12 shape (adapted: l_linestatus stands in for the absent
    l_shipmode): conditional counts split one pass over the join.
    The conditional sums are CAST to BIGINT because DuckDB widens
    SUM(INTEGER) to HUGEINT (int128), which driver-side Arrow/pandas
    materialization renders as float64 — hash-diverging from Spark's
    bigint even when the values are identical.""",
)

_sql(
    "sql_q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    """TPC-H Q13: left-outer join so customers with no orders survive as
    c_count=0, then a second aggregation over the first's output — the
    histogram-of-group-sizes plan (two exchanges, second one tiny).""",
)

_sql(
    "sql_q14_promo_revenue",
    f"""
SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM({_REV}) AS DOUBLE) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
""",
    """TPC-H Q14: promo share of one month's revenue — single join, two
    exact decimal sums, one double division at the very end.""",
)

_sql(
    "sql_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    """TPC-H Q15: CTE computed once, consumed twice (join probe + scalar
    MAX) — the argmax-by-scalar-subquery plan. The equality compare is
    on the exact DECIMAL, so there is no float-tie hazard.""",
)

_sql(
    "sql_q16_supplier_cnt",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'MEDIUM'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    """TPC-H Q16 shape (adapted: supplier participation comes from
    lineitem, not partsupp): negated predicates + IN-list prune the
    dim, then distinct-count per group (two-phase distinct agg).""",
)

_sql(
    "sql_q17_small_quantity",
    """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#3'
  AND l1.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                       FROM lineitem l2
                       WHERE l2.l_partkey = l1.l_partkey)
""",
    """TPC-H Q17: correlated per-part average — Catalyst rewrites the
    subquery to an aggregate joined back on l_partkey. Quantities are
    integral doubles, so AVG is exact and order-independent.""",
)

_sql(
    "sql_q18_large_volume_customer",
    """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    """TPC-H Q18: IN over a HAVING aggregate -> semi join against a
    pre-aggregated key set, then re-aggregate the surviving orders and
    bounded top-k (TakeOrderedAndProject).""",
)

_sql(
    "sql_q19_discounted_revenue",
    f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    """TPC-H Q19: disjunction of conjunctions — the classic test that
    OR-arms still push partial predicates to both scan sides (brand/
    size prune part, quantity prunes lineitem) before the join.""",
)

_sql(
    "sql_q20_part_promotion",
    """
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#1'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 200
)
ORDER BY s_name
""",
    """TPC-H Q20 shape (adapted: excess-stock test becomes shipped-
    volume-over-threshold, since there is no partsupp.availqty): semi
    join whose build side is itself an aggregate with HAVING.""",
)

_sql(
    "sql_q21_suppliers_kept_waiting",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    """TPC-H Q21 shape (adapted: 'late' = l_returnflag 'R'): the
    sole-blamed-supplier pattern — a semi join AND an anti join against
    the same fact table with inequality correlation, then top-k.""",
)

_sql(
    "sql_q22_global_sales_opportunity",
    """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT c_nationkey % 10 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                     FROM customer
                     WHERE c_acctbal > 0.00)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
    """TPC-H Q22 shape (adapted: cntrycode = nationkey mod 10, no phone
    column; 'no orders' = dormant since 1999 so the anti join selects
    real rows): uncorrelated scalar average as a filter (computed once,
    broadcast) + NOT EXISTS anti join against orders. The average is an
    exact decimal sum over a double count division — bit-stable.""",
)

_sql(
    "sql_q2_min_cost_supplier",
    """
SELECT DISTINCT s_name, n_name, p_partkey, p_brand,
       CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND s_acctbal = (SELECT MAX(s2.s_acctbal)
                   FROM supplier s2
                   JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                   JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                   WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    """TPC-H Q2 shape (adapted: 'supplies the part' = shipped it per
    lineitem; argmax on s_acctbal instead of min ps_supplycost): a
    correlated scalar subquery carrying its OWN join tree, decorrelated
    by Catalyst into a per-part MAX aggregate joined back.""",
)

_sql(
    "sql_q11_important_stock",
    """
WITH stock AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_12'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS stock_value
FROM stock
WHERE val > (SELECT SUM(val) * 0.0005 FROM stock)
ORDER BY stock_value DESC, l_partkey
""",
    """TPC-H Q11 shape (adapted: no partsupp table — 'stock held by a
    nation's suppliers' = lineitem shipped by them, value = exact
    decimal extendedprice x quantity): the signature plan feature is
    the SAME grouped aggregate consumed twice — once as the output
    relation, once inside the uncorrelated scalar-subquery threshold —
    which Spark serves via a reused subplan rather than two scans.
    Decimal sums make the 0.0005 threshold comparison bit-stable in
    both engines.  Completes the 22-query TPC-H shape sweep
    (Q1=pricing_summary, catalog/relational.py).""",
)


_sql(
    "sql_lateral_topk_per_nation",
    """
SELECT n_name, c_name, acctbal
FROM nation, LATERAL (
  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
  FROM customer WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
)
ORDER BY n_name, acctbal DESC
""",
    """LATERAL correlated subquery: per outer nation row, an ordered
    limited inner query — the SQL-standard spelling of per-group
    top-k. Catalyst decorrelates it into a ranked window join; both
    engines parse the same text.""",
)


_RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE walk(p_partkey, anc, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part
  UNION ALL
  SELECT w.p_partkey, CAST(FLOOR(w.anc / 2) AS BIGINT), w.depth + 1
  FROM walk w WHERE w.anc > 1
)
SELECT p_partkey, MAX(depth) AS depth_to_root, MIN(anc) AS root
FROM walk GROUP BY p_partkey
"""


@query("sql_recursive_hierarchy", oracle=_RECURSIVE_HIERARCHY_SQL)
def q_sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): walk a key-halving
    parent hierarchy from every part to the root, reporting depth —
    the org-chart / BOM-explosion shape, spelled identically in both
    engines. Iteration count is log2(max key), so the recursion stays
    shallow (~40 rounds) even at 100 TB key ranges; each round is one
    filter+project over the frontier, and the final roll-up is a
    plain partial-agg'd groupBy. Spark's manual-loop twin for
    arbitrary edge lists is dedup_clusters (operators/dedup.py).

    The walk materializes ~parts x log2(key) rows, which crosses
    Spark's default 1M cteRecursionRowLimit guard at sf1 (found in
    the round-7 sf1 proof run); TOTAL rows are linear in the input,
    so the row guard is raised while the LEVEL limit — the actual
    runaway-recursion guard, ~40 rounds here — stays at its default.

    The raised row guard is SCOPED (round-8 ADVICE fix): the
    recursion is forced eagerly via materialize() inside the
    raise/restore window, so later recursive queries in the same
    shared session keep the default runaway-recursion row guard. The
    pinned result is the final GROUPED roll-up (one row per
    part), not the ~parts x log2(key) walk.

    cut_lineage=True (round-10 perf fix): the lineage-keeping
    persist+count pin re-executed the recursive UnionLoop on the
    post-pin read instead of serving it from the cache (measured
    3.3x: 5.5s vs 1.7s at sf0.1), because a recursive-CTE plan does
    not cache-match its InMemoryRelation. The reliable eager
    checkpoint both forces execution inside the scoped-guard window
    and stores the 1-row-per-part roll-up on the checkpoint FS, so
    the pin stays recoverable on a real cluster (sc.setCheckpointDir
    on HDFS/S3) — see functions/materialize.py.
    """
    register_views(spark, sf_dir)
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(1_000_000_000))
    try:
        return materialize(spark.sql(_RECURSIVE_HIERARCHY_SQL), cut_lineage=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prev)
