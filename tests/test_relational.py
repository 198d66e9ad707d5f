"""Unit tests for the relational operator helpers.

Oracle equivalence for the full queries is covered by
tools/check_oracle.py (driver gate); these tests pin the helper
semantics on tiny hand-computed frames.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from mock_map_reduce_spark.operators.relational import (
    running_agg,
    star_join,
    top_k_per_group,
)


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=3, id=1), Row(g="a", v=5, id=2), Row(g="a", v=5, id=3), Row(g="b", v=1, id=4)]
    )
    out = top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], k=2).collect()
    got = {(r.g, r.id, r.rn) for r in out}
    assert got == {("a", 2, 1), ("a", 3, 2), ("b", 4, 1)}  # tie on v=5 broken by id


def test_running_agg(spark):
    df = spark.createDataFrame([Row(g="a", t=1, v=10), Row(g="a", t=2, v=5), Row(g="b", t=1, v=7)])
    out = running_agg(df, ["g"], [F.col("t")], F.col("v"), "run").collect()
    assert {(r.g, r.t, r.run) for r in out} == {("a", 1, 10), ("a", 2, 15), ("b", 1, 7)}


def test_star_join_broadcasts_small_dims(spark):
    fact = spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)])
    dim = spark.createDataFrame([Row(dk=1, name="x"), Row(dk=2, name="y")])
    out = star_join(fact, [(dim, "nation", F.col("k") == F.col("dk"))])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dim flagged BROADCAST_SAFE must broadcast
    assert {(r.k, r.name) for r in out.collect()} == {(1, "x"), (2, "y")}


def test_triangle_count_on_planted_clique(spark, tmp_path):
    """A 4-clique order (4 parts bought together): C(4,2)=6 edges,
    C(4,3)=4 triangles; a disjoint 2-item order adds 1 edge, 0 triangles."""
    import os

    from mock_map_reduce_spark import registry

    registry.load_all()
    rows = [(1, p) for p in (12, 16, 20, 24)] + [(2, 40), (2, 44)]
    li = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    li.coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = registry.QUERIES["graph_triangle_count"](spark, str(tmp_path)).collect()[0]
    assert (out.n_edges, out.n_triangles) == (7, 4)


def test_pagerank_star_graph_center_dominates(spark, tmp_path):
    """Star co-purchase graph (one hub part in every order): the hub
    outranks all leaves and total rank stays ~1."""
    import os

    from mock_map_reduce_spark import registry

    registry.load_all()
    # orders {1..6} each buy part 100 (hub) + one distinct leaf
    rows = []
    for o in range(1, 7):
        rows += [(o, 100), (o, 100 + 4 * o)]
    li = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    li.coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = registry.QUERIES["graph_pagerank"](spark, str(tmp_path)).collect()
    assert out[0].node == 100  # the hub wins
    assert all(out[0].rank > r.rank for r in out[1:])
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-6  # probability mass preserved


def test_pagination_keyset_pushes_cursor_to_scan(spark, sf_dir):
    """Keyset pagination must (a) return exactly the page after the
    cursor in key order, (b) push the cursor predicate into the
    parquet scan (row-group min/max skipping is what keeps page N
    O(page) on a 100 TB table), and (c) plan a bounded TakeOrdered,
    never a global sort."""
    from mock_map_reduce_spark import registry
    from mock_map_reduce_spark.catalog.relational import _PAGE_AFTER, _PAGE_SIZE

    registry.load_all()
    df = registry.QUERIES["pagination_keyset_orders"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == _PAGE_SIZE
    keys = [r.o_orderkey for r in rows]
    assert keys == sorted(keys) and keys[0] > _PAGE_AFTER

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # bounded heap, not Sort+Limit
    assert "GreaterThan(o_orderkey" in plan  # cursor reached PushedFilters
