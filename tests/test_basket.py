"""Market-basket association rules: planted-basket semantics."""

from __future__ import annotations

import pytest

from mock_map_reduce_spark import registry

registry.load_all()


def test_basket_lift_definitions(spark, sf_dir):
    rows = registry.QUERIES["basket_brand_lift"](spark, sf_dir).collect()
    assert rows, "sf data must yield at least one frequent pair"
    n_orders = None
    for r in rows:
        # definitions hold exactly on the emitted integers
        assert r.n_ab >= 5
        assert r.brand_a < r.brand_b
        assert r.confidence == pytest.approx(round(r.n_ab / r.n_a, 6), abs=1e-9)
        # lift = confidence / (n_b / N); recover N from support
        n = round(r.n_ab / r.support)
        if n_orders is None:
            n_orders = n
        assert n == n_orders  # every row agrees on the basket count
        assert r.lift == pytest.approx(round(r.n_ab * n / (r.n_a * r.n_b), 6), abs=1e-6)


def test_basket_pairs_are_within_order(spark):
    """Planted baskets: pairs only form inside one order."""
    from pyspark.sql import Row, functions as F

    li = spark.createDataFrame(
        [
            Row(l_orderkey=1, l_partkey=1),
            Row(l_orderkey=1, l_partkey=2),
            Row(l_orderkey=2, l_partkey=1),
            Row(l_orderkey=2, l_partkey=3),
        ]
    )
    part = spark.createDataFrame(
        [Row(p_partkey=1, p_brand="A"), Row(p_partkey=2, p_brand="B"), Row(p_partkey=3, p_brand="C")]
    )
    items = (
        li.join(part, li.l_partkey == part.p_partkey).select("l_orderkey", "p_brand").distinct()
    )
    a = items.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = items.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pairs = {
        (r.brand_a, r.brand_b)
        for r in a.join(b, "l_orderkey").filter(F.col("brand_a") < F.col("brand_b")).collect()
    }
    # (A,B) from order 1, (A,C) from order 2 — never (B,C) across orders
    assert pairs == {("A", "B"), ("A", "C")}
