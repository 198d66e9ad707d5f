"""Z-order layout + mergeable-aggregation tests, pinned against
independent Python models (the oracle gate checks the DuckDB twins;
these check the operators against a second, non-SQL implementation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mock_map_reduce_spark.operators.layout import zorder_key, zorder_layout
from mock_map_reduce_spark.plans import final_plan
from mock_map_reduce_spark.sources import load_table


def _py_morton(x: int, y: int, bits: int = 12) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_model(spark):
    pts = [(0, 0), (1, 0), (0, 1), (4095, 4095), (2730, 1365), (7, 56)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y), (x, y)


def test_zorder_locality_buckets(spark):
    # rows in the same (x, y) 128x128 rectangle share a zbucket prefix:
    # neighbors in both dims stay neighbors in z order
    df = spark.createDataFrame(
        [(i, 100 + dx, 200 + dy) for i, (dx, dy) in enumerate((a, b) for a in range(4) for b in range(4))],
        "o_orderkey long, x long, y long",
    )
    out = zorder_layout(df, F.col("x"), F.col("y")).collect()
    assert len({r.zbucket for r in out}) == 1  # one 2^14 z-range covers the rectangle


def test_zorder_plan_is_scan_project_only(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_orderkey",
        F.pmod("o_custkey", F.lit(4096)).alias("x"),
        F.pmod(
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1992-01-01"))),
            F.lit(4096),
        ).alias("y"),
    )
    plan = final_plan(zorder_layout(d, F.col("x"), F.col("y")))
    # pure map-side layout key: no exchange, no UDF — rides the scan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partial_merge_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    direct = {
        r.l_returnflag: (r.n, float(r.sm))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum(dec).alias("sm"))
        .collect()
    }
    partials = (
        li.groupBy("l_returnflag", F.pmod("l_orderkey", F.lit(16)).alias("shard"))
        .agg(F.count("*").alias("n"), F.sum(dec).alias("sm"))
    )
    merged = {
        r.l_returnflag: (r.n, float(r.sm))
        for r in partials.groupBy("l_returnflag")
        .agg(F.sum("n").alias("n"), F.sum("sm").alias("sm"))
        .collect()
    }
    assert merged == direct  # decimal state merges exactly, any sharding


def _scan_output_rows(df) -> int:
    """Sum of numOutputRows over the plan's leaf scans (post row-group
    pruning — parquet stats skip shows up here, not in the result)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


def test_zorder_write_prunes_row_groups(spark, sf_dir, tmp_path):
    """The payoff test for Z-ordering: written z-sorted, a
    two-dimensional range predicate reads FEWER rows at the scan
    (parquet row-group zone maps stay tight on both columns) than the
    same data written in arrival order — while producing identical
    results. Dimensions are normalized to the data's actual domains so
    both spread over the full 12 interleaved bits at any SF."""
    from mock_map_reduce_spark.operators.layout import zorder_layout
    from mock_map_reduce_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    max_ck = orders.agg(F.max("o_custkey")).first()[0]
    d = orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        (F.col("o_custkey") * 4096 / (max_ck + 1)).cast("long").alias("x"),
        F.pmod(
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))),
            F.lit(4096),
        ).alias("y"),
    )
    z = zorder_layout(d, F.col("x"), F.col("y"), id_col="o_orderkey").join(
        d.select("o_orderkey", "o_custkey", "o_orderdate"), "o_orderkey"
    )
    sel = [
        "o_orderkey", "o_custkey",
        F.to_date("o_orderdate").alias("o_orderday"),  # DATE: stats push down cleanly
    ]
    (z.repartitionByRange(8, "z").sortWithinPartitions("z").select(*sel)
     .write.mode("overwrite").parquet(str(tmp_path / "zsorted")))
    (z.repartition(8).select(*sel)
     .write.mode("overwrite").parquet(str(tmp_path / "random")))

    # ~15% x ~15% predicate rectangle inside the data's real domains
    # (orders span 1995-2001)
    pred = (
        f"o_custkey BETWEEN 1 AND {max(2, int(max_ck * 0.15))} AND "
        "o_orderday >= DATE '1996-01-01' AND o_orderday < DATE '1997-01-01'"
    )
    zs = spark.read.parquet(str(tmp_path / "zsorted")).filter(pred)
    rs = spark.read.parquet(str(tmp_path / "random")).filter(pred)
    assert sorted(map(tuple, zs.collect())) == sorted(map(tuple, rs.collect()))
    assert zs.count() > 0  # the rectangle actually selects rows
    z_rows, r_rows = _scan_output_rows(zs), _scan_output_rows(rs)
    # random layout reads everything; z layout skips row groups whose
    # (custkey, day) zone maps miss the predicate rectangle
    assert r_rows > 0 and z_rows < 0.8 * r_rows, (z_rows, r_rows)
