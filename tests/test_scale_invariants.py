"""Scale invariants: results must not depend on physical strategy.

At 100 TB, Catalyst picks different join strategies (broadcast vs
sort-merge), AQE re-plans mid-query, and hot keys get salted — none of
which may change answers. These tests pin that invariance locally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from mock_map_reduce_spark import registry
from mock_map_reduce_spark.operators.skew import salted_agg_count
from mock_map_reduce_spark.plans import executed_plan

registry.load_all()


def test_join_results_invariant_under_strategy_change(spark, sf_dir):
    """revenue_by_nation with broadcast disabled (sort-merge everywhere)
    must produce byte-identical rows — the plan a 100 TB cluster would
    pick cannot change the answer."""
    q = registry.QUERIES["revenue_by_nation"]
    with_bcast = {tuple(r) for r in q(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = q(spark, sf_dir)
        plan = executed_plan(df)
        no_bcast = {tuple(r) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # nation is still broadcast by explicit hint (BROADCAST_SAFE), but
    # the stats-based orders/customer broadcasts must be gone
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert with_bcast == no_bcast


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key — the combiner-resistant shape."""
    hot = spark.range(0, 9000).select(F.lit("hot").alias("k"))
    cold = spark.range(0, 1000).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    return hot.unionAll(cold).repartition(16)


def test_salted_agg_correct_under_skew(skewed):
    got = {r.k: r["count"] for r in salted_agg_count(skewed, "k", num_salts=8).collect()}
    assert got["hot"] == 9000
    assert len(got) == 1001
    assert all(v == 1 for k, v in got.items() if k != "hot")


def test_salted_agg_matches_plain_groupby(skewed):
    plain = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r.k: r["count"] for r in salted_agg_count(skewed, "k").collect()}
    assert plain == salted


def test_salted_join_distributes_on_salt(spark, sf_dir):
    """Result-identity is oracle-proven (join_salted_skew); here: with
    broadcast disabled, the salted join's exchange partitions on
    (key, salt) — the hot-key spread — and results still match."""
    from pyspark.sql import functions as F

    from mock_map_reduce_spark.operators.skew import salted_join
    from mock_map_reduce_spark.plans import final_plan
    from mock_map_reduce_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, "c_custkey").select("o_orderkey", "c_mktsegment")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(orders, cust, "c_custkey").select("o_orderkey", "c_mktsegment")
        plan = final_plan(salted)
        assert "hashpartitioning(c_custkey" in plan and "__salt" in plan
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_markov_probabilities_sum_to_one(spark, sf_dir):
    """Per from_state the transition distribution is a probability
    measure (Σp = 1 up to the per-cell rounding)."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    rows = registry.QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    by_state: dict[str, float] = {}
    for r in rows:
        by_state[r.from_state] = by_state.get(r.from_state, 0.0) + r.p
    assert by_state and all(abs(s - 1.0) < 1e-4 for s in by_state.values())


def test_gap_fill_is_dense_per_user(spark, sf_dir):
    """Row count equals Σ(user span days); counts are non-negative and
    per-user days are contiguous (the definition of gap-free)."""
    import datetime

    from mock_map_reduce_spark import registry

    registry.load_all()
    rows = registry.QUERIES["timeseries_gap_fill_daily"](spark, sf_dir).collect()
    by_user: dict[int, list[str]] = {}
    for r in rows:
        assert r.n_events >= 0
        by_user.setdefault(r.user_id, []).append(r.day)
    for days in by_user.values():
        ds = sorted(datetime.date.fromisoformat(d) for d in days)
        assert (ds[-1] - ds[0]).days + 1 == len(ds)  # contiguous, no dup


def test_backlog_is_nonnegative_and_closes_at_zero(spark, sf_dir):
    """The sweep line never goes negative and ends at zero (every
    interval that opens also closes)."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["orders_open_backlog_daily"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0


def test_twap_bounded_by_value_range(spark, sf_dir):
    """A weighted mean lies inside [min, max] of the averaged values."""
    from pyspark.sql import functions as F

    from mock_map_reduce_spark import registry
    from mock_map_reduce_spark.sources import load_table

    registry.load_all()
    twap = {
        r.user_id: r.twap
        for r in registry.QUERIES["events_time_weighted_avg"](spark, sf_dir).collect()
    }
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert all(bounds[u][0] - 1e-6 <= t <= bounds[u][1] + 1e-6 for u, t in twap.items())
