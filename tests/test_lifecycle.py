"""Lifecycle operator semantics: gap-fill, forward-fill (LOCF),
SCD type-2 intervals, snapshot diff."""

from __future__ import annotations

import datetime

from pyspark.sql import Row, functions as F

from mock_map_reduce_spark.operators import relational as rel
from mock_map_reduce_spark.operators import timeseries as ts


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour, 0, 0)


def test_gap_fill_daily_fills_interior_days_only(spark):
    """Missing days INSIDE a user's span get n_events = 0; nothing is
    emitted before the first or after the last active day, and other
    users' spans don't bleed in."""
    events = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(1)),
            Row(user_id=1, ts=_ts(1, 6)),
            Row(user_id=1, ts=_ts(4)),
            Row(user_id=2, ts=_ts(10)),
        ],
        "user_id long, ts timestamp",
    )
    out = {(r.user_id, r.day): r.n_events for r in ts.gap_fill_daily(events).collect()}
    assert out == {
        (1, "2024-01-01"): 2,
        (1, "2024-01-02"): 0,
        (1, "2024-01-03"): 0,
        (1, "2024-01-04"): 1,
        (2, "2024-01-10"): 1,
    }


def test_forward_fill_carries_last_non_null_per_key(spark):
    events = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=_ts(1), event_type="view", value=9.0),
            Row(event_id=2, user_id=1, ts=_ts(2), event_type="purchase", value=5.0),
            Row(event_id=3, user_id=1, ts=_ts(3), event_type="view", value=7.0),
            Row(event_id=4, user_id=1, ts=_ts(4), event_type="purchase", value=2.0),
            Row(event_id=5, user_id=2, ts=_ts(1), event_type="view", value=1.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    filled = ts.forward_fill(
        events,
        "user_id",
        ["ts", "event_id"],
        F.when(F.col("event_type") == "purchase", F.col("value")),
        "locf",
    )
    out = {r.event_id: r.locf for r in filled.collect()}
    # NULL until the first purchase; the purchase row sees itself; user 2 never fills.
    assert out == {1: None, 2: 5.0, 3: 5.0, 4: 2.0, 5: None}


def test_scd2_collapses_repeats_and_marks_current(spark):
    events = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=_ts(1), event_type="trial"),
            Row(event_id=2, user_id=1, ts=_ts(2), event_type="trial"),
            Row(event_id=3, user_id=1, ts=_ts(3), event_type="paid"),
            Row(event_id=4, user_id=1, ts=_ts(5), event_type="trial"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    rows = sorted(
        ts.scd2_intervals(events).collect(), key=lambda r: r.valid_from_us
    )
    # Consecutive 'trial' repeats collapse; the state can recur later.
    assert [r.state for r in rows] == ["trial", "paid", "trial"]
    # Intervals chain: each valid_to == next valid_from; last one open.
    assert rows[0].valid_to_us == rows[1].valid_from_us
    assert rows[1].valid_to_us == rows[2].valid_from_us
    assert rows[2].valid_to_us == -1 and rows[2].is_current == 1
    assert [r.is_current for r in rows[:2]] == [0, 0]


def test_scd2_single_exchange(spark):
    """lag-filter and lead share one partitioning: exactly one exchange."""
    events = spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts=_ts(1), event_type="a")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    plan = ts.scd2_intervals(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_snapshot_diff_classifies_all_four_ways(spark):
    a = spark.createDataFrame(
        [Row(k=1, v=10.0), Row(k=2, v=20.0), Row(k=3, v=None), Row(k=4, v=40.0)],
        "k long, v double",
    )
    b = spark.createDataFrame(
        [Row(k=1, v=10.0), Row(k=2, v=21.0), Row(k=3, v=30.0), Row(k=5, v=50.0)],
        "k long, v double",
    )
    out = {r.k: r.status for r in rel.snapshot_diff(a, b, "k", ["v"]).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "changed",  # NULL -> value counts as a change (null-safe compare)
        4: "removed",
        5: "added",
    }


def _write_tbl(spark, tmpdir, name, df):
    import os

    df.coalesce(1).write.parquet(os.path.join(tmpdir, f"{name}.parquet"))


def test_markov_rows_are_probabilities(spark, tmp_path):
    from mock_map_reduce_spark import registry

    registry.load_all()
    QUERIES = registry.QUERIES

    events = spark.createDataFrame(
        [
            (1, 1, _ts(1), "a", None),
            (2, 1, _ts(2), "b", None),
            (3, 1, _ts(3), "a", None),
            (4, 2, _ts(1), "a", None),
            (5, 2, _ts(2), "a", None),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    _write_tbl(spark, str(tmp_path), "events", events)
    rows = QUERIES["events_markov_transitions"](spark, str(tmp_path)).collect()
    # transitions: u1 a->b, b->a; u2 a->a  => from a: {b: .5, a: .5}, from b: {a: 1}
    got = {(r.from_state, r.to_state): (r.c, r.p) for r in rows}
    assert got == {("a", "b"): (1, 0.5), ("a", "a"): (1, 0.5), ("b", "a"): (1, 1.0)}


def test_regression_recovers_perfect_line(spark, tmp_path):
    from mock_map_reduce_spark import registry

    registry.load_all()
    QUERIES = registry.QUERIES

    # y = 2*x + 10 exactly, x = seconds since 2024-01-01
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + datetime.timedelta(seconds=i * 100), "t", float(2 * (i * 100) + 10))
        for i in range(10)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    _write_tbl(spark, str(tmp_path), "events", events)
    out = QUERIES["agg_regression_by_type"](spark, str(tmp_path)).collect()[0]
    assert out.slope == 2.0 and out.intercept == 10.0


def test_ohlc_open_close_argmin_semantics(spark, tmp_path):
    from mock_map_reduce_spark import registry

    registry.load_all()
    events = spark.createDataFrame(
        [
            (1, 1, datetime.datetime(2024, 1, 1, 10, 5), "tick", 5.0),
            (2, 1, datetime.datetime(2024, 1, 1, 10, 20), "tick", 9.0),
            (3, 1, datetime.datetime(2024, 1, 1, 10, 40), "tick", 1.0),
            (4, 1, datetime.datetime(2024, 1, 1, 10, 55), "tick", 7.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    _write_tbl(spark, str(tmp_path), "events", events)
    bars = registry.QUERIES["events_ohlc_hourly"](spark, str(tmp_path)).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b.open, b.high, b.low, b.close, b.n_ticks) == (5.0, 9.0, 1.0, 7.0, 4)


def test_dq_audit_every_detector_fires(spark):
    """Each planted violation class is detected (nonzero) at sf0.001."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    r = registry.QUERIES["dq_orders_constraints"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_null_custkey > 0
    assert r.n_dup_keys > 0
    assert r.n_orphan_custkey > 0
    assert r.n_nonpositive_price > 0
    assert r.n_date_out_of_range > 0


def test_backlog_sweep_line_counts_overlaps(spark, tmp_path):
    """Two overlapping intervals -> n_open reaches 2 only on overlap days."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 1.0, datetime.datetime(2024, 1, 1), "p"),
            (2, 11, "O", 1.0, datetime.datetime(2024, 1, 3), "p"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 4)),
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 5)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    _write_tbl(spark, str(tmp_path), "orders", orders)
    _write_tbl(spark, str(tmp_path), "lineitem", li)
    out = {r.day: r.n_open for r in registry.QUERIES["orders_open_backlog_daily"](spark, str(tmp_path)).collect()}
    # order 1 open Jan1..Jan4, order 2 open Jan3..Jan5
    assert out["2024-01-01"] == 1
    assert out["2024-01-03"] == 2
    assert out["2024-01-05"] == 1  # order 1 closed after Jan4
    assert out["2024-01-06"] == 0


def test_session_enriched_single_exchange(spark):
    """Session assignment + in-session windows share ONE exchange
    (prefix-compatible partition keys)."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    df = registry.QUERIES["events_session_enriched"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    n_shuffle = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    assert n_shuffle == 1, plan[:2000]


def test_capped_running_sum_hits_cap_and_floor(spark):
    """+600 +600 (cap 1000) -1500 (floor 0) +250 -> 600, 1000, 0, 250."""
    from pyspark.sql import functions as F

    from mock_map_reduce_spark.operators import timeseries as ts

    events = spark.createDataFrame(
        [
            (1, 1, _ts(1), 600.0),
            (2, 1, _ts(2), 600.0),
            (3, 1, _ts(3), -1500.0),
            (4, 1, _ts(4), 250.0),
        ],
        "event_id long, user_id long, ts timestamp, delta double",
    )
    out = ts.capped_running_sum(events, F.col("delta"), cap=1000.0)
    got = {r.event_id: r.balance for r in out.collect()}
    assert got == {1: 600.0, 2: 1000.0, 3: 0.0, 4: 250.0}


def test_merge_into_semantics_and_plan(spark):
    """CDC apply on a hand frame: update replaces, delete drops,
    insert adds; and the plan keeps the base un-shuffled — the
    touched-key set must enter as a broadcast LEFT ANTI join."""
    from pyspark.sql import Row

    from mock_map_reduce_spark.operators.relational import merge_into

    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, v="B", op="U"),
            Row(k=3, v=None, op="D"),
            Row(k=9, v="z", op="I"),
            # insert on an EXISTING key: upsert — evicts the base row,
            # never duplicates (MERGE's one-row-per-key invariant)
            Row(k=1, v="A", op="I"),
        ]
    )
    out = merge_into(base, changes, "k")
    assert {(r.k, r.v) for r in out.collect()} == {(1, "A"), (2, "B"), (9, "z")}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan  # base never shuffles for the apply
