"""Time-series operator edge cases (as-of join boundaries, session gaps)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mock_map_reduce_spark.operators import timeseries as ts


def test_asof_join_boundary_semantics(spark):
    """A right row AT the left timestamp is visible (<=); later is not;
    keys with no prior right row get NULL."""
    left = spark.createDataFrame(
        [Row(user_id=1, ts=100, pid=10), Row(user_id=1, ts=50, pid=11), Row(user_id=2, ts=10, pid=12)],
        "user_id long, ts long, pid long",
    )
    right = spark.createDataFrame(
        [Row(user_id=1, ts=100, cid=1), Row(user_id=1, ts=60, cid=2), Row(user_id=1, ts=101, cid=3)],
        "user_id long, ts long, cid long",
    )
    out = ts.asof_join(
        left, right, "user_id", "ts", "ts", {"cid": "last_cid"}, "pid", "cid"
    ).collect()
    assert {r.pid: r.last_cid for r in out} == {10: 1, 11: None, 12: None}


def test_asof_join_ties_take_latest_right(spark):
    """Multiple right rows at the same timestamp: the largest right id
    wins (deterministic order: ts, side, id)."""
    left = spark.createDataFrame([Row(user_id=1, ts=100, pid=1)], "user_id long, ts long, pid long")
    right = spark.createDataFrame(
        [Row(user_id=1, ts=100, cid=7), Row(user_id=1, ts=100, cid=9)],
        "user_id long, ts long, cid long",
    )
    out = ts.asof_join(
        left, right, "user_id", "ts", "ts", {"cid": "last_cid"}, "pid", "cid"
    ).collect()
    assert out[0].last_cid == 9


@pytest.fixture()
def gap_events(spark):
    us = 1_000_000
    rows = [
        # user 1: events at 0s, 10s, gap, 4000s -> 2 sessions
        Row(event_id=1, user_id=1, ts=0),
        Row(event_id=2, user_id=1, ts=10 * us),
        Row(event_id=3, user_id=1, ts=4000 * us),
        # user 2: single event -> 1 session of duration 0
        Row(event_id=4, user_id=2, ts=5 * us),
    ]
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "event_id long, user_id long, ts long").withColumn(
        "ts", F.timestamp_micros("ts")
    )


def test_sessionize_gap_splits(spark, gap_events):
    out = ts.sessionize(gap_events, gap_seconds=1800)
    got = {(r.user_id, r.session_id): (r.n_events, r.duration_s) for r in out.collect()}
    assert got == {(1, 1): (2, 10), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_sessionize_exact_gap_boundary(spark):
    """Gap strictly greater than threshold splits; exactly equal does not."""
    from pyspark.sql import functions as F

    us = 1_000_000
    df = spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts=0), Row(event_id=2, user_id=1, ts=1800 * us),
         Row(event_id=3, user_id=1, ts=(1800 + 1800) * us + 1)],
        "event_id long, user_id long, ts long",
    ).withColumn("ts", F.timestamp_micros("ts"))
    out = ts.sessionize(df, gap_seconds=1800).collect()
    by_session = {r.session_id: r.n_events for r in out}
    # 0 -> 1800s: gap == 1800s exactly -> same session; +1800.000001s -> new
    assert by_session == {1: 2, 2: 1}


def test_funnel_counts_planted(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from mock_map_reduce_spark.operators import timeseries as ts

    def ev(i, u, t, typ):
        return Row(event_id=i, user_id=u, ts=datetime(2024, 1, 1, 0, t), event_type=typ)

    rows = [
        # user 1: full ordered funnel
        ev(1, 1, 0, "view"), ev(2, 1, 5, "click"), ev(3, 1, 9, "purchase"),
        # user 2: click BEFORE view -> stops at view stage
        ev(4, 2, 5, "click"), ev(5, 2, 7, "view"),
        # user 3: view+click, no purchase
        ev(6, 3, 1, "view"), ev(7, 3, 2, "click"),
        # user 4: purchase only -> never enters funnel
        ev(8, 4, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.stage: r.n_users for r in ts.funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohorts_planted(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from mock_map_reduce_spark.operators import timeseries as ts

    def ev(i, u, d, typ):
        return Row(event_id=i, user_id=u, ts=datetime(2024, 1, d, 12), event_type=typ)

    rows = [
        # cohort 2024-01-01: users 1, 2
        ev(1, 1, 1, "signup"), ev(2, 2, 1, "signup"),
        # user 1 active day 2 and 3; user 2 active day 3 only
        ev(3, 1, 2, "view"), ev(4, 1, 3, "click"), ev(5, 2, 3, "view"),
        # user 3 never signs up -> no cohort
        ev(6, 3, 2, "view"),
        # activity beyond the 7-day horizon is dropped
        ev(7, 1, 9, "view"),
    ]
    out = {
        (r.cohort_day, r.offset_days): r.n_active
        for r in ts.retention_cohorts(spark.createDataFrame(rows)).collect()
    }
    assert out == {("2024-01-01", 1): 1, ("2024-01-01", 2): 2}


def test_testdata_has_no_exact_session_boundary_gap():
    """session_windows_builtin's oracle equivalence rests on the testdata
    containing no consecutive per-user gap of exactly 30 minutes (the
    built-in session_window splits at >=, the lag/cumsum oracle at >).
    The driver regenerates testdata between rounds — fail HERE, loudly,
    rather than as an opaque hash mismatch in the correctness gate."""
    import glob
    import os

    import duckdb

    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        path = os.path.join(sf_dir, "events.parquet")
        if not os.path.exists(path):
            continue
        (n,) = duckdb.sql(
            f"""
            SELECT count(*) FROM (
              SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              FROM read_parquet('{path}')
            ) WHERE gap_us = 1800000000
            """
        ).fetchone()
        assert n == 0, f"{path}: {n} exact 30-min gaps — session semantics diverge"


def test_rollup_two_level_matches_direct(spark):
    """The minute->hour merge must equal a direct hourly aggregation
    (count/sum/min/max are re-aggregatable; exact decimals)."""
    from datetime import datetime

    from pyspark.sql import Row

    from mock_map_reduce_spark.operators import timeseries as ts

    rows = [
        Row(event_id=i, user_id=1, ts=datetime(2024, 1, 1, h, m), event_type=t, value=v)
        for i, (h, m, t, v) in enumerate(
            [
                (0, 1, "a", 1.25), (0, 1, "a", 2.50), (0, 59, "a", -3.10),
                (0, 30, "b", 0.01), (1, 0, "a", 7.77), (1, 59, "b", -0.02),
            ]
        )
    ]
    events = spark.createDataFrame(rows)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value, r.min_value, r.max_value)
        for r in ts.rollup_two_level(events, group_cols=["event_type"]).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "a"): (3, 0.65, -3.10, 2.50),
        ("2024-01-01 00:00:00", "b"): (1, 0.01, 0.01, 0.01),
        ("2024-01-01 01:00:00", "a"): (1, 7.77, 7.77, 7.77),
        ("2024-01-01 01:00:00", "b"): (1, -0.02, -0.02, -0.02),
    }


def test_funnel_bounded_window_cuts_late_conversions(spark):
    """A click 2h after the view converts in the unbounded funnel but
    not within a 1h window; an in-window click converts in both."""
    from datetime import datetime

    from pyspark.sql import Row

    from mock_map_reduce_spark.operators import timeseries as ts

    def ev(i, u, h, m, typ):
        return Row(event_id=i, user_id=u, ts=datetime(2024, 1, 1, h, m), event_type=typ)

    events = spark.createDataFrame(
        [
            ev(1, 1, 9, 0, "view"), ev(2, 1, 11, 0, "click"),   # late click
            ev(3, 2, 9, 0, "view"), ev(4, 2, 9, 30, "click"),   # in window
            ev(5, 3, 9, 0, "view"), ev(6, 3, 10, 0, "click"),   # exactly 1h: within
        ]
    )
    unbounded = {r.stage: r.n_users for r in ts.funnel_counts(events, ["view", "click"]).collect()}
    bounded = {
        r.stage: r.n_users
        for r in ts.funnel_counts(events, ["view", "click"], within_s=3600).collect()
    }
    assert unbounded == {"view": 3, "click": 3}
    assert bounded == {"view": 3, "click": 2}


def test_latest_per_user_plan_has_partial_agg(spark, sf_dir):
    """The compaction is max-struct groupBy with map-side combine —
    one exchange carrying one struct per (partition, user)."""
    from mock_map_reduce_spark import registry
    from mock_map_reduce_spark.plans import count_exchanges, executed_plan

    registry.load_all()
    df = registry.QUERIES["events_latest_per_user"](spark, sf_dir)
    assert count_exchanges(df) == 1
    # struct-max plans as SortAggregate; what matters is the map-side
    # partial so the exchange carries one struct per (partition, user)
    assert "partial_max" in executed_plan(df)


def test_dau_wau_stickiness_hand_computed(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from mock_map_reduce_spark import registry

    registry.load_all()
    # build a tiny parquet dir so the catalog query can read it
    import tempfile, os

    rows = [
        Row(event_id=1, user_id=1, ts=datetime(2024, 1, 1, 9), event_type="view", value=1.0, props="{}"),
        Row(event_id=2, user_id=2, ts=datetime(2024, 1, 1, 10), event_type="view", value=1.0, props="{}"),
        Row(event_id=3, user_id=1, ts=datetime(2024, 1, 5, 9), event_type="view", value=1.0, props="{}"),
        Row(event_id=4, user_id=3, ts=datetime(2024, 1, 5, 9), event_type="view", value=1.0, props="{}"),
        # same user twice in one day -> still 1 DAU
        Row(event_id=5, user_id=3, ts=datetime(2024, 1, 5, 11), event_type="click", value=1.0, props="{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows).write.parquet(os.path.join(tmp, "events.parquet"))
        out = {
            r.day: (r.dau, r.wau, r.stickiness)
            for r in registry.QUERIES["events_dau_wau_stickiness"](spark, tmp).collect()
        }
    # Jan 1: dau 2, wau 2; Jan 5: dau 2 (users 1,3), trailing week users {1,2,3} -> wau 3
    assert out == {
        "2024-01-01": (2, 2, 1.0),
        "2024-01-05": (2, 3, round(2 / 3, 6)),
    }
