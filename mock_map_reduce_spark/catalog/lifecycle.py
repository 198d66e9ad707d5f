"""Dataset-lifecycle catalog: gap-fill, forward-fill, SCD type-2
intervals, snapshot diffing, winsorized statistics.

These are the table-maintenance / time-series-repair shapes a
warehouse layered on the engine needs daily; none exist in the
reference (its surface stops at map/shuffle/reduce — SURVEY §2.2).
Timestamp arithmetic follows catalog/timeseries.py conventions:
CAST-to-microseconds on the DuckDB side, unix_micros on the Spark
side, decimal sums wherever floats would drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.operators import relational as rel
from mock_map_reduce_spark.operators import timeseries as ts
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

_E = "e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events)"


@query(
    "timeseries_gap_fill_daily",
    oracle="""
WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
daily AS (SELECT user_id, day, COUNT(*) AS n_events FROM e GROUP BY 1, 2),
bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
alldays AS (
  SELECT CAST(unnest(generate_series(CAST((SELECT MIN(d0) FROM bounds) AS TIMESTAMP),
                                     CAST((SELECT MAX(d1) FROM bounds) AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
spine AS (SELECT b.user_id, a.day FROM bounds b JOIN alldays a ON a.day BETWEEN b.d0 AND b.d1)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day, COALESCE(d.n_events, 0) AS n_events
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""",
)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily activity: missing days inside each user's
    active span appear with n_events = 0 (sequence-explode spine)."""
    return ts.gap_fill_daily(load_table(spark, sf_dir, "events"))


@query(
    "timeseries_forward_fill",
    oracle=f"""
WITH {_E}
SELECT event_id, user_id, epoch_us(t) AS ts_us,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
         AS last_purchase_value
FROM e
""",
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry each user's most recent purchase value onto every event
    (NULL until the first purchase) — LOCF without a range self-join.
    No arithmetic touches the carried double, so the hash is exact."""
    events = load_table(spark, sf_dir, "events")
    filled = ts.forward_fill(
        events,
        "user_id",
        ["ts", "event_id"],
        F.when(F.col("event_type") == "purchase", F.col("value")),
        "last_purchase_value",
    )
    return filled.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "last_purchase_value",
    )


@query(
    "scd2_user_state",
    oracle=f"""
WITH {_E},
flagged AS (
  SELECT user_id, event_type, t, event_id,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
changes AS (SELECT * FROM flagged WHERE chg = 1),
iv AS (
  SELECT user_id, event_type AS state, epoch_us(t) AS valid_from_us,
         LEAD(epoch_us(t)) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to_us
  FROM changes
)
SELECT user_id, state, valid_from_us,
       COALESCE(valid_to_us, -1) AS valid_to_us,
       CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
FROM iv
""",
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build: collapse each user's consecutive repeats
    of event_type into [valid_from, valid_to) intervals; the open
    interval (valid_to_us = -1, is_current = 1) is the live state."""
    return ts.scd2_intervals(load_table(spark, sf_dir, "events"))


@query(
    "snapshot_diff_orders",
    oracle="""
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 0),
b AS (SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0),
j AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
)
SELECT status, COUNT(*) AS n, MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM j GROUP BY status
""",
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two deterministic snapshots of orders (simulated deletes via
    modulus filters, updates via an exact +100.0 double bump) into
    added/removed/changed/unchanged classes with per-class key bounds."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 11 != 0).select("o_orderkey", "o_totalprice")
    b = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    diff = rel.snapshot_diff(a, b, "o_orderkey", ["o_totalprice"])
    return diff.groupBy("status").agg(
        F.count("*").alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "agg_winsorized_revenue",
    oracle="""
WITH q AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY 1
),
c AS (
  SELECT o.o_orderpriority, GREATEST(q.p05, LEAST(q.p95, o.o_totalprice)) AS w
  FROM orders o JOIN q USING (o_orderpriority)
)
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 2) AS winsorized_avg
FROM c GROUP BY 1
""",
)
def q_winsorized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust group means: clamp o_totalprice to its group's
    exact interpolated [p05, p95], then average via an exact decimal
    sum. The percentile table is group-cardinality-sized, so Spark
    broadcasts it back onto the fact scan (no second fact shuffle).

    100 TB note: swap the exact percentile for approx_percentile
    (mergeable t-digest) on huge groups; the clamp-join is unchanged.
    """
    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    w = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("o_totalprice")))
    return (
        orders.join(F.broadcast(q), "o_orderpriority")
        .select("o_orderpriority", w.cast("decimal(18,6)").alias("w"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("w").cast("double") / F.count("*"), 2).alias("winsorized_avg"),
        )
    )
