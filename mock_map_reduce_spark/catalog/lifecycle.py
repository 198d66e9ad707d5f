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
from pyspark.sql.window import Window

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


@query(
    "dq_orders_constraints",
    oracle="""
WITH dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN NULL
              WHEN o_orderkey % 103 = 0 THEN 10000000 + o_orderkey
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 89 = 0 THEN -1.0 ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 101 = 0 THEN TIMESTAMP '1970-01-01' ELSE o_orderdate END AS o_orderdate
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 211 = 0
),
checks AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_custkey,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive_price,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_date_out_of_range
  FROM dirty
),
dups AS (
  SELECT COUNT(*) AS n_dup_keys FROM (
    SELECT o_orderkey FROM dirty GROUP BY o_orderkey HAVING COUNT(*) > 1
  )
),
orphans AS (
  SELECT COUNT(*) AS n_orphan_custkey FROM dirty d
  WHERE d.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = d.o_custkey)
)
SELECT n_rows, n_null_custkey, n_dup_keys, n_orphan_custkey, n_nonpositive_price, n_date_out_of_range
FROM checks, dups, orphans
""",
)
def q_dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit — the pre-ingest gate every
    production pipeline runs: null keys, duplicate primary keys,
    referential orphans (anti-join vs customer), non-positive
    amounts, out-of-range dates, all counted in ONE pass (plus one
    key-distinct and one anti-join). Violations are planted
    deterministically via modulus rules so the query PROVES each
    detector fires (an all-green audit would prove nothing).

    Scale: the null/range checks are conditional sums riding the
    scan; duplicate detection partial-aggs on the key; the orphan
    check broadcasts the customer key set at dim scale (degrades to
    shuffled left-anti at fact-scale dims).
    """
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    mutated = orders.select(
        k.alias("o_orderkey"),
        F.when(k % 97 == 0, F.lit(None).cast("long"))
        .when(k % 103 == 0, F.lit(10_000_000) + k)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(k % 89 == 0, F.lit(-1.0)).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(k % 101 == 0, F.lit("1970-01-01").cast("timestamp"))
        .otherwise(F.col("o_orderdate"))
        .alias("o_orderdate"),
    )
    dirty = mutated.unionAll(
        orders.filter(k % 211 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        )
    )
    checks = dirty.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("n_null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("n_nonpositive_price"),
        F.sum(
            F.when(F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"), 1).otherwise(0)
        ).alias("n_date_out_of_range"),
    )
    dups = (
        dirty.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n_dup_keys"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        dirty.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("n_orphan_custkey"))
    )
    return checks.crossJoin(dups).crossJoin(orphans).select(
        "n_rows",
        "n_null_custkey",
        "n_dup_keys",
        "n_orphan_custkey",
        "n_nonpositive_price",
        "n_date_out_of_range",
    )


@query(
    "orders_open_backlog_daily",
    oracle="""
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(MAX(l.l_shipdate) AS DATE) AS d1
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
  SELECT d0 AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT d1 + INTERVAL 1 DAY, -1 FROM iv
),
agg AS (SELECT CAST(day AS DATE) AS day, SUM(delta) AS net FROM deltas GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
FROM agg
""",
)
def q_orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog per day — interval counting via the sweep
    line: every [orderdate, last shipdate] interval becomes a +1/−1
    delta pair, deltas aggregate per day, and a running sum over the
    day axis yields the concurrent-open count. The pattern that
    replaces the day×interval range join (quadratic at 100 TB) with
    one fact-side aggregation plus a window over the day-cardinality
    table (thousands of rows regardless of data volume).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("shipped"))
        .select(
            F.to_date("o_orderdate").alias("d0"),
            F.date_add(F.to_date("shipped"), 1).alias("d1"),
        )
    )
    # one explode, not a union of two selects — a union would plan the
    # join+groupBy branch twice
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(F.col("d0").alias("day"), F.lit(1).alias("delta")),
                F.struct(F.col("d1").alias("day"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select("e.day", "e.delta")
    agg = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum("net").over(w).cast("long").alias("n_open"),
    )


@query(
    "union_schema_evolution",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
),
new AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 2 = 1
)
SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS schema_ver FROM old
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 'v2' AS schema_ver FROM new
""",
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old snapshot missing a column unions
    with the new wider schema via ``unionByName(allowMissingColumns)``
    — absent columns surface as NULL, matched BY NAME (positional
    UNION would silently misalign). The read path every long-lived
    dataset needs once columns start being added.
    """
    orders = load_table(spark, sf_dir, "orders")
    old = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("schema_ver", F.lit("v1"))
    )
    new = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .withColumn("schema_ver", F.lit("v2"))
    )
    return old.unionByName(new, allowMissingColumns=True).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority", "schema_ver"
    )


@query(
    "pysource_synthdocs_pruned",
    oracle="""
SELECT i AS doc_id,
       CAST(i // 125 AS INT) AS shard,
       'doc ' || i || ' ' || substring(md5(CAST(i AS VARCHAR)), 1, 12) AS text,
       CAST(length('doc ' || i || ' ' || substring(md5(CAST(i AS VARCHAR)), 1, 12)) AS INT) AS n_chars
FROM range(750, 1000) t(i)
""",
)
def q_pysource_synthdocs_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python data source (Spark 4 ``pyspark.sql.datasource``)
    read THROUGH a pushed-down range predicate: the source plans its
    own splits (8 equal shards) and ``pushFilters`` prunes the shard
    set to the 2 that intersect doc_id >= 750 — tasks for the other 6
    never launch (sources/pysource.py; pruning pinned by
    tests/test_sources.py). The md5 text law makes the synthetic rows
    closed-form for the oracle, so the source's output — not just its
    plan — is hash-checked.
    """
    from mock_map_reduce_spark.sources.pysource import SynthDocsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
    return (
        spark.read.format("synthdocs")
        .option("n_docs", 1000)
        .option("n_shards", 8)
        .load()
        .filter(F.col("doc_id") >= 750)
    )


@query(
    "events_capped_running_sum",
    oracle="""
WITH RECURSIVE o AS (
  SELECT event_id, user_id,
         CASE WHEN event_type = 'purchase' THEN -value ELSE value / 10 END AS delta,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events WHERE value IS NOT NULL
),
bal AS (
  SELECT event_id, user_id, rn, GREATEST(0.0, LEAST(1000.0, delta)) AS balance
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_id, o.user_id, o.rn,
         GREATEST(0.0, LEAST(1000.0, b.balance + o.delta)) AS balance
  FROM o JOIN bal b ON o.user_id = b.user_id AND o.rn = b.rn + 1
)
SELECT event_id, user_id, ROUND(balance, 6) AS balance FROM bal
""",
)
def q_events_capped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance per user (credits accrue at value/10,
    purchases draw down value; balance clamped to [0, 1000]) — the
    classic NON-window-expressible fold: each step depends on the
    clamped previous step, so the oracle needs a recursive CTE while
    the engine side is an Arrow-batched applyInPandas fold (one
    shuffle on the key). Proves the custom-operator seam end-to-end
    with a value-hash, not just plumbing.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    delta = F.when(F.col("event_type") == "purchase", -F.col("value")).otherwise(
        F.col("value") / 10
    )
    out = ts.capped_running_sum(ev, delta, cap=1000.0)
    return out.select(
        "event_id", "user_id", F.round("balance", 6).alias("balance")
    )


@query(
    "events_ewma",
    oracle="""
WITH RECURSIVE o AS (
  SELECT event_id, user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_id, user_id, rn, value AS ewma FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_id, o.user_id, o.rn, 0.2 * o.value + 0.8 * s.ewma
  FROM o JOIN s ON o.user_id = s.user_id AND o.rn = s.rn + 1
)
SELECT event_id, user_id, ROUND(ewma, 6) AS ewma FROM s
""",
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing (alpha = 0.2) of each user's value series — the
    second member of the clamped-fold operator class (recurrence on
    the previous OUTPUT; recursive-CTE oracle, applyInPandas engine
    side; see events_capped_running_sum). The smoothing everybody
    reaches for before anomaly thresholds and trend charts.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = ts.ewma(ev, "value", alpha=0.2)
    return out.select("event_id", "user_id", F.round("ewma", 6).alias("ewma"))


@query(
    "scd2_point_in_time",
    oracle=f"""
WITH {_E},
s AS (SELECT user_id, event_type, t, event_id FROM e WHERE event_type IN ('signup', 'error')),
p AS (SELECT user_id, event_id, t FROM e WHERE event_type = 'purchase')
SELECT p.user_id, p.event_id, epoch_us(p.t) AS t_us,
       (SELECT s.event_type FROM s
         WHERE s.user_id = p.user_id AND s.t <= p.t
         ORDER BY s.t DESC, s.event_id DESC LIMIT 1) AS status
FROM p
""",
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) dimension lookup: each purchase gets
    the account status — the latest signup/error state — in effect at
    purchase time; purchases before any status are NULL.

    The read path for the scd2_user_state dimension, implemented as
    union + one LOCF window per key instead of a non-equi interval
    join (operators/timeseries.point_in_time_state). The oracle is the
    independent spec — a correlated latest-state-at-or-before-t
    subquery — so the window mechanics are fully checked.
    """
    events = load_table(spark, sf_dir, "events")
    status = events.filter(F.col("event_type").isin("signup", "error"))
    purchases = events.filter(F.col("event_type") == "purchase")
    return ts.point_in_time_state(status, purchases)


@query(
    "files_manifest_orders",
    oracle="""
SELECT 'orders.parquet' AS file_name,
       COUNT(*) AS n_rows,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
""",
)
def q_files_manifest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map manifest build from the hidden ``_metadata`` column:
    per source file, row count + key min/max — the data-skipping
    statistics a table format (or a poor man's manifest) maintains so
    point/range reads prune files without opening them. At 100 TB this
    runs per-partition after every compaction; with one test file the
    manifest is one row, but the plan (metadata-column scan + groupBy
    file) is the real one. The oracle states the manifest in closed
    form (the testdata layout has exactly one known file per table),
    so a wrong or missing _metadata read fails the hash.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(F.col("_metadata.file_name").alias("file_name"), "o_orderkey")
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@query(
    "serde_roundtrip_orders",
    oracle="""
SELECT o_orderkey, o_orderstatus AS csv_status, o_orderpriority AS xml_priority,
       CAST(o_custkey AS BIGINT) AS json_custkey
FROM orders WHERE o_orderkey % 97 = 0
""",
)
def q_serde_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-serde round trips through THREE formats in one plan: each
    order serializes to a CSV line, an XML snippet, and a JSON doc,
    then re-parses with from_csv / from_xml / get_json_object. The
    oracle is the identity on the pristine columns — any quoting,
    escaping, schema-inference, or type-coercion defect in a parser
    surfaces as a value mismatch. (The columnar sinks are exercised by
    tests/test_sinks.py; this covers the row-level serde functions a
    pipeline uses for message buses and log lines.)
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    staged = o.select(
        "o_orderkey",
        F.format_string("%d,%s", "o_orderkey", "o_orderstatus").alias("csv_line"),
        F.format_string(
            "<o><k>%d</k><p>%s</p></o>", "o_orderkey", "o_orderpriority"
        ).alias("xml_doc"),
        F.to_json(F.struct("o_custkey")).alias("json_doc"),
    )
    return staged.select(
        "o_orderkey",
        F.from_csv("csv_line", "k BIGINT, s STRING").getField("s").alias("csv_status"),
        F.from_xml("xml_doc", "k BIGINT, p STRING").getField("p").alias("xml_priority"),
        F.get_json_object("json_doc", "$.o_custkey").cast("long").alias("json_custkey"),
    )


@query(
    "cdc_merge_orders",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice, 'U' AS op
  FROM orders WHERE o_orderkey % 17 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D' AS op
  FROM orders WHERE o_orderkey % 17 = 1
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, 'I' AS o_orderstatus, o_totalprice, 'I' AS op
  FROM orders WHERE o_orderkey % 17 = 2
),
kept AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes WHERE op IN ('U', 'I', 'D'))
)
SELECT * FROM kept
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM changes WHERE op IN ('U', 'I')
""",
)
def q_cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO: apply a deterministic CDC feed (updates for keys
    %17==0, deletes for %17==1, inserts keyed +1e8 for %17==2) to the
    orders snapshot via the copy-on-write ``merge_into`` operator.

    The update's price bump is +1.0 — exact in binary doubles, so the
    DuckDB twin cannot drift. Scale notes live on merge_into
    (operators/relational.py): the base scan never shuffles; only the
    feed's key column broadcasts into the anti join.
    """
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    base = orders.select(*cols)
    k = F.col("o_orderkey")
    updates = (
        orders.filter(k % 17 == 0)
        .select(
            k.alias("o_orderkey"),
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
            F.lit("U").alias("op"),
        )
    )
    deletes = orders.filter(k % 17 == 1).select(*cols, F.lit("D").alias("op"))
    inserts = (
        orders.filter(k % 17 == 2)
        .select(
            (k + F.lit(100000000)).alias("o_orderkey"),
            "o_custkey",
            F.lit("I").alias("o_orderstatus"),
            "o_totalprice",
            F.lit("I").alias("op"),
        )
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return rel.merge_into(base, changes, "o_orderkey")


@query(
    "wap_read_published",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_custs
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def q_wap_read_published(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish + time travel with a driver-checkable READ
    path (sources/tables.write_audit_publish / read_published): publish
    generation 0 (the 'F'-status rollup), then generation 1 (the
    'O'-status rollup — where _CURRENT now points), then time-travel
    back to the PINNED generation 0. The oracle is the gen-0 rollup,
    so a reader that followed _CURRENT instead of the requested
    generation — or a publish that mutated a prior generation — hash-
    mismatches. Both publishes run the audit gate against the STAGED
    parquet (nonempty + no null keys), exercising the full WAP cycle
    in one query. Scale: publish is one metadata flip regardless of
    data size; generations are immutable so the pinned read is stable.
    """
    from mock_map_reduce_spark.functions.scratch import scratch_dir
    from mock_map_reduce_spark.sources import tables as tb

    orders = load_table(spark, sf_dir, "orders")

    def rollup(status: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.countDistinct("o_custkey").alias("n_custs"),
            )
        )

    audits = [
        ("nonempty", lambda d: d.count() > 0),
        (
            "no_null_keys",
            lambda d: d.filter(F.col("o_orderpriority").isNull()).count() == 0,
        ),
    ]
    table_dir = scratch_dir("wap_orders")
    tb.write_audit_publish(rollup("F"), table_dir, audits)  # gen 0 — pinned
    tb.write_audit_publish(rollup("O"), table_dir, audits)  # gen 1 — _CURRENT
    return tb.read_published(spark, table_dir, gen=0)


@query(
    "serde_xml_file_roundtrip",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 101 = 0
""",
)
def q_serde_xml_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-level XML interchange round trip (Spark 4's native `xml`
    source — sources/tables.read_xml/write_xml): a deterministic
    orders subset writes to element-per-row XML and reads back with an
    explicit schema; the oracle is the identity on the pristine
    columns, so any writer escaping, reader coercion, or
    double-formatting defect fails the hash (Java's shortest-roundtrip
    double printing must survive the text trip bit-for-bit).
    serde_roundtrip_orders covers the ROW-level from_xml function;
    this covers the format as a source/sink."""
    import os

    from mock_map_reduce_spark.functions.scratch import scratch_dir
    from mock_map_reduce_spark.sources import tables as tb

    sub = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    d = os.path.join(scratch_dir("xml_rt"), "orders_xml")
    tb.write_xml(sub, d, row_tag="order")
    return tb.read_xml(
        spark,
        d,
        row_tag="order",
        schema="o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
