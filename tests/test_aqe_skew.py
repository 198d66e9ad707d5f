"""AQE skew-join demonstration — Spark's runtime answer to hot keys.

operators/skew.py shows the MANUAL mitigation (salting); this pins the
AUTOMATIC one: with adaptive execution on, a sort-merge join whose
probe side has one dominant key must have its hot partition SPLIT at
runtime (``skew=true`` on the SMJ node, OptimizeSkewedJoin), so one
straggler task becomes many bounded ones — the data-level analog of
the reference's failure rebalancing (master.cc:402-454: work moves off
the slow shard; here the skewed shard itself is subdivided).

The thresholds are tuned down because the planted fact is ~MBs, not
GBs; the RATIOS mirror production (hot partition >> median, advisory
target far below the hot partition's size).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    """Temporarily tune AQE so the skew split fires at test scale."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # both -1: neither the planner nor AQE may turn the SMJ into a
        # broadcast join (skew split only applies to sort-merge)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_sort_merge_join(spark, skew_confs):
    # Fact: key 0 carries 99% of 50k incompressible-padded rows — the
    # planted hot shard. Dim: 1 row per key, not broadcast only
    # because broadcasting is disabled above. No same-key aggregation
    # downstream: a groupBy(k) above the join would REQUIRE hash
    # distribution on k and legally veto the skew split (splitting
    # breaks the required distribution) — that veto is itself Spark
    # behaving correctly, but here the join must be free to split.
    pad = F.md5(F.col("id").cast("string")).alias("pad")
    fact = spark.range(0, 50_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id") % 200).alias("k"),
        pad,
    )
    dim = spark.range(0, 200).select(F.col("id").alias("k"), F.lit(1).alias("w"))

    # pad must survive the projection or column pruning empties the
    # hot partition below the skew threshold
    joined = fact.join(dim, "k").select("k", "pad", "w")
    rows = joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("Initial Plan")
    body = plan[: cut if cut != -1 else len(plan)]

    # correctness under the split: the hot key's row count is exact
    # and every fact row found its dim match exactly once
    assert len(rows) == 50_000
    assert sum(1 for r in rows if r.k == 0) == sum(
        1 for i in range(50_000) if i % 100 < 99
    )
    assert all(r.w == 1 for r in rows)
    # the runtime rewrite actually fired on the sort-merge join
    assert "SortMergeJoin" in body
    assert "skew=true" in body, body[:2000]


def test_skew_split_matches_unskewed_result(spark, skew_confs):
    """The split must be transparent: identical result with AQE skew
    handling on vs off (same tiny join, recomputed with the feature
    disabled)."""
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 50 < 49, F.lit(7)).otherwise(F.col("id") % 100).alias("k")
    )
    dim = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    agg = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("w").alias("sw"))
    )
    with_split = {(r.k, r.n, r.sw) for r in agg.collect()}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        without = {(r.k, r.n, r.sw) for r in agg.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert with_split == without


def test_diag_decision_drives_aqe_split_with_salt_parity(spark, sf_dir, skew_confs):
    """End-to-end: the diag_join_key_skew PROFILE decides the strategy,
    the chosen AQE split actually FIRES on a planted-skew join over the
    real events table, and the result is row-identical to the explicit
    salted_join fallback (and to a plain join with the feature off) —
    the full decision->execution->parity chain, not just config claims.

    (The same chain is re-proven at sf1 by tools/skew_e2e.py; this
    pins it at test scale.)
    """
    from mock_map_reduce_spark.operators.skew import choose_join_strategy, salted_join
    from mock_map_reduce_spark.sources import load_table

    # Plant a hot key: replicate user 0's events 400x (md5 payload so
    # the hot partition's bytes, not just rows, cross the threshold).
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    # pad must differ per REPLICA (md5 over event_id + replica index):
    # 400 identical copies lz4-compress to ~nothing in the shuffle and
    # the hot partition's BYTES (what the skew rule measures) stay
    # under the threshold even though its row count is 25x the rest.
    hot = (
        ev.filter(F.col("user_id") == 0)
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(400)])))
        .withColumn(
            "pad",
            F.md5(F.concat(F.col("event_id").cast("string"), F.col("__r").cast("string"))),
        )
        .drop("__r")
    )
    fact = ev.withColumn("pad", F.md5(F.col("event_id").cast("string"))).unionByName(
        hot
    )
    # Dim side must reach the SMJ as a BARE shuffle read: a distinct()
    # here would put an Aggregate between the shuffle and the join,
    # and OptimizeSkewedJoin only rewrites SMJ(sort(shuffle),
    # sort(shuffle)) — the veto is Spark being correct (splitting
    # would break the aggregate's required distribution), but this
    # test needs the join free to split.
    dim = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("w")
    )

    # 1. Profile the planted fact (same aggregates as diag_join_key_skew).
    prof = fact.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_per_key"),
    ).first()

    # 2. Decision: the dim is tiny, so the honest answer is broadcast —
    # the test forces the shuffle regime (broadcast_row_limit=0) to
    # exercise the skew branch, and the planted ratio must land there.
    ratio = prof.max_per_key * prof.n_keys / prof.n_rows
    assert ratio > 5, f"planting failed: ratio {ratio}"
    decision = choose_join_strategy(
        prof.n_rows, prof.n_keys, prof.max_per_key,
        small_side_rows=dim.count(), broadcast_row_limit=0,
    )
    assert decision in ("aqe_skew_split", "salted")

    # 3. AQE path: the split must actually fire on the hot partition.
    joined = fact.join(dim, "user_id").select("user_id", "event_id", "pad", "w")
    aqe_rows = {(r.user_id, r.event_id, r.pad, r.w) for r in joined.collect()}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    body = plan[: plan.find("Initial Plan")] if "Initial Plan" in plan else plan
    assert "skew=true" in body, body[:2000]

    # 4. Parity: explicit salting and the feature-off plain join agree.
    salted = salted_join(fact, dim, "user_id").select(
        "user_id", "event_id", "pad", "w"
    )
    salted_rows = {(r.user_id, r.event_id, r.pad, r.w) for r in salted.collect()}
    assert salted_rows == aqe_rows
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        plain_rows = {
            (r.user_id, r.event_id, r.pad, r.w) for r in joined.collect()
        }
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert plain_rows == aqe_rows
