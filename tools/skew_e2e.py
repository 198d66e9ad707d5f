"""End-to-end skew-mitigation proof at scale (default sf1).

The chain tests/test_aqe_skew.py pins at test scale, re-proven on an
order-of-magnitude-larger events table:

  1. PROFILE a planted-hot-key join input with the same aggregates as
     the ``diag_join_key_skew`` catalog query;
  2. DECIDE via operators/skew.choose_join_strategy (the profile must
     land in the skew regime once broadcast is off the table);
  3. EXECUTE the join under AQE and verify OptimizeSkewedJoin actually
     split the hot partition (``skew=true`` on the SMJ node);
  4. PARITY: the AQE-split join, the explicit ``salted_join`` fallback,
     and a skew-split-disabled plain join must agree row-for-row
     (compared as sorted-hash checksums — no driver-side row sets at
     this scale beyond the checksum reduction).

Usage:  python tools/skew_e2e.py [sf_dir]   (default /tmp/mmr_testdata/sf1)
Prints one JSON line; exit 0 iff the split fired and parity held.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = 12000


def checksum(df) -> tuple[int, str]:
    """(row_count, order-insensitive checksum) of a frame: the SUM of
    each row's 48-bit md5 prefix (decimal-cast, so the sum is exact),
    md5'd together with the row count. Addition is commutative, so
    the value is row-order-independent; it is NOT an xor construction."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.md5(
            F.concat_ws(
                "|",
                F.sum(F.conv(F.substring(F.md5(F.concat_ws("\x1f", *df.columns)), 1, 12), 16, 10).cast("decimal(38,0)")).cast("string"),
                F.count(F.lit(1)).cast("string"),
            )
        ).alias("h"),
    ).first()
    return int(row["n"]), row["h"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmr_testdata/sf1"

    from pyspark.sql import functions as F

    from mock_map_reduce_spark import get_spark
    from mock_map_reduce_spark.operators.skew import choose_join_strategy, salted_join
    from mock_map_reduce_spark.sources import load_table

    spark = get_spark("skew-e2e")
    # Same regime the pytest uses: thresholds scaled for the planted
    # fact (~100 MB hot partition at sf1), broadcast disabled so the
    # join MUST shuffle, coalesce off so partition counts stay fixed.
    for k, v in {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }.items():
        spark.conf.set(k, v)

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    hot = (
        ev.filter(F.col("user_id") == 0)
        .withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        .withColumn(
            "pad",
            F.md5(F.concat(F.col("event_id").cast("string"), F.col("__r").cast("string"))),
        )
        .drop("__r")
    )
    fact = ev.withColumn("pad", F.md5(F.col("event_id").cast("string"))).unionByName(hot)
    dim = spark.range(0, 100_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("w")
    )

    prof = (
        fact.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_per_key"),
        )
        .first()
    )
    skew_ratio = prof["max_per_key"] * prof["n_keys"] / prof["n_rows"]
    decision = choose_join_strategy(
        prof["n_rows"], prof["n_keys"], prof["max_per_key"],
        small_side_rows=100_000, broadcast_row_limit=0,
    )

    joined = fact.join(dim, "user_id").select("user_id", "event_id", "pad", "w")
    # Force JOINED'S OWN queryExecution (count()/agg() would wrap it in
    # a new plan whose AQE run leaves this one unexecuted and
    # marker-less): toRdd() materializes exactly this plan, and a
    # JVM-side count avoids shipping ~1M rows to Python.
    t0 = time.time()
    jqe = joined._jdf.queryExecution()
    jqe.toRdd().count()
    t_aqe = round(time.time() - t0, 2)
    plan = jqe.executedPlan().toString()
    body = plan[: plan.find("Initial Plan")] if "Initial Plan" in plan else plan
    split_fired = "skew=true" in body
    n_aqe, h_aqe = checksum(joined)

    t0 = time.time()
    n_salt, h_salt = checksum(
        salted_join(fact, dim, "user_id").select("user_id", "event_id", "pad", "w")
    )
    t_salt = round(time.time() - t0, 2)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t0 = time.time()
    n_plain, h_plain = checksum(joined)
    t_plain = round(time.time() - t0, 2)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    ok = bool(split_fired and (n_aqe, h_aqe) == (n_salt, h_salt) == (n_plain, h_plain))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_rows": prof["n_rows"],
                "n_keys": prof["n_keys"],
                "max_per_key": prof["max_per_key"],
                "skew_ratio": round(skew_ratio, 2),
                "decision": decision,
                "skew_split_fired": split_fired,
                "joined_rows": n_aqe,
                "parity": (n_aqe, h_aqe) == (n_salt, h_salt) == (n_plain, h_plain),
                "sec_aqe_split": t_aqe,
                "sec_salted": t_salt,
                "sec_plain_no_split": t_plain,
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
