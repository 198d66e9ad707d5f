"""Message-bus-style streaming source: Spark's rate-micro-batch.

The reference engine is batch-only over files; a real deployment of
this engine would also ingest from a broker (Kafka). No broker exists
in this sandbox, so the message-bus slot is exercised with Spark's
built-in ``rate-micro-batch`` source — the same unbounded-source code
path as the Kafka reader (continuous micro-batches of fresh rows with
an event-time clock, no end offset), but with DETERMINISTIC content:
batch k holds values [k*rowsPerBatch, (k+1)*rowsPerBatch) and every
row in batch k carries timestamp startTimestamp + k*advanceMillis.
That determinism is what lets an unbounded source sit inside the
repo's exact-hash oracle gate at all.

Swapping in Kafka is a reader-config change only
(``format("kafka").option("subscribe", ...)``) — every transformation
downstream of ``load()`` is source-agnostic.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession


def rate_micro_batch_stream(
    spark: SparkSession,
    rows_per_batch: int = 500,
    num_partitions: int = 4,
    start_timestamp_ms: int = 1_704_067_200_000,  # 2024-01-01T00:00:00Z
    advance_ms_per_batch: int = 1000,
) -> DataFrame:
    """Unbounded deterministic stream: (timestamp, value) rows."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .option("startTimestamp", start_timestamp_ms)
        .option("advanceMillisPerBatch", advance_ms_per_batch)
        .load()
    )


def run_until_count(
    stream_df: DataFrame, name: str, target_rows: int, timeout_s: float = 120.0
) -> None:
    """Drive an UNBOUNDED stream into a memory sink until the sink
    holds ``target_rows`` rows, then stop.

    ``processAllAvailable`` never returns for a rate source (there is
    always another batch), so termination is the consumer's call — the
    same shape as draining a Kafka topic up to a target offset. The
    stream itself must bound its output (e.g. ``filter(value <
    target)``) so overshoot batches can't leak extra rows into the
    sink between the count check and ``stop()``.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # defaultParallelism, not os.cpu_count(): one state store per
    # shuffle partition, so size it to the session's ACTUAL cores
    # (local[$SPARK_GRAFT_CPUS]) — see run_to_memory.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism or 8),
    )
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + timeout_s
            # Poll the query's OWN progress counters (driver-side
            # metadata, no Spark job) instead of count()-ing the
            # memory sink: each count() poll was a full 32-task job,
            # ~15-20 of them per run. numOutputRows is the sink-side
            # (post-filter) row count per micro-batch, summed over
            # recentProgress (default retention 100 batches >> the
            # ~11 batches a bounded drain produces).
            while True:
                done = sum(
                    max(0, int(p.get("sink", {}).get("numOutputRows", 0) or 0))
                    for p in (q.recentProgress or [])
                )
                if done >= target_rows:
                    break
                if time.time() > deadline:
                    raise TimeoutError(
                        f"rate stream {name!r} did not reach {target_rows} rows "
                        f"in {timeout_s}s"
                    )
                time.sleep(0.02)
            # One synchronizing count: progress is reported after the
            # sink commit, so the rows are visible by now — this is a
            # cheap memory-table scan, kept as the explicit contract
            # check that the SINK (not just the counters) holds the
            # target.
            if spark.table(name).count() < target_rows:
                raise AssertionError(
                    f"rate stream {name!r}: sink rows < reported progress"
                )
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
