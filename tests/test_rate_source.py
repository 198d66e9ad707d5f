"""Unbounded rate-micro-batch source: drain-to-offset semantics.

The catalog entry (streaming_rate_source_agg) puts the aggregate in
the oracle gate; these tests pin the drain helper's contract directly:
exact row set, the deterministic batch clock, and the timeout path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mock_map_reduce_spark.streaming.rate_source import (
    rate_micro_batch_stream,
    run_until_count,
)


def test_drain_yields_exact_prefix_and_batch_clock(spark):
    """Draining to offset N with an in-stream bound filter must leave
    EXACTLY values 0..N-1 in the sink (no overshoot rows leak between
    the count check and stop()), each stamped with the batch clock
    second value // rowsPerBatch."""
    target, per_batch = 600, 200
    stream = rate_micro_batch_stream(spark, rows_per_batch=per_batch).filter(
        F.col("value") < target
    )
    run_until_count(stream, "t_rate_exact", target_rows=target)
    rows = (
        spark.table("t_rate_exact")
        .select(
            "value",
            (F.unix_timestamp("timestamp") - F.lit(1_704_067_200)).alias("off"),
        )
        .collect()
    )
    assert sorted(r.value for r in rows) == list(range(target))
    assert all(r.off == r.value // per_batch for r in rows)


def test_drain_times_out_when_target_unreachable(spark):
    """A bound filter below the target can never satisfy the drain —
    the helper must raise TimeoutError (and stop the query) instead of
    spinning forever."""
    stream = rate_micro_batch_stream(spark, rows_per_batch=100).filter(
        F.col("value") < 50
    )
    with pytest.raises(TimeoutError):
        run_until_count(stream, "t_rate_timeout", target_rows=1000, timeout_s=6.0)
    assert len(spark.streams.active) == 0
