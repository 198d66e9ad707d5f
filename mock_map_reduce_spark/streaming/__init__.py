"""Structured Streaming operators (tumbling/sliding/session windows
with watermarks). Batch twins live in operators/timeseries.py."""

from mock_map_reduce_spark.streaming.rate_source import (
    rate_micro_batch_stream,
    run_until_count,
)
from mock_map_reduce_spark.streaming.windows import (
    read_events_stream,
    cdc_upsert_stream_to_snapshot,
    dedup_stream,
    dedup_stream_bounded,
    interval_join_outer_stream,
    interval_join_stream,
    minute_partials_stream,
    run_to_memory,
    session_stream,
    stream_to_parquet_exactly_once,
    sliding_stream,
    tumbling_stream,
)

__all__ = [
    "rate_micro_batch_stream",
    "run_until_count",
    "read_events_stream",
    "cdc_upsert_stream_to_snapshot",
    "dedup_stream",
    "dedup_stream_bounded",
    "interval_join_outer_stream",
    "interval_join_stream",
    "minute_partials_stream",
    "run_to_memory",
    "session_stream",
    "stream_to_parquet_exactly_once",
    "sliding_stream",
    "tumbling_stream",
]
