"""Structured Streaming tests (SURVEY §5.4: pytest-only — the driver's
oracle can't run streaming queries; batch twins in catalog/timeseries
are the oracle-checked forms).

Each test drives the stream over all available input via a memory
sink, then compares against the batch computation on the same data —
stream/batch equivalence is the correctness contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mock_map_reduce_spark.operators import timeseries as bt
from mock_map_reduce_spark.sources import load_table
from mock_map_reduce_spark.streaming import windows as sw


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_tumbling_stream_matches_batch(spark, sf_dir, batch_events):
    stream = sw.tumbling_stream(sw.read_events_stream(spark, sf_dir), "1 hour")
    sw.run_to_memory(stream, "tumbling_out")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in bt.tumbling_agg(batch_events, "1 hour", group_cols=["event_type"])
        .withColumn("window_start", F.to_timestamp("window_start"))
        .collect()
    }
    assert len(got) > 0
    assert got == expected


def test_sliding_stream_matches_batch(spark, sf_dir, batch_events):
    stream = sw.sliding_stream(sw.read_events_stream(spark, sf_dir))
    sw.run_to_memory(stream, "sliding_out")
    got = {r.window_start: r.n_events for r in spark.sql("SELECT * FROM sliding_out").collect()}
    expected = {
        r.window_start: r.n_events
        for r in bt.sliding_agg(batch_events)
        .withColumn("window_start", F.to_timestamp("window_start"))
        .collect()
    }
    assert got == expected
    # each event lands in exactly 2 sliding windows
    assert sum(got.values()) == 2 * batch_events.count()


def test_session_stream_event_conservation(spark, sf_dir, batch_events):
    stream = sw.session_stream(sw.read_events_stream(spark, sf_dir), gap="30 minutes")
    sw.run_to_memory(stream, "session_out")
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert sum(r.n_events for r in rows) == batch_events.count()
    # session count per user matches the batch gap-sessionizer
    stream_sessions = {}
    for r in rows:
        stream_sessions[r.user_id] = stream_sessions.get(r.user_id, 0) + 1
    batch_sessions = {
        r.user_id: r.n_sessions
        for r in bt.sessionize(batch_events, 1800)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .collect()
    }
    assert stream_sessions == batch_sessions


def test_stream_dedup_across_batches(spark, tmp_path):
    """Duplicate event_ids spanning micro-batches are emitted once."""
    import pandas as pd
    from pyspark.sql import functions as F

    us = 1_000_000_000  # ns
    pd.DataFrame(
        {"event_id": [1, 2], "ts": [1 * us, 2 * us], "user_id": [1, 1],
         "event_type": ["a", "a"], "value": [1.0, 2.0], "props": ["{}", "{}"]}
    ).to_parquet(tmp_path / "b1.parquet")
    pd.DataFrame(
        {"event_id": [2, 3], "ts": [2 * us, 3 * us], "user_id": [1, 1],
         "event_type": ["a", "a"], "value": [2.0, 3.0], "props": ["{}", "{}"]}
    ).to_parquet(tmp_path / "b2.parquet")
    raw = (
        spark.readStream.schema(sw.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(tmp_path))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = (
        sw.dedup_stream(raw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_stream_out").collect())
    assert ids == [1, 2, 3]  # event 2 appeared in both batches, emitted once


def test_stream_dedup_bounded_expires_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: dupes near the first occurrence
    collapse; after the watermark (advanced by OTHER keys) passes the
    stored key's expiry, the same key is re-emitted — bounded state."""
    import pandas as pd
    from pyspark.sql import functions as F

    ns_h = 3_600_000_000_000  # 1 hour in ns

    def write(name, rows):  # rows: (event_id, hour)
        pd.DataFrame(
            {"event_id": [i for i, _ in rows], "ts": [h * ns_h for _, h in rows],
             "user_id": [1] * len(rows), "event_type": ["a"] * len(rows),
             "value": [1.0] * len(rows), "props": ["{}"] * len(rows)}
        ).to_parquet(tmp_path / name)

    import os
    import time

    write("b1.parquet", [(7, 1), (7, 2)])  # key 7 emitted once (t=2h dup dropped)
    write("b2.parquet", [(8, 10)])         # other key advances the watermark to 8h
    write("b3.parquet", [(8, 11)])         # eviction runs at batch end: key 7 purged here
    write("b4.parquet", [(7, 20)])         # key 7 re-emitted after expiry
    # the file source orders micro-batches by mod time; force b1<b2<b3<b4
    now = time.time()
    for i, f in enumerate(["b1.parquet", "b2.parquet", "b3.parquet", "b4.parquet"]):
        os.utime(tmp_path / f, (now + i * 10, now + i * 10))
    raw = (
        spark.readStream.schema(sw.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(tmp_path))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = (
        sw.dedup_stream_bounded(raw, watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_bounded_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = sorted(
        (r.event_id, r.ts.hour)
        for r in spark.sql("SELECT event_id, ts FROM dedup_bounded_out").collect()
    )
    assert (7, 1) in out and (8, 10) in out and (8, 11) not in out
    assert (7, 2) not in out            # near-dup collapsed
    assert (7, 20) in out               # re-emitted after state expiry


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    """foreachBatch sink: per-epoch dynamic-overwrite partitions hold
    exactly the input rows; a re-run of the same epoch write is
    idempotent (overwrites its own partition, total unchanged)."""
    import pandas as pd
    from pyspark.sql import functions as F

    ns_h = 3_600_000_000_000
    src = tmp_path / "src"
    src.mkdir()
    for i, name in enumerate(["s1.parquet", "s2.parquet"]):
        pd.DataFrame(
            {"event_id": [i * 10 + 1, i * 10 + 2], "ts": [(i + 1) * ns_h] * 2,
             "user_id": [1, 2], "event_type": ["a", "b"],
             "value": [1.0, 2.0], "props": ["{}", "{}"]}
        ).to_parquet(src / name)
    raw = (
        spark.readStream.schema(sw.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = str(tmp_path / "sink")
    q = sw.stream_to_parquet_exactly_once(
        raw.select("event_id", "user_id"), out, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    assert sorted(r.event_id for r in written.collect()) == [1, 2, 11, 12]
    assert written.select("__epoch").distinct().count() >= 2  # one partition per batch
    # idempotent replay: rewriting epoch 0's batch changes nothing overall
    b0 = written.filter("__epoch = 0").drop("__epoch")
    (
        b0.withColumn("__epoch", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch")
        .parquet(out)
    )
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 11, 12]


def test_stream_recovers_from_checkpoint(spark, tmp_path):
    """Kill-and-restart: a new query on the SAME checkpoint resumes
    from the recorded offset — earlier batches are not reprocessed,
    later files are picked up, every event lands exactly once. This is
    the streaming face of the reference's failure re-exec story (M3/
    M4): state lives in the checkpoint, not the query object."""
    import pandas as pd
    from pyspark.sql import functions as F

    ns_h = 3_600_000_000_000
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def write_src(name, ids, hour):
        pd.DataFrame(
            {"event_id": ids, "ts": [hour * ns_h] * len(ids),
             "user_id": [1] * len(ids), "event_type": ["a"] * len(ids),
             "value": [1.0] * len(ids), "props": ["{}"] * len(ids)}
        ).to_parquet(src / name)

    def run_once():
        raw = (
            spark.readStream.schema(sw.EVENTS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        q = sw.stream_to_parquet_exactly_once(raw.select("event_id", "user_id"), out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_src("a.parquet", [1, 2], 1)
    run_once()                    # first incarnation processes file a
    first = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]

    write_src("b.parquet", [3, 4], 2)
    run_once()                    # restarted incarnation, same checkpoint
    rows = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3, 4]  # no loss, no dupes
    # the restart resumed at the next epoch rather than replaying epoch 0
    epochs = {r.event_id: r["__epoch"] for r in rows}
    assert epochs[1] == epochs[2] < epochs[3] == epochs[4]


def test_streaming_minute_partials_merge_exactly(spark, sf_dir):
    """The streaming continuous-aggregate handoff: per-minute streamed
    partials merged to hourly must equal the direct batch hourly
    rollup (same mergeable-state algebra as rollup_two_level)."""
    from pyspark.sql import functions as F

    from mock_map_reduce_spark.operators import timeseries as ts
    from mock_map_reduce_spark.streaming import (
        minute_partials_stream,
        read_events_stream,
        run_to_memory,
    )

    run_to_memory(
        minute_partials_stream(read_events_stream(spark, sf_dir)),
        "t_stream_rollup_partials",
    )
    merged = (
        spark.table("t_stream_rollup_partials")
        .groupBy(F.window("window_start", "1 hour").alias("hw"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("total_value"),
            F.min("mn").cast("double").alias("min_value"),
            F.max("mx").cast("double").alias("max_value"),
        )
        .select(
            F.date_format("hw.start", ts.TS_FMT).alias("window_start"),
            "event_type", "n_events", "total_value", "min_value", "max_value",
        )
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = ts.rollup_two_level(events, group_cols=["event_type"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cdc_upsert_out_of_order_batches(spark, tmp_path):
    """Three single-file micro-batches arriving in ARBITRARY order must
    produce the same snapshot as the batch answer: the version compare
    (ts, event_id), not arrival order, decides the winner — including
    a tombstone that must suppress an older update landing later."""
    import os

    from pyspark.sql import Row

    from mock_map_reduce_spark.streaming import cdc_upsert_stream_to_snapshot

    def ev(i, u, ts, et, v):
        return Row(event_id=i, user_id=u, ts=ts, event_type=et, value=v)

    import datetime as dt

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    batches = [
        # file 1: user 1 old value; user 2 DELETED at minute 5
        [ev(1, 1, t(1), "click", 10.0), ev(2, 2, t(5), "error", 0.0)],
        # file 2: user 1 newer value; user 2 pre-delete update (older
        # version than the tombstone -> must NOT resurrect)
        [ev(3, 1, t(2), "view", 20.0), ev(4, 2, t(4), "click", 99.0)],
        # file 3: user 3 appears
        [ev(5, 3, t(3), "purchase", 7.0)],
    ]
    src = os.path.join(str(tmp_path), "stream_src")
    os.makedirs(src)
    schema = (
        "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    # each batch must be a plain FILE directly under src (the file
    # stream source does not recurse into per-write subdirectories)
    import glob as _glob
    import shutil

    for i, rows in enumerate(batches):
        d = os.path.join(str(tmp_path), f"w{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        part = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"f{i}.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    snap = cdc_upsert_stream_to_snapshot(
        stream, workdir=os.path.join(str(tmp_path), "work")
    )
    live = {(r.user_id, r.event_id, r.value) for r in snap.filter("op != 'D'").collect()}
    assert live == {(1, 3, 20.0), (3, 5, 7.0)}  # user 2 stays deleted
    dead = {r.user_id for r in snap.filter("op = 'D'").collect()}
    assert dead == {2}  # tombstone retained, not resurrected by event 4


def test_cdc_upsert_recovers_snapshot_across_restart(spark, tmp_path):
    """Process restart from the same checkpoint: committed offsets are
    NOT replayed, so the snapshot pointer must recover to the newest
    published generation or the first post-restart batch silently
    drops all earlier state. Run 1 applies user 1; run 2 (fresh call,
    same workdir+checkpoint) applies only user 2 — the final snapshot
    must still carry user 1."""
    import datetime as dt
    import glob as _glob
    import os
    import shutil

    from pyspark.sql import Row

    from mock_map_reduce_spark.streaming import cdc_upsert_stream_to_snapshot

    schema = (
        "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    src = os.path.join(str(tmp_path), "stream_src")
    os.makedirs(src)
    work = os.path.join(str(tmp_path), "work")

    def land(i, rows):
        d = os.path.join(str(tmp_path), f"w{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        part = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"f{i}.parquet"))

    def stream():
        return spark.readStream.schema(schema).parquet(src)

    t0 = dt.datetime(2026, 1, 1)
    land(0, [Row(event_id=1, user_id=1, ts=t0, event_type="click", value=10.0)])
    snap1 = cdc_upsert_stream_to_snapshot(stream(), workdir=work)
    assert {r.user_id for r in snap1.collect()} == {1}

    # "restart": a fresh call reuses the same checkpoint, so only the
    # new file is processed — user 1 exists ONLY in the old snapshot.
    land(1, [Row(event_id=2, user_id=2, ts=t0, event_type="click", value=20.0)])
    snap2 = cdc_upsert_stream_to_snapshot(stream(), workdir=work)
    got = {(r.user_id, r.value) for r in snap2.collect()}
    assert got == {(1, 10.0), (2, 20.0)}

    # A crash mid-write leaves a PARTIAL generation dir (no _SUCCESS).
    # Recovery must skip it and resume from the newest COMMITTED
    # generation, or the next batch merges onto partial state and
    # silently drops keys.
    gens = sorted(
        int(n.rsplit("_", 1)[1])
        for n in os.listdir(work)
        if n.startswith("snapshot_gen_")
    )
    partial = os.path.join(work, f"snapshot_gen_{gens[-1] + 1}")
    os.makedirs(partial)  # torn write: dir exists, no _SUCCESS, no data
    land(2, [Row(event_id=3, user_id=3, ts=t0, event_type="click", value=30.0)])
    snap3 = cdc_upsert_stream_to_snapshot(stream(), workdir=work)
    got = {(r.user_id, r.value) for r in snap3.collect()}
    assert got == {(1, 10.0), (2, 20.0), (3, 30.0)}


def test_interval_join_outer_null_emission_boundary(spark, tmp_path):
    """Pins the left-outer stream-stream join's NULL-emission rule the
    catalog oracle (streaming_interval_join_outer) encodes:
      * the global watermark is the MIN over both watermarked streams
        of (that stream's post-filter max event time - delay) — an
        empty or lagging right side HOLDS BACK left-side evictions;
      * a NULL row is emitted iff its deadline (l_ts + within) is
        STRICTLY before that watermark (== watermark is withheld).
    """
    import pandas as pd

    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 07:29:59.999",  # deadline 07:59:59.999 < wm
                    "2024-01-01 07:30:00.000",  # deadline == wm -> withheld
                    "2024-01-01 07:30:00.001",  # deadline  > wm -> withheld
                    "2024-01-01 10:00:00.000",  # click max anchor
                    "2024-01-01 10:00:00.000",  # purchase max anchor
                ]
            ),
            "user_id": [1, 2, 3, 98, 99],
            "event_type": ["click", "click", "click", "click", "purchase"],
            "value": [1.0] * 5,
            "props": [""] * 5,
        }
    ).to_parquet(tmp_path / "events.parquet")
    stream = sw.interval_join_outer_stream(
        sw.read_events_stream(spark, str(tmp_path))
    )
    sw.run_to_memory(stream, "ivj_outer_probe", mode="append")
    got = sorted(
        (r.user_id, r.l_id, r.r_id)
        for r in spark.sql("SELECT * FROM ivj_outer_probe").collect()
    )
    # wm = min(10:00, 10:00) - 2h = 08:00; only user 1's deadline is
    # strictly inside it. Users 2/3 (boundary/after) and 98 (inside
    # horizon) are withheld; no pair ever matches.
    assert got == [(1, 1, None)]
