"""Modern PySpark API surfaces a complete engine should exercise:
Python UDTFs (lateral table functions) and Observation metrics.

Both are demonstrated against the documents/events tables and
cross-checked with plain DataFrame equivalents — the API is the
deliverable here; the catalog's operators remain the primary surface.
"""

from __future__ import annotations

from pyspark.sql import Observation, Row, functions as F


def test_python_udtf_chunking_matches_dataframe_op(spark):
    """A real @udtf (Spark 3.5+ lateral table function) emitting
    overlapping token chunks, checked against the codegen'd
    text.chunk_documents operator contract: one row per chunk, same
    chunk starts for the same (size, stride)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int")
    class ChunkCounter:
        def eval(self, text: str, size: int, stride: int):
            toks = [t for t in (text or "").split() if t]
            i = idx = 0
            while i < len(toks):
                chunk = toks[i : i + size]
                yield idx, len(chunk)
                if i + size >= len(toks):
                    break
                i += stride
                idx += 1

    spark.udtf.register("chunk_counter", ChunkCounter)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10)))]
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, c.chunk_idx, c.n_tokens FROM udtf_docs, "
        "LATERAL chunk_counter(text, 4, 3) AS c"
    ).collect()
    # 10 tokens, size 4, stride 3 -> starts at 0, 3, 6 -> lengths 4, 4, 4
    assert [(r.chunk_idx, r.n_tokens) for r in sorted(rows, key=lambda r: r.chunk_idx)] == [
        (0, 4), (1, 4), (2, 4),
    ]


def test_observation_metrics_ride_the_job(spark, sf_dir):
    """df.observe collects aggregate metrics as a side effect of the
    SAME job — the 100 TB monitoring primitive (no second scan for
    row counts / null rates). Values must match a direct aggregation."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    obs = Observation("ingest_metrics")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
    )
    n_out = observed.filter(F.col("event_type") == "view").count()  # one job
    direct = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").isNull().cast("long")).alias("nn"),
    ).collect()[0]
    assert obs.get["n_rows"] == direct.n
    assert (obs.get["n_null_value"] or 0) == (direct.nn or 0)
    assert 0 < n_out <= direct.n


def test_cogrouped_asof_matches_declarative(spark, sf_dir):
    """The cogrouped-applyInPandas as-of join must return EXACTLY the
    declarative union+window implementation's rows — two engines for
    one contract, same oracle (catalog/timeseries.py)."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    a = registry.QUERIES["asof_join_purchases"](spark, sf_dir).collect()
    b = registry.QUERIES["asof_join_cogrouped"](spark, sf_dir).collect()
    key = lambda r: (r.event_id, r.user_id)  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    assert any(r.last_click_id is not None for r in b)


def test_cogrouped_asof_edge_cases(spark, tmp_path):
    """Tie-breaks and empty sides, pinned on a crafted events table:
    a click AT the purchase timestamp qualifies; among equal-timestamp
    clicks the max event_id wins; a purchase with no clicks gets NULL;
    a clicks-only user emits nothing."""
    import datetime as dt

    from mock_map_reduce_spark import registry

    registry.load_all()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two clicks at the same ts as the purchase -> max id (11)
        Row(event_id=10, ts=t0, user_id=1, event_type="click", value=None, props=None),
        Row(event_id=11, ts=t0, user_id=1, event_type="click", value=None, props=None),
        Row(event_id=12, ts=t0, user_id=1, event_type="purchase", value=1.0, props=None),
        # user 2: click strictly after the purchase -> NULL
        Row(event_id=20, ts=t0, user_id=2, event_type="purchase", value=1.0, props=None),
        Row(event_id=21, ts=t0 + dt.timedelta(seconds=1), user_id=2,
            event_type="click", value=None, props=None),
        # user 3: clicks only -> no output row
        Row(event_id=30, ts=t0, user_id=3, event_type="click", value=None, props=None),
        # user 4: click strictly before -> that click
        Row(event_id=40, ts=t0, user_id=4, event_type="click", value=None, props=None),
        Row(event_id=41, ts=t0 + dt.timedelta(seconds=5), user_id=4,
            event_type="purchase", value=1.0, props=None),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    spark.createDataFrame(rows, schema).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r.event_id: r.last_click_id
        for r in registry.QUERIES["asof_join_cogrouped"](spark, str(tmp_path)).collect()
    }
    assert out == {12: 11, 20: None, 41: 40}


def test_map_in_arrow_doc_stats_match_jvm(spark, sf_dir):
    """mapInArrow's pyarrow.compute byte/space counts must equal the
    JVM built-in expressions (octet_length / space-count identity)."""
    from mock_map_reduce_spark import registry

    registry.load_all()
    got = {
        r.lang: (r.n_docs, r.total_bytes, r.total_spaces)
        for r in registry.QUERIES["arrow_map_doc_stats"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.lang: (r.n_docs, r.total_bytes, r.total_spaces)
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("text")).alias("total_bytes"),
            F.sum(
                F.length("text") - F.length(F.regexp_replace("text", " ", ""))
            ).alias("total_spaces"),
        )
        .collect()
    }
    assert got == want
