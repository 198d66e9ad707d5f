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
