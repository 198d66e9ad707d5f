"""Multimodal catalog: binary payload plumbing + stubbed feature extraction.

binary_stats is oracle-checked (byte lengths + base64 prefix are
deterministic in both engines); the mapInPandas feature extractor is
Python-side (no SQL twin) -> rows-only, pinned by pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.operators import multimodal as mm
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table


@query(
    "multimodal_binary_stats",
    oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       to_base64(CAST(substring(text, 1, 8) AS BLOB)) AS prefix_b64,
       'text/plain' AS media_type
FROM documents
""",
)
def q_multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata plumbing over an opaque binary payload column."""
    docs = load_table(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(docs)
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.base64(F.encode(F.substring(F.col("payload").cast("string"), 1, 8), "UTF-8")).alias("prefix_b64"),
        F.col("meta.media_type").alias("media_type"),
    )


@query("multimodal_byte_features")  # Pandas-UDF path -> rows-only; pytest pins values
def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (stub decoder) via mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.byte_features(mm.attach_binary_payload(docs))
