"""Multimodal catalog: binary payload plumbing + REAL image decode.

binary_stats is oracle-checked (byte lengths + base64 prefix are
deterministic in both engines); byte_features' mapInPandas extractor
is Python-side (no SQL twin) -> rows-only, pinned by pytest;
image_features is the oracle-checked core: pure-stdlib PPM/BMP
decoders run inside mapInPandas and the synthetic pixel law makes the
expected statistics closed-form in SQL, so a decoder bug (header
offset, BGR order, bottom-up flip) fails the value hash.
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


@query(
    "multimodal_image_features",
    oracle="""
SELECT doc_id,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(8 + doc_id % 5 AS INT) AS height,
       CAST(doc_id % 64 + (7 + doc_id % 9) / 2.0 AS DOUBLE) AS mean_r,
       CAST(doc_id % 32 + (7 + doc_id % 5) / 2.0 AS DOUBLE) AS mean_g,
       CAST((7 + doc_id % 9) / 2.0 + (7 + doc_id % 5) / 2.0 AS DOUBLE) AS mean_b,
       CAST(doc_id % 32 AS DOUBLE) AS top_row_g
FROM documents
""",
)
def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-checked end to end.

    Each doc gets a deterministic synthetic image — encoded as netpbm
    PPM (even ids) or 24-bit BMP (odd ids) by the ENCODER half of the
    pure-stdlib codec pair — and ``image_features`` decodes it back
    inside mapInPandas and reduces pixels to per-channel means. The
    pixel law is wrap-free (operators/multimodal.synthesize_image), so
    the oracle states the expected statistics in closed form: any
    decoder defect (PPM header/comment parsing, BMP BGR order, row
    padding, the bottom-up flip — caught by top_row_g) lands as a
    value-hash mismatch, not a silent drift.

    Scale: encode+decode ride one Arrow-batched pass; only (id,
    7 doubles) survive the operator, the payload never shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = mm.synthesize_image_table(docs)
    return mm.image_features(media)
