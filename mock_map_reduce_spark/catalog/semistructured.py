"""Array / JSON / nested-type function surface (SURVEY §2.2).

The reference's type system is {string, int32} (SURVEY §1.2); the new
engine exposes Spark's full nested-type surface. Determinism notes:
float32 array elements are cast to double (exact) before arithmetic,
and every float output is rounded after a deterministic left-to-right
fold so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table


@query(
    "array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over array<float> embeddings.

    l2_norm is a left-to-right fold (F.aggregate) over doubles — the
    same sequential sum DuckDB's list_sum performs, so no float
    reordering between engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sumsq = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.sqrt(sumsq), 6).alias("l2_norm"),
    )


@query(
    "json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema — the idiomatic (codegen) JSON path."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )


@query(
    "json_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
""",
)
def q_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
    )


@query(
    "map_funcs",
    oracle="""
SELECT l_returnflag || '|' || l_linestatus AS flag_status, n_rows FROM (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build map -> explode back to rows.

    DuckDB's map type doesn't hash-compare cleanly across engines, so
    the map is exploded back to strings for the oracle; the Spark plan
    still exercises create_map/explode (MapType surface).
    """
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
    mapped = grouped.select(
        F.create_map(
            F.concat_ws("|", "l_returnflag", "l_linestatus"), F.col("n")
        ).alias("m")
    )
    return mapped.select(F.explode("m").alias("flag_status", "n_rows"))


@query(
    "json_variant_rollup",
    oracle="""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1
""",
)
def q_json_variant_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: props parses once into the binary
    variant encoding (parse_json), fields extract with typed
    variant_get, and the query aggregates on the extracted value.

    The modern semi-structured storage model for heterogeneous JSON at
    scale — shredded binary variant instead of per-query string
    re-parsing (json_funcs shows the from_json fixed-schema path; this
    is the schema-flexible one). The oracle re-derives the same rollup
    via DuckDB's JSON extraction.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).cast("long").alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sum_k"))
    )
