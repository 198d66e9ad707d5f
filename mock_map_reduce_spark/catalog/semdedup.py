"""SemDeDup — semantic dedup over the embeddings table.

The published method for embedding-space deduplication of web-scale
training corpora (Abbas et al. 2023, arXiv:2303.09540): k-means
cluster the embeddings, then prune within-cluster near-duplicates by
exact cosine. Composes the catalog's deterministic k-means
(similarity_kmeans machinery) with the dedup family's min-id survivor
convention, so the ENTIRE pipeline — both Lloyd rounds, the cluster
cap, the pair prune — replays in the DuckDB oracle's CTE chain.

Registered in a module that imports LAST (see catalog/__init__.py) so
the new query queues BEHIND the outstanding confirmation debt in the
driver's sampled prefix rather than displacing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mock_map_reduce_spark.catalog.similarity import (
    EMB_DIM,
    _cos,
    _km_assign_cte,
    _km_update_cte,
    _V,
)
from mock_map_reduce_spark.operators import clustering as cl
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

SD_K = 8  # clusters; production knob is k ∝ n (cluster size ≈ const)
SD_ITER = 2  # Lloyd rounds, same as similarity_kmeans
SD_TAU = 0.35  # within-cluster prune threshold (cosine)
SD_CAP = 1024  # max_cluster_size skew guard, mirrors LSH max_bucket_size


def _sd_oracle() -> str:
    parts = [
        _V,
        f"dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim)",
        f"c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {SD_K})",
    ]
    for i in range(SD_ITER):
        parts.append(_km_assign_cte(f"a{i}", f"c{i}"))
        parts.append(_km_update_cte(f"m{i}", f"c{i + 1}", f"a{i}"))
    parts.append(_km_assign_cte("afinal", f"c{SD_ITER}"))
    parts.append(
        f"""pool AS (
  SELECT vec_id, e, cell FROM (
    SELECT vec_id, e, cell,
           ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS crn
    FROM afinal
  ) WHERE crn <= {SD_CAP}
)"""
    )
    parts.append(
        f"""dom AS (
  SELECT DISTINCT b.vec_id
  FROM pool a JOIN pool b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cos("a.e", "b.e")} >= {SD_TAU}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT f.vec_id, f.cell, CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM afinal f LEFT JOIN dom d ON f.vec_id = d.vec_id"""
    )


@query("dedup_semantic_semdedup", oracle=_sd_oracle())
def q_dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over embeddings: every vector tagged (vec_id, cell,
    kept) — kept=0 iff a lower-id same-cluster vector sits within
    cosine SD_TAU. The embedding-space sibling of dedup_exact /
    dedup_fuzzy_survivors, with the clustering itself inside the
    oracle compare."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.semdedup(
        emb, SD_TAU, k=SD_K, n_iter=SD_ITER, max_cluster_size=SD_CAP
    )
