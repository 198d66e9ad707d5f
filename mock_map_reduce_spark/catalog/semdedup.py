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


def _sd_oracle(seed: str = str(SD_K)) -> str:
    """The full SemDeDup CTE chain. ``seed`` is the SQL expression
    bounding the seed-centroid ids — a literal k for the fixed-k
    entry, a COUNT(*)-derived scalar subquery for the k ∝ n entry
    (the CTE chain itself is k-independent, so one template serves
    both)."""
    parts = [
        _V,
        f"dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim)",
        f"c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < ({seed}))",
    ]
    for i in range(SD_ITER):
        parts.append(_km_assign_cte(f"a{i}", f"c{i}"))
        parts.append(_km_update_cte(f"m{i}", f"c{i + 1}", f"a{i}"))
    parts.append(_km_assign_cte("afinal", f"c{SD_ITER}"))
    parts.append(
        f"""ranked AS (
  SELECT vec_id, e, cell,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS crn
  FROM afinal
)"""
    )
    parts.append(
        f"""dom AS (
  SELECT DISTINCT b.vec_id
  FROM ranked a JOIN ranked b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.crn <= {SD_CAP} AND b.crn <= {SD_CAP}
    AND {_cos("a.e", "b.e")} >= {SD_TAU}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT r.vec_id, r.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept,
       CASE WHEN r.crn <= {SD_CAP} THEN 1 ELSE 0 END AS examined
FROM ranked r LEFT JOIN dom d ON r.vec_id = d.vec_id"""
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


SD_TARGET = 32  # target mean cluster size for the k ∝ n variant
# Single-level-assign budget: k ∝ n is the paper's sizing, but the
# broadcast cosine argmax costs O(n·k) — unbounded k turns the gate
# query quadratic (found in round 8's sf10 proof run: n=200k sized
# k=6250 → 1.25 BILLION interpreted HOF cosines per Lloyd round, on
# the 2 tasks the single-file scan provided; hours of wall). Past
# SD_K_MAX the honest production path is the two-level / IVF
# coarse-quantizer assign described in the docstring — a gate entry
# must stay tractable in BOTH engines, so k caps here and the cap is
# mirrored in the oracle's seed expression.
SD_K_MAX = 1024


@query(
    "dedup_semantic_semdedup_kscaled",
    oracle=_sd_oracle(
        seed=(
            f"SELECT LEAST({SD_K_MAX}, GREATEST({SD_K}, "
            f"CAST(ceil(COUNT(*) / {SD_TARGET}.0) AS BIGINT))) FROM v"
        )
    ),
)
def q_dedup_semantic_semdedup_kscaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup with the paper's PRODUCTION sizing: k ∝ n so mean
    cluster size stays ≈ SD_TARGET regardless of corpus scale (k=16 at
    sf0.01's 500 vectors, k=63 at sf0.1's 2000, ~3M clusters at 100M
    docs). This is the 100 TB recall story: bounding per-cluster pair
    fan-out by GROWING k, not by truncating clusters — the SD_CAP skew
    guard stays as a backstop but is not binding while k scales
    (n ≤ SD_K_MAX·SD_TARGET), so every vector is actually examined
    (the ``examined`` column audits exactly that; past the SD_K_MAX
    assign budget the audit shows exactly how much the cap skips). Honest scale caveat: the assign stage here
    is the broadcast O(n·k) cosine argmax, fine to k ~ thousands; at
    production k (~millions) assignment itself becomes the IVF
    coarse-quantizer problem — two-level k-means where a first pass
    over √k coarse cells prunes the candidate centroids per vector,
    exactly the partition-pruned inverted-list layout
    ``similarity_ann_ivf`` (operators/similarity.py) already
    implements. The pair-prune stage is k-independent either way. The one driver-side scalar is the corpus
    COUNT(*) that sizes k — the same bounded collect a production job
    performs at ingest. Oracle: identical CTE chain with k derived by
    the same COUNT(*) expression in SQL."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    k = min(SD_K_MAX, max(SD_K, math.ceil(emb.count() / SD_TARGET)))
    return cl.semdedup(
        emb, SD_TAU, k=k, n_iter=SD_ITER, max_cluster_size=SD_CAP
    )


SC_BENCH_MAX_ID = 50  # vec_id < 50 plays the benchmark/eval embedding set
SC_TAU = 0.35  # semantic-contamination quarantine threshold


@query(
    "dedup_semantic_contamination",
    oracle=f"""
WITH {_V},
bench AS (SELECT vec_id AS bench_id, e AS be FROM v WHERE vec_id < {SC_BENCH_MAX_ID}),
corp AS (SELECT vec_id, e FROM v WHERE vec_id >= {SC_BENCH_MAX_ID}),
scored AS (
  SELECT c.vec_id, b.bench_id, {_cos("c.e", "be")} AS cos
  FROM corp c CROSS JOIN bench b
),
best AS (
  SELECT vec_id, bench_id, cos,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id DESC) AS rn
  FROM scored
)
SELECT vec_id, bench_id AS nearest_bench_id, round(cos, 6) AS cosine
FROM best WHERE rn = 1 AND cos >= {SC_TAU}
""",
)
def q_dedup_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space sibling of
    dedup_contamination's n-gram overlap: quarantine every corpus
    vector whose cosine to ANY benchmark/eval embedding reaches
    SC_TAU, reporting its nearest benchmark neighbor. Paraphrased or
    re-tokenized eval leakage defeats n-gram matching; this is the
    embedding-similarity sweep used alongside it in pretraining
    decontamination.

    Plan shape: the benchmark set (eval suites are tiny next to the
    corpus) BROADCASTS onto one corpus scan — a bounded
    BroadcastNestedLoopJoin, never corpus x corpus — and the
    per-vector best-match is a max-struct groupBy with map-side
    combine (no window over the corpus). Cost at 100 TB is exactly
    one scan x |bench| fused multiply-adds per vector; both engines
    fold dot/norm sequentially left-to-right, so even the unrounded
    cosines are bit-identical (the similarity catalog's convention).
    """
    from pyspark.sql import functions as F

    from mock_map_reduce_spark.operators.similarity import as_double_array, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < SC_BENCH_MAX_ID).select(
        F.col("vec_id").alias("bench_id"), as_double_array("embedding").alias("be")
    )
    corp = emb.filter(F.col("vec_id") >= SC_BENCH_MAX_ID).select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    scored = corp.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "bench_id",
        cosine(F.col("e"), F.col("be")).alias("cos"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), F.col("bench_id"))).alias("b")
    )
    return best.filter(F.col("b.cos") >= SC_TAU).select(
        "vec_id",
        F.col("b.bench_id").alias("nearest_bench_id"),
        F.round(F.col("b.cos"), 6).alias("cosine"),
    )
