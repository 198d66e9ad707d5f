"""IVF-style ANN via partition-pruned storage.

The scale path for similarity search over 100 TB of vectors: write the
corpus parquet PARTITIONED BY its LSH bucket; a query then reads only
its probed bucket directories — partition pruning acts as the coarse
index, so the scan cost per query is corpus/2^bits, enforced by the
storage layout rather than a runtime filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mock_map_reduce_spark.operators import similarity as sim
from mock_map_reduce_spark.plans import executed_plan
from mock_map_reduce_spark.sources import load_table

DIM = 64
NBITS = 4


def test_ivf_partitioned_ann(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn(
        "bucket", sim.lsh_bucket(F.col("embedding"), DIM, NBITS, seed=42)
    )
    out = str(tmp_path / "ivf")
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(out)

    corpus = spark.read.parquet(out)
    # pick one query vector; its bucket is its cell
    qrow = bucketed.filter("vec_id = 0").select("bucket").collect()[0]
    probe = corpus.filter(F.col("bucket") == qrow.bucket)

    plan = executed_plan(probe)
    # storage-level pruning: the scan carries a PartitionFilter on bucket
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]

    # the probed cell is a strict subset of the corpus, and exact
    # cosine over the cell returns the query's own-bucket neighbors
    cell_n, total_n = probe.count(), corpus.count()
    assert 0 < cell_n < total_n
    queries = emb.filter("vec_id = 0")
    top = sim.brute_force_topk(probe.drop("bucket"), queries, k=5)
    assert top.count() <= 5


def test_ivf_pq_codes_at_rest_search_pruned_and_exact(spark, sf_dir, tmp_path):
    """PLANS.md's production claim, pinned: with the PQ code table
    stored PARTITIONED BY IVF cell, the ADC search alone is a
    partition-pruned scan of the probed cell's codes + one broadcast
    LUT join + the ranking — and it returns exactly what the inline
    composed operator (ann_topk_ivf_pq) computes for the same query."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    cells = sim.ivf_assign(emb, centroids).select("vec_id", "cell")
    codes = sim.pq_codes(emb, DIM).select("vec_id", "subspace", "code")
    out = str(tmp_path / "ivfpq_codes")
    codes.join(cells, "vec_id").write.mode("overwrite").partitionBy("cell").parquet(out)
    stored = spark.read.parquet(out)

    qcell = cells.filter("vec_id = 0").collect()[0].cell
    probe = stored.filter(F.col("cell") == qcell)
    plan = executed_plan(probe)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]

    # search-time LUT for query 0 (same construction as the operator)
    m, sub = 4, DIM // 4
    v = emb.select("vec_id", sim.as_double_array("embedding").alias("e"))
    slices = F.array(*[F.slice("e", s * sub + 1, sub) for s in range(m)])
    cb = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("code_id"), F.posexplode(slices).alias("subspace", "cv")
    )
    q_subs = v.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.posexplode(slices).alias("subspace", "qv")
    )
    lut = q_subs.join(F.broadcast(cb), "subspace").select(
        "query_id", "subspace", "code_id", sim.sqdist(F.col("qv"), F.col("cv")).alias("d")
    )
    hits = probe.join(
        F.broadcast(lut),
        (probe.subspace == lut.subspace) & (probe.code == lut.code_id),
    ).select(F.col("vec_id"), "query_id", probe.subspace.alias("s"), "d")
    at_rest = sim._adc_rank(hits, m, 5, "vec_id")

    inline = sim.ann_topk_ivf_pq(emb, centroids, dim=DIM, n_queries=1, top_k=5)
    assert sorted(map(tuple, at_rest.collect())) == sorted(map(tuple, inline.collect()))
