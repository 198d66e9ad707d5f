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
