"""Similarity search tests with planted vector clusters."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row

from mock_map_reduce_spark.operators import similarity as sim

DIM = 16


def _unit(vec):
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec]


@pytest.fixture(scope="module")
def vectors(spark):
    """3 planted clusters of 4 near-identical vectors + 20 random ones."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for _ in range(3):
        base = [rng.gauss(0, 1) for _ in range(DIM)]
        for _ in range(4):
            noisy = [x + rng.gauss(0, 0.05) for x in base]
            rows.append(Row(vec_id=vid, embedding=_unit(noisy)))
            vid += 1
    for _ in range(20):
        rows.append(Row(vec_id=vid, embedding=_unit([rng.gauss(0, 1) for _ in range(DIM)])))
        vid += 1
    return spark.createDataFrame(rows)


def test_brute_force_topk_finds_cluster(vectors):
    queries = vectors.filter("vec_id = 0")
    top = sim.brute_force_topk(vectors, queries, k=3).collect()
    assert {r.neighbor_id for r in top} == {1, 2, 3}  # own cluster first
    assert all(r.cosine > 0.99 for r in top)
    assert [r.rank for r in top] == [1, 2, 3]


def test_brute_force_excludes_self(vectors):
    queries = vectors.filter("vec_id = 0")
    ids = [r.neighbor_id for r in sim.brute_force_topk(vectors, queries, k=32).collect()]
    assert 0 not in ids


def test_cosine_pairs_above_planted(vectors):
    pairs = {(r.id_a, r.id_b) for r in sim.cosine_pairs_above(vectors, 0.95).collect()}
    expected = {
        (a, b)
        for c in range(3)
        for a in range(c * 4, c * 4 + 4)
        for b in range(a + 1, c * 4 + 4)
    }
    assert pairs == expected  # exactly the planted clusters, nothing else


def test_ann_lsh_recall_on_clusters(vectors):
    queries = vectors.filter("vec_id in (0, 4, 8)")  # one per cluster
    ann = sim.ann_topk_lsh(vectors, queries, dim=DIM, k=3, nbits=8)
    got = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    planted = {
        (q, n) for q in (0, 4, 8) for n in range(q, q + 4) if n != q
    }
    # multiprobe Hamming-1 on near-identical vectors: full recall expected
    assert planted <= got


def test_lsh_bucket_deterministic(spark, vectors):
    from pyspark.sql import functions as F

    b1 = vectors.select(sim.lsh_bucket(F.col("embedding"), DIM, 8, seed=1).alias("b")).collect()
    b2 = vectors.select(sim.lsh_bucket(F.col("embedding"), DIM, 8, seed=1).alias("b")).collect()
    assert [r.b for r in b1] == [r.b for r in b2]
    # same-cluster vectors land in the same bucket
    rows = vectors.select("vec_id", sim.lsh_bucket(F.col("embedding"), DIM, 8, seed=1).alias("b")).collect()
    by_id = {r.vec_id: r.b for r in rows}
    assert by_id[0] == by_id[1] == by_id[2] == by_id[3]


def test_ann_ivf_cell_recall_on_clusters(vectors):
    # centroids = the three cluster seeds + one outlier; cluster members
    # quantize to their own seed's cell, so nprobe=1 has full recall
    centroids = vectors.filter("vec_id in (0, 4, 8, 12)")
    queries = vectors.filter("vec_id in (0, 4, 8)")
    ivf = sim.ann_topk_ivf(vectors, queries, centroids, k=3)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    planted = {(q, n) for q in (0, 4, 8) for n in range(q, q + 4) if n != q}
    assert planted <= got


def test_ivf_assign_one_cell_per_vector(vectors):
    centroids = vectors.filter("vec_id < 4")
    assigned = sim.ivf_assign(vectors, centroids).collect()
    assert len(assigned) == vectors.count()  # argmax picks exactly one cell
    assert {r.cell for r in assigned} <= {0, 1, 2, 3}


def test_embedding_near_dup_lsh_planted(vectors):
    got = {(r.id_a, r.id_b) for r in sim.embedding_near_dup_lsh(vectors, 0.95, dim=DIM, nbits=4).collect()}
    planted = {
        (a, b)
        for c in range(3)
        for a in range(c * 4, c * 4 + 4)
        for b in range(a + 1, c * 4 + 4)
    }
    # the exact-cosine verify admits nothing outside the true pair set
    brute = {(r.id_a, r.id_b) for r in sim.cosine_pairs_above(vectors, 0.95).collect()}
    assert got <= brute
    # recall is approximate by construction: a cluster that straddles a
    # hyperplane loses its cross-bucket pairs (vector 7 does here, by
    # deterministic seed). Pin the measured behavior: >= 0.8 recall and
    # the two non-straddling clusters fully recovered.
    assert len(got & planted) / len(planted) >= 0.8
    for c in (0, 2):
        cluster = {(a, b) for a in range(c * 4, c * 4 + 4) for b in range(a + 1, c * 4 + 4)}
        assert cluster <= got


def test_pq_seed_vectors_code_themselves(spark, sf_dir):
    from mock_map_reduce_spark.operators import similarity as sim
    from mock_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.pq_codes(emb, dim=64, m=4, k=8)
    rows = out.filter("vec_id < 8").collect()
    # every seed vector's nearest codeword in every subspace is itself
    assert len(rows) == 8 * 4
    assert all(r.code == r.vec_id and r.sqdist == 0.0 for r in rows)
    # every vector gets exactly one code per subspace, codes in [0, 8)
    n = emb.count()
    assert out.count() == n * 4
    assert out.filter("code < 0 OR code >= 8").count() == 0


def test_pq_adc_approximates_exact_neighbors(spark, sf_dir):
    from mock_map_reduce_spark.operators import similarity as sim
    from mock_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    adc = sim.ann_topk_pq_adc(emb, dim=64, n_queries=3, m=4, k=8, top_k=5)
    rows = adc.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    for q in (0, 1, 2):
        ranks = sorted(r.rank for r in rows if r.query_id == q)
        assert ranks == [1, 2, 3, 4, 5]
    # approximate distances are non-negative and monotone in rank
    for q in (0, 1, 2):
        ds = [r.adist for r in sorted(rows, key=lambda r: r.rank) if r.query_id == q]
        assert all(d >= 0 for d in ds) and ds == sorted(ds)


def test_ivf_pq_neighbors_stay_in_cell_and_rank_densely(spark, sf_dir):
    from mock_map_reduce_spark.operators import similarity as sim
    from mock_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(emb.vec_id < 8)
    cells = {
        r.vec_id: r.cell for r in sim.ivf_assign(emb, centroids).select("vec_id", "cell").collect()
    }
    out = sim.ann_topk_ivf_pq(emb, centroids, dim=64, n_queries=3, top_k=5).collect()
    assert out
    by_q = {}
    for r in out:
        assert cells[r.neighbor_id] == cells[r.query_id]  # pruning respected
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))  # dense ranks


def test_ivf_pq_recall_floor_vs_bruteforce(spark, sf_dir):
    """Measured recall@10 of the composed IVF-PQ path against the
    exact brute-force baseline on real embeddings — the honest
    approximation audit for the billion-scale layout (cell pruning
    loses cross-cell neighbors; PQ loses within-cell precision).
    Floor pinned at the measured sf0.001 level minus slack."""
    from mock_map_reduce_spark.operators import similarity as sim
    from mock_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(emb.vec_id < 8)
    exact = {}
    for r in sim.brute_force_topk(emb, emb.filter(emb.vec_id < 3), k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in sim.ann_topk_ivf_pq(emb, centroids, dim=64, n_queries=3, top_k=10).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_ivf_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """nprobe=2 must recall at least as much of the exact top-10 as
    nprobe=1 for every query, and strictly more in aggregate here
    (the corpus plants near-boundary neighbors)."""
    from mock_map_reduce_spark.operators import similarity as sim
    from mock_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(emb.vec_id < 8)
    queries = emb.filter(emb.vec_id < 3)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = topsets(sim.brute_force_topk(emb, queries, k=10))
    one = topsets(sim.ann_topk_ivf(emb, queries, centroids, k=10))
    two = topsets(sim.ann_topk_ivf_multiprobe(emb, queries, centroids, k=10, nprobe=2))
    r1 = r2 = 0
    for q in exact:
        h1 = len(exact[q] & one.get(q, set()))
        h2 = len(exact[q] & two.get(q, set()))
        assert h2 >= h1, q  # more probes never lose recall
        r1 += h1
        r2 += h2
    assert r2 > r1  # strictly better in aggregate on this corpus


def test_knn_label_vote_on_planted_clusters(spark):
    """kNN majority label voting recovers planted cluster labels: 5
    clusters x 8 members, each member queried against the rest with
    k=3 — accuracy must be 100% when clusters are separable."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mock_map_reduce_spark.operators import similarity as sim

    rng = random.Random(11)
    rows = []
    vid = 0
    for label in range(5):
        base = [rng.gauss(0, 1) for _ in range(DIM)]
        for _ in range(8):
            noisy = [x + rng.gauss(0, 0.05) for x in base]
            rows.append(Row(vec_id=vid, embedding=_unit(noisy), label=label))
            vid += 1
    emb = spark.createDataFrame(rows)
    nn = sim.brute_force_topk(emb, emb, k=3).select("query_id", "neighbor_id")
    labels = emb.select("vec_id", "label")
    votes = (
        nn.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("label"))
    pred = votes.withColumn("r", F.row_number().over(w)).filter("r = 1")
    truth = labels.select(F.col("vec_id").alias("query_id"), F.col("label").alias("t"))
    joined = pred.join(truth, "query_id")
    acc = joined.filter("label = t").count() / joined.count()
    assert acc == 1.0


def test_ann_recall_clustered_floor(spark):
    """The tuned index must deliver mean recall@10 >= 0.8 on the
    clustered corpus (the regime ANN exists for) — measured through
    the catalog entry itself, so the floor guards the exact pipeline
    the driver hash-checks. Pinned at the sf0.01 rung (500 vectors
    give ~31 per cluster, so the exact top-10 is all-in-cluster by
    construction); skips when that dir is absent on this host."""
    import os

    import pytest

    from mock_map_reduce_spark.catalog.similarity import (
        q_similarity_ann_recall_clustered,
    )

    sf001 = os.path.join(
        os.path.dirname(os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")),
        "sf0.01",
    )
    if not os.path.isdir(sf001):
        pytest.skip(f"{sf001} not present")
    rows = q_similarity_ann_recall_clustered(spark, sf001).collect()
    assert len(rows) == 20
    mean_recall = sum(r.recall for r in rows) / len(rows)
    assert mean_recall >= 0.8, mean_recall
