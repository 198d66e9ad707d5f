"""Similarity-search catalog: brute-force cosine top-k, threshold
pairs, LSH-bucketed ANN.

Oracle determinism: both engines compute dot/norm as a sequential
left-to-right fold over doubles (Spark F.aggregate; DuckDB
list_reduce), so even un-rounded cosines are bit-identical — rounding
to 6 is belt-and-braces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.operators import clustering as cl, similarity as sim
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

TOP_K = 10
N_QUERIES = 5  # query set = vec_id < 5
EMB_DIM = 64

_V = "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"
_DOT = "list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]), (x, y) -> x + y)"
_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (x, y) -> x + y))"


def _cos(a: str, b: str) -> str:
    return f"{_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)})"


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
WITH {_V},
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, v.vec_id AS neighbor_id, {_cos("qe", "v.e")} AS cos
  FROM v CROSS JOIN q
  WHERE v.vec_id <> query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
)
def q_similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a 5-vector query set against the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return sim.brute_force_topk(emb, queries, k=TOP_K)


# NOTE: the exact all-pairs form (operators/similarity.cosine_pairs_above)
# is deliberately NOT a catalog entry: its physical plan is a
# BroadcastNestedLoopJoin over corpus×corpus — O(n²) compute that a
# 100 TB user must never reach by calling a named query. It remains the
# ground-truth verification helper for the LSH paths
# (tests/test_similarity.py pins recall against it on planted clusters);
# the exposed near-dup pair miner is ``dedup_embedding_lsh`` below
# (bucketed candidates + exact-cosine verify, oracle-checked).
# tests/test_plans.py::test_no_catalog_query_is_quadratic pins this.


ANN_LSH_BITS = 8
_PLANES8 = sim._hyperplanes(EMB_DIM, ANN_LSH_BITS, seed=42)


def _plane_lit(row: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in row) + "]"


def _ann_lsh_oracle() -> str:
    # seeded hyperplanes are driver-side literals, so the WHOLE ANN
    # pipeline — sign-bit bucket, Hamming-1 multiprobe (xor), in-bucket
    # exact cosine, per-query top-k — re-derives in SQL (the strategy
    # dedup_embedding_lsh already uses at 4 bits).
    bucket = " + ".join(
        f"(CASE WHEN {_DOT.format(a='e', b=_plane_lit(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES8)
    )
    probes = ", ".join(["CAST(qb AS BIGINT)"] + [f"xor(qb, {1 << i})" for i in range(ANN_LSH_BITS)])
    return f"""
WITH {_V},
bk AS (SELECT vec_id, e, CAST({bucket} AS BIGINT) AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qb FROM bk WHERE vec_id < {N_QUERIES}),
probes AS (SELECT query_id, qe, unnest([{probes}]) AS bucket FROM q),
scored AS (
  SELECT query_id, bk.vec_id AS neighbor_id, {_cos("qe", "bk.e")} AS cos
  FROM bk JOIN probes USING (bucket)
  WHERE bk.vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


@query("similarity_ann_lsh", oracle=_ann_lsh_oracle())
def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (8-bit hyperplane signatures, Hamming-1
    multiprobe) — NOW fully oracle-checked: approximate vs ground
    truth, but deterministic given the seeded hyperplanes, so the
    DuckDB twin re-derives buckets, probes, and the in-bucket top-k
    exactly (pytest still pins recall against the exact baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return sim.ann_topk_lsh(emb, queries, dim=EMB_DIM, k=TOP_K, nbits=ANN_LSH_BITS)


N_CELLS = 8  # IVF coarse quantizer: centroids = embeddings with vec_id < 8


@query(
    "similarity_ann_ivf",
    oracle=f"""
WITH {_V},
cent AS (SELECT vec_id AS centroid_id, e AS cent FROM v WHERE vec_id < {N_CELLS}),
assign AS (
  SELECT vec_id, e, centroid_id AS cell FROM (
    SELECT v.vec_id, v.e, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos("v.e", "cent.cent")} DESC, cent.centroid_id) AS rn
    FROM v CROSS JOIN cent
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, e AS qe, cell FROM assign WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id, {_cos("qe", "a.e")} AS cos
  FROM assign a JOIN q USING (cell)
  WHERE a.vec_id <> query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
)
def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, fully oracle-checked: deterministic seed-vector
    centroids (vec_id < 8), argmax-cosine cell assignment, nprobe=1
    in-cell exact search. Per-query scan cost drops to corpus/n_cells;
    pair with cell-partitioned storage for pruning at rest.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CELLS)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return sim.ann_topk_ivf(emb, queries, centroids, k=TOP_K)


# --- embedding near-dup via hyperplane LSH (fully oracle-checked) ----------
# The hyperplanes are deterministic driver-side literals (seeded LCG +
# Box-Muller), so the SAME constants are inlined into the DuckDB SQL:
# sign-bit agreement and the exact-cosine verify are fold arithmetic,
# bit-identical in both engines.

NDUP_BITS = 4
NDUP_THRESHOLD = 0.35
_PLANES = sim._hyperplanes(EMB_DIM, NDUP_BITS, seed=42)


_BUCKET = " + ".join(
    f"(CASE WHEN {_DOT.format(a='e', b=_plane_lit(p))} >= 0 THEN {1 << i} ELSE 0 END)"
    for i, p in enumerate(_PLANES)
)


@query(
    "dedup_embedding_lsh",
    oracle=f"""
WITH {_V},
bk AS (SELECT vec_id, e, {_BUCKET} AS bucket FROM v)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos("a.e", "b.e")}, 6) AS cosine
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cos("a.e", "b.e")} >= {NDUP_THRESHOLD}
""",
)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup mining at scale: hyperplane-LSH buckets
    generate candidates (corpus/2^bits per bucket), exact cosine
    verifies — O(sum bucket^2) instead of the O(n^2) of
    similarity_pairs_above, same bucket→pairs→verify shape as the
    MinHash-LSH text path.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dup_lsh(
        emb, NDUP_THRESHOLD, dim=EMB_DIM, nbits=NDUP_BITS, seed=42
    )


# --- deterministic k-means (iterative, yet fully oracle-checked) -----------

KM_K = 8
KM_ITER = 2


def _km_assign_cte(name: str, cent: str, with_cos: bool = False) -> str:
    cos = _cos("v.e", f"{cent}.ce")
    proj = "vec_id, e, cid AS cell" + (", cos" if with_cos else "")
    return f"""{name} AS (
  SELECT {proj} FROM (
    SELECT v.vec_id, v.e, {cent}.cid, {cos} AS cos,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {cos} DESC, {cent}.cid) AS rn
    FROM v CROSS JOIN {cent}
  ) WHERE rn = 1
)"""


def _km_update_cte(mname: str, cname: str, assigned: str) -> str:
    return f"""{mname} AS (
  SELECT cell, dim,
         CAST(SUM(CAST(e[dim] AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS m
  FROM {assigned} CROSS JOIN dims GROUP BY cell, dim
),
{cname} AS (SELECT cell AS cid, list(m ORDER BY dim) AS ce FROM {mname} GROUP BY cell)"""


def _km_oracle() -> str:
    parts = [
        _V,
        f"dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim)",
        f"c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {KM_K})",
    ]
    for i in range(KM_ITER):
        parts.append(_km_assign_cte(f"a{i}", f"c{i}"))
        parts.append(_km_update_cte(f"m{i}", f"c{i + 1}", f"a{i}"))
    parts.append(_km_assign_cte("afinal", f"c{KM_ITER}", with_cos=True))
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT vec_id, cell, round(cos, 6) AS cosine FROM afinal"
    )


@query("similarity_kmeans", oracle=_km_oracle())
def q_similarity_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd rounds (seed centroids = vec_id < 8,
    exact-decimal centroid means), final assignment oracle-checked
    end-to-end — the iteration itself is inside the compare, unlike
    dedup_clusters where only pytest pins the loop."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.kmeans_lloyd(emb, k=KM_K, n_iter=KM_ITER)


# --- deterministic kmeans++-style seeding (greedy k-center) -----------------

KC_K = 6
KC_POOL = "4"  # pool = vec ids whose md5 first hex nibble < '4' (~25%)


def _kc_oracle() -> str:
    cos = _cos("p.e", "c.ce")
    parts = [
        _V,
        f"dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim)",
        f"""pool AS (SELECT vec_id, e FROM v
  WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '{KC_POOL}')""",
        "c0 AS (SELECT vec_id AS cid, e AS ce FROM pool"
        " WHERE vec_id = (SELECT MIN(vec_id) FROM pool))",
    ]
    for j in range(KC_K - 1):
        parts.append(
            f"""b{j} AS (SELECT p.vec_id, MAX({cos}) AS best
  FROM pool p CROSS JOIN c{j} c GROUP BY p.vec_id),
n{j} AS (SELECT vec_id FROM b{j} ORDER BY best ASC, vec_id ASC LIMIT 1),
c{j + 1} AS (SELECT cid, ce FROM c{j}
  UNION ALL SELECT p.vec_id, p.e FROM pool p JOIN n{j} USING (vec_id))"""
        )
    parts.append(_km_assign_cte("afinal", f"c{KC_K - 1}", with_cos=True))
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT vec_id, cell, round(cos, 6) AS cosine FROM afinal"
    )


@query("similarity_kmeans_pp", oracle=_kc_oracle())
def q_similarity_kmeans_pp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center seeding (deterministic kmeans++ analogue) over a
    25% md5-prefix candidate pool, then one full-corpus assignment —
    the ENTIRE farthest-point selection loop is unrolled into the
    DuckDB oracle's CTE chain, so seed choice itself is value-checked.
    Unlike similarity_kmeans's low-id seeds, these seeds are spread by
    construction (each maximizes distance to the chosen set)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = cl.kcenter_init(emb, k=KC_K, pool_prefix_lt=KC_POOL)
    return cl.kmeans_lloyd(emb, k=KC_K, n_iter=0, init=cents)


# --- int8 quantization audit ------------------------------------------------

_ABSMAX = "list_reduce(list_transform({a}, x -> abs(x)), (x, y) -> greatest(x, y))"


@query(
    "similarity_quantize_int8",
    oracle=f"""
WITH {_V},
s AS (SELECT vec_id, e, 127.0 / {_ABSMAX.format(a="e")} AS scale FROM v),
q AS (SELECT vec_id, e, scale, list_transform(e, x -> floor(x * scale + 0.5)) AS qc FROM s)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_reduce(list_transform(qc, x -> abs(x)), (x, y) -> x + y) AS BIGINT) AS q_l1,
       list_reduce(
         list_prepend(0.0,
           list_transform(range(1, len(e) + 1), i -> (e[i] - qc[i] / scale) * (e[i] - qc[i] / scale))),
         (acc, x) -> acc + x) / len(e) AS recon_mse
FROM q
""",
)
def q_similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit — codes pinned
    exactly via the integer |code| sum, reconstruction MSE via
    sequential fold (floor(x+0.5) sidesteps engine round-half rules)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.quantize_int8_stats(emb)


# --- product quantization (fully oracle-checked) ----------------------------

PQ_M = 4          # subspaces
PQ_K = 8          # codewords per subspace (seed vectors vec_id < 8)
_PQ_SUB = EMB_DIM // PQ_M

_SQD = ("list_reduce(list_transform(range(1, len({a})+1), "
        "i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])), (x, y) -> x + y)")

_PQ_SUBS = "sub AS (\n" + "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {s} AS subspace, "
    f"list_slice(e, {s * _PQ_SUB + 1}, {(s + 1) * _PQ_SUB}) AS sv FROM v"
    for s in range(PQ_M)
) + "\n)"


@query(
    "similarity_pq_codes",
    oracle=f"""
WITH {_V},
{_PQ_SUBS},
cb AS (SELECT vec_id AS code_id, subspace, sv AS cv FROM sub WHERE vec_id < {PQ_K}),
scored AS (
  SELECT s.vec_id, s.subspace, cb.code_id, {_SQD.format(a="s.sv", b="cb.cv")} AS d
  FROM sub s JOIN cb USING (subspace)
)
SELECT vec_id, subspace, code, sqdist FROM (
  SELECT vec_id, subspace, code_id AS code, round(d, 6) AS sqdist,
         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, code_id) AS rn
  FROM scored
) WHERE rn = 1
""",
)
def q_similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization, fully oracle-checked: 64-dim vectors ->
    4 subspaces x 8 seed-vector codewords, argmin-L2 assignment
    (operators/similarity.pq_codes). Completes the embedding
    compression family (int8 scalar quantization, IVF coarse cells,
    PQ fine codes) — sqdist folds are sequential in both engines, so
    codes AND distances hash-match bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.pq_codes(emb, dim=EMB_DIM, m=PQ_M, k=PQ_K)


@query(
    "similarity_pq_adc_topk",
    oracle=f"""
WITH {_V},
{_PQ_SUBS},
cb AS (SELECT vec_id AS code_id, subspace, sv AS cv FROM sub WHERE vec_id < {PQ_K}),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT s.vec_id, s.subspace, cb.code_id AS code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.subspace
                              ORDER BY {_SQD.format(a="s.sv", b="cb.cv")}, cb.code_id) AS rn
    FROM sub s JOIN cb USING (subspace)
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, q.subspace, cb.code_id,
         {_SQD.format(a="q.sv", b="cb.cv")} AS d
  FROM sub q JOIN cb USING (subspace)
  WHERE q.vec_id < {N_QUERIES}
),
hits AS (
  SELECT lut.query_id, codes.vec_id, codes.subspace AS s, lut.d
  FROM codes JOIN lut ON codes.subspace = lut.subspace AND codes.code = lut.code_id
),
agg AS (
  SELECT query_id, vec_id,
         {" + ".join(f"SUM(CASE WHEN s = {s} THEN d END)" for s in range(PQ_M))} AS adist
  FROM hits GROUP BY query_id, vec_id
)
SELECT query_id, neighbor_id, adist, rank FROM (
  SELECT query_id, vec_id AS neighbor_id, round(adist, 6) AS adist,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
  FROM agg WHERE vec_id <> query_id
) WHERE rank <= {TOP_K}
""",
)
def q_similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search via asymmetric distance computation: exact query
    subvectors score a broadcast (query x subspace x codeword) lookup
    table; each coded corpus vector's approximate distance is the
    fixed-order sum of its m LUT hits
    (operators/similarity.ann_topk_pq_adc). After the one-time coding
    pass, search never touches the float corpus — codes + LUT only."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_topk_pq_adc(emb, dim=EMB_DIM, n_queries=N_QUERIES, m=PQ_M, k=PQ_K, top_k=TOP_K)


@query(
    "similarity_ann_ivf_pq",
    oracle=f"""
WITH {_V},
{_PQ_SUBS},
cent AS (SELECT vec_id AS centroid_id, e AS cent FROM v WHERE vec_id < {N_CELLS}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, cent.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos("v.e", "cent.cent")} DESC, cent.centroid_id) AS rn
    FROM v CROSS JOIN cent
  ) WHERE rn = 1
),
cb AS (SELECT vec_id AS code_id, subspace, sv AS cv FROM sub WHERE vec_id < {PQ_K}),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT s.vec_id, s.subspace, cb.code_id AS code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.subspace
                              ORDER BY {_SQD.format(a="s.sv", b="cb.cv")}, cb.code_id) AS rn
    FROM sub s JOIN cb USING (subspace)
  ) WHERE rn = 1
),
qcell AS (SELECT vec_id AS query_id, cell AS qcell FROM assign WHERE vec_id < {N_QUERIES}),
lut AS (
  SELECT q.vec_id AS query_id, qcell.qcell, q.subspace, cb.code_id,
         {_SQD.format(a="q.sv", b="cb.cv")} AS d
  FROM sub q JOIN cb USING (subspace)
       JOIN qcell ON q.vec_id = qcell.query_id
  WHERE q.vec_id < {N_QUERIES}
),
hits AS (
  SELECT lut.query_id, codes.vec_id, codes.subspace AS s, lut.d
  FROM codes
       JOIN assign a ON codes.vec_id = a.vec_id
       JOIN lut ON codes.subspace = lut.subspace AND codes.code = lut.code_id
                AND a.cell = lut.qcell
),
agg AS (
  SELECT query_id, vec_id,
         {" + ".join(f"SUM(CASE WHEN s = {s} THEN d END)" for s in range(PQ_M))} AS adist
  FROM hits GROUP BY query_id, vec_id
)
SELECT query_id, neighbor_id, adist, rank FROM (
  SELECT query_id, vec_id AS neighbor_id, round(adist, 6) AS adist,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
  FROM agg WHERE vec_id <> query_id
) WHERE rank <= {TOP_K}
""",
)
def q_similarity_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN layout, fully
    oracle-checked end to end — deterministic seed-vector coarse
    centroids assign every vector a cell; PQ codes (same seed-vector
    codebooks as similarity_pq_codes) represent the corpus; search
    scores only the query's cell's codes against a broadcast ADC
    lookup table (operators/similarity.ann_topk_ivf_pq). Composes the
    two independently-verified index stages and proves the
    composition exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CELLS)
    return sim.ann_topk_ivf_pq(
        emb, centroids, dim=EMB_DIM, n_queries=N_QUERIES, m=PQ_M, k=PQ_K, top_k=TOP_K
    )


IVF_NPROBE = 2


@query(
    "similarity_ann_ivf_multiprobe",
    oracle=f"""
WITH {_V},
cent AS (SELECT vec_id AS centroid_id, e AS cent FROM v WHERE vec_id < {N_CELLS}),
ranked AS (
  SELECT v.vec_id, v.e, cent.centroid_id,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {_cos("v.e", "cent.cent")} DESC, cent.centroid_id) AS rn
  FROM v CROSS JOIN cent
),
assign AS (SELECT vec_id, e, centroid_id AS cell FROM ranked WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, e AS qe, centroid_id AS cell
  FROM ranked WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id, {_cos("qe", "a.e")} AS cos
  FROM assign a JOIN q USING (cell)
  WHERE a.vec_id <> query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
)
def q_similarity_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (nprobe=2), fully oracle-checked: each query
    searches the UNION of its two nearest cells — the standard recall
    knob over nprobe=1 (operators/similarity.ann_topk_ivf_multiprobe;
    tests pin recall(nprobe=2) >= recall(nprobe=1) against the exact
    baseline). Scan cost per query: nprobe x corpus / n_cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CELLS)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return sim.ann_topk_ivf_multiprobe(
        emb, queries, centroids, k=TOP_K, nprobe=IVF_NPROBE
    )


_PC1_ITERS = 6


def _pc1_oracle(n_iter: int) -> str:
    """DuckDB replica of power_iteration_pc1 (operators/clustering.py):
    quantize → exact Gram → 1/n rescale → n_iter rounded-decimal power
    steps. MATERIALIZED CTEs for the same fan-out reason as the BPE
    trainer oracle (each v/s CTE is referenced multiply per step).
    DuckDB list indexing / range laterals are 1-based; dim_idx is
    emitted 0-based to match posexplode."""
    head = """WITH qv AS MATERIALIZED (
  SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS aq
  FROM embeddings
),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM qv),
dd AS MATERIALIZED (SELECT len(aq) AS d FROM qv LIMIT 1),
sums AS MATERIALIZED (
  SELECT u.i AS i, CAST(SUM(aq[u.i]) AS DECIMAL(19,0)) AS sx
  FROM qv, UNNEST(range(1, len(aq) + 1)) AS u(i) GROUP BY 1
),
sxx AS MATERIALIZED (
  SELECT ui.i AS i, uj.j AS j, CAST(SUM(aq[ui.i] * aq[uj.j]) AS DECIMAL(30,0)) AS s
  FROM qv, UNNEST(range(1, len(aq) + 1)) AS ui(i), UNNEST(range(1, len(aq) + 1)) AS uj(j)
  GROUP BY 1, 2
),
g AS MATERIALIZED (
  SELECT x.i, x.j,
         CAST(ROUND(CAST(CAST((SELECT n FROM nn) AS DECIMAL(8,0)) * x.s - si.sx * sj.sx AS DOUBLE)
                    / (SELECT CAST(n AS DOUBLE) FROM nn), 0) AS DECIMAL(38,0)) AS g
  FROM sxx x JOIN sums si ON si.i = x.i JOIN sums sj ON sj.i = x.j
),
v0 AS MATERIALIZED (
  SELECT i AS j, ROUND(1.0 / sqrt((SELECT CAST(d AS DOUBLE) FROM dd)), 12) AS v FROM sums
)"""
    parts = [head]
    for k in range(1, n_iter + 1):
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT g.i, SUM(CAST(ROUND(CAST(g.g AS DOUBLE) * v.v, 0) AS DECIMAL(38,0))) AS s
  FROM g JOIN v{k - 1} v ON v.j = g.j GROUP BY 1
),
n{k} AS MATERIALIZED (
  SELECT sqrt(CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0) AS DECIMAL(38,0))) AS DOUBLE)) AS nm
  FROM s{k}
),
v{k} AS MATERIALIZED (
  SELECT i AS j, ROUND(CAST(s AS DOUBLE) / (SELECT nm FROM n{k}), 12) AS v FROM s{k}
)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(j - 1 AS INT) AS dim_idx, v AS pc1 FROM v{n_iter}"
    )


@query("embedding_pca_pc1", oracle=_pc1_oracle(_PC1_ITERS))
def q_embedding_pca_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal component of the embedding corpus by 6
    bit-deterministic power-iteration steps
    (operators/clustering.power_iteration_pc1) — covariance
    accumulation AND every iterate oracle-matched to the last bit.
    The drift/structure diagnostic beside the int8/PQ compression
    family; convergence onto a planted dominant direction is pinned
    by the unit test (the synthetic corpus here is near-isotropic, so
    the 6-step iterate — not a converged limit — is the contract)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return cl.power_iteration_pc1(vecs, n_iter=_PC1_ITERS)


def _ann_recall_oracle() -> str:
    """Both retrieval pipelines (exact brute force + LSH multiprobe) and
    the recall join, in one statement — every intermediate re-derived
    deterministically, so the evaluation METRIC itself is in the hash
    gate."""

    bucket = " + ".join(
        f"(CASE WHEN {_DOT.format(a='e', b=_plane_lit(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES8)
    )
    probes = ", ".join(
        ["CAST(qb AS BIGINT)"] + [f"xor(qb, {1 << i})" for i in range(ANN_LSH_BITS)]
    )
    return f"""
WITH {_V},
bk AS (SELECT vec_id, e, CAST({bucket} AS BIGINT) AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qb FROM bk WHERE vec_id < {N_QUERIES}),
probes AS (SELECT query_id, qe, unnest([{probes}]) AS bucket FROM q),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, bk.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_cos("qe", "bk.e")} DESC, bk.vec_id) AS rank
    FROM bk JOIN probes USING (bucket)
    WHERE bk.vec_id <> query_id
  ) WHERE rank <= {TOP_K}
),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, v.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_cos("qe", "v.e")} DESC, v.vec_id) AS rank
    FROM v CROSS JOIN q
    WHERE v.vec_id <> query_id
  ) WHERE rank <= {TOP_K}
)
SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN ann.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN ann.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ex LEFT JOIN ann ON ex.query_id = ann.query_id AND ex.neighbor_id = ann.neighbor_id
GROUP BY ex.query_id
"""


@query("similarity_ann_recall", oracle=_ann_recall_oracle())
def q_similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN EVALUATION LOOP as a first-class query: recall@{TOP_K}
    of the LSH multiprobe index against the exact brute-force top-k,
    per query — the metric every index-tuning run (nbits, nprobe, K)
    is judged by, computed on the engine rather than in a notebook.
    Both pipelines are deterministic (seeded hyperplanes, bit-exact
    cosine folds, total tie-break), so the metric itself hash-matches
    the DuckDB twin. NOTE the measured values on THIS corpus are low
    (0.0-0.3): the synthetic embeddings are near-isotropic, exactly
    the regime where hyperplane LSH cannot beat chance — an honest
    harness reports that; pytest separately pins a HIGH recall floor
    on planted clusters, the regime ANN indexes exist for.

    Scale: the exact side is the O(queries x corpus) baseline you run
    on a SAMPLE of queries (5 here); the ANN side probes ~corpus/2^b
    per query; the recall join is on two K-row-per-query tables —
    evaluation cost is set by the sample size, not the corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    ex = sim.brute_force_topk(emb, queries, k=TOP_K).select(
        "query_id", "neighbor_id"
    )
    ann = sim.ann_topk_lsh(
        emb, queries, dim=EMB_DIM, k=TOP_K, nbits=ANN_LSH_BITS
    ).select("query_id", F.col("neighbor_id").alias("ann_id"))
    j = ex.join(
        ann,
        (ex.query_id == ann.query_id) & (ex.neighbor_id == ann.ann_id),
        "left",
    ).select(ex.query_id, "neighbor_id", "ann_id")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.col("ann_id").isNotNull().cast("int")).cast("long").alias("n_hit"),
        (
            F.sum(F.col("ann_id").isNotNull().cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("recall"),
    )


# --- clustered-corpus recall (the regime ANN indexes exist for) -----
# The driver's synthetic embeddings are near-isotropic, so the honest
# recall readout above is low. This entry evaluates the SAME index on
# a clustered corpus DERIVED deterministically from the embeddings
# table in-query (no side fixture; both engines re-derive it):
# clustered vector = one-hot centroid on dimension (vec_id mod
# CL_MOD) + CL_EPS * original embedding — 16 well-separated cones
# with realistic within-cluster spread. Operating point tuned on this
# corpus: nbits=4 multiprobe examines ~5/16 of the corpus per query
# and lands mean recall@10 = 0.88 at sf0.01 (tests/test_similarity.py
# pins >= 0.8); more bits + more probes is the same knob at 100 TB.
CL_EPS = 0.3
CL_MOD = 16
CL_NBITS = 4
CL_QUERIES = 20
_V_CL = f"""v AS (
  SELECT vec_id,
         list_transform(generate_series(1, {EMB_DIM}),
           j -> {CL_EPS} * CAST(embedding AS DOUBLE[])[j]
                + CASE WHEN j - 1 = CAST(vec_id % {CL_MOD} AS BIGINT)
                       THEN 1.0 ELSE 0.0 END) AS e
  FROM embeddings)"""
_PLANES4 = sim._hyperplanes(EMB_DIM, CL_NBITS, seed=42)


def _ann_recall_clustered_oracle() -> str:
    bucket = " + ".join(
        f"(CASE WHEN {_DOT.format(a='e', b=_plane_lit(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES4)
    )
    probes = ", ".join(
        ["CAST(qb AS BIGINT)"] + [f"xor(qb, {1 << i})" for i in range(CL_NBITS)]
    )
    return f"""
WITH {_V_CL},
bk AS (SELECT vec_id, e, CAST({bucket} AS BIGINT) AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qb FROM bk WHERE vec_id < {CL_QUERIES}),
probes AS (SELECT query_id, qe, unnest([{probes}]) AS bucket FROM q),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, bk.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_cos("qe", "bk.e")} DESC, bk.vec_id) AS rank
    FROM bk JOIN probes USING (bucket)
    WHERE bk.vec_id <> query_id
  ) WHERE rank <= {TOP_K}
),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, v.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_cos("qe", "v.e")} DESC, v.vec_id) AS rank
    FROM v CROSS JOIN q
    WHERE v.vec_id <> query_id
  ) WHERE rank <= {TOP_K}
)
SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN ann.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN ann.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ex LEFT JOIN ann ON ex.query_id = ann.query_id AND ex.neighbor_id = ann.neighbor_id
GROUP BY ex.query_id
"""


def clusterized_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding double[]) — the derived clustered corpus."""
    e = F.col("embedding").cast("array<double>")
    cdim = (F.col("vec_id") % CL_MOD).cast("int")
    return emb.select(
        "vec_id",
        F.transform(
            e,
            lambda x, i: F.lit(CL_EPS) * x
            + F.when(i == cdim, F.lit(1.0)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )


@query("similarity_ann_recall_clustered", oracle=_ann_recall_clustered_oracle())
def q_similarity_ann_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOP_K} of the tuned LSH multiprobe index on a CLUSTERED
    corpus — the companion to similarity_ann_recall that proves the
    index delivers high recall in the regime it exists for (see the
    derivation comment above CL_EPS). Mean recall at sf0.01 is 0.88
    with 20 queries spanning all {CL_MOD} clusters; per-query recall
    rows hash-match the DuckDB twin, so the tuning claim itself is in
    the correctness gate.

    Scale shape identical to similarity_ann_recall: derivation is
    map-only and rides the scan; the ANN side probes {CL_NBITS + 1}
    of 2^{CL_NBITS} buckets (~5/16 of the corpus here — at 100 TB the
    same knob moves to more bits and more probes so the examined
    fraction keeps shrinking); evaluation cost is set by the query
    sample, never the corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    embc = clusterized_embeddings(emb)
    queries = embc.filter(F.col("vec_id") < CL_QUERIES)
    ex = sim.brute_force_topk(embc, queries, k=TOP_K).select(
        "query_id", "neighbor_id"
    )
    ann = sim.ann_topk_lsh(
        embc, queries, dim=EMB_DIM, k=TOP_K, nbits=CL_NBITS
    ).select("query_id", F.col("neighbor_id").alias("ann_id"))
    j = ex.join(
        ann,
        (ex.query_id == ann.query_id) & (ex.neighbor_id == ann.ann_id),
        "left",
    ).select(ex.query_id, "neighbor_id", "ann_id")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.col("ann_id").isNotNull().cast("int")).cast("long").alias("n_hit"),
        (
            F.sum(F.col("ann_id").isNotNull().cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("recall"),
    )


_V2 = "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings)"


HN_ANCHORS = 50  # anchor set: vec_id < 50


@query(
    "similarity_hard_negatives",
    oracle=f"""
WITH {_V2},
q AS (SELECT vec_id AS anchor_id, e AS qe, label AS anchor_label
      FROM v WHERE vec_id < {HN_ANCHORS}),
sc AS (
  SELECT anchor_id, anchor_label, v.vec_id AS neg_id, v.label AS neg_label,
         {_cos("qe", "v.e")} AS cos,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY {_cos("qe", "v.e")} DESC, v.vec_id) AS rn
  FROM v CROSS JOIN q
  WHERE v.vec_id <> anchor_id AND v.label <> anchor_label
)
SELECT CAST(anchor_id AS BIGINT) AS anchor_id,
       CAST(anchor_label AS BIGINT) AS anchor_label,
       CAST(neg_id AS BIGINT) AS hard_negative_id,
       CAST(neg_label AS BIGINT) AS negative_label,
       round(cos, 6) AS cosine
FROM sc WHERE rn = 1
""",
)
def q_similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data operator:
    for each anchor, the single most-similar vector carrying a
    DIFFERENT label (the negative that most confuses the current
    embedding, i.e. the one worth training on). Deterministic end to
    end (bit-exact cosine folds, total tie-breaks) so the mined pairs
    themselves hash-match the DuckDB twin.

    Scale: identical shape to similarity_topk_bruteforce — the anchor
    SAMPLE broadcasts onto one corpus scan, the label filter rides the
    join, and the per-anchor argmax is a window at anchor cardinality.
    At billions of vectors, swap the scan side for the IVF index
    (similarity_ann_ivf's partition-pruned layout) and mine negatives
    per probed cell — the operator's join/argmax stages are unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    anchors = emb.filter(F.col("vec_id") < HN_ANCHORS)
    nn = sim.brute_force_topk(emb, anchors, k=1, exclude_label_col="label")
    truth = labels.select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label")
    )
    neg_labels = labels.select(
        F.col("vec_id").alias("hard_negative_id"),
        F.col("label").alias("negative_label"),
    )
    return (
        nn.select(
            F.col("query_id").cast("long").alias("anchor_id"),
            F.col("neighbor_id").cast("long").alias("hard_negative_id"),
            "cosine",
        )
        .join(truth, "anchor_id")
        .join(neg_labels, "hard_negative_id")
        .select(
            "anchor_id", "anchor_label", "hard_negative_id", "negative_label", "cosine"
        )
    )


KNN_K = 5
KNN_N_QUERIES = 50


@query(
    "similarity_knn_label_accuracy",
    oracle=f"""
WITH {_V2},
q AS (SELECT vec_id AS qid, e AS qe, label AS true_label FROM v WHERE vec_id < {KNN_N_QUERIES}),
sc AS (
  SELECT qid, true_label, v.label AS nl,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY {_cos("qe", "v.e")} DESC, v.vec_id) AS rn
  FROM v CROSS JOIN q
  WHERE v.vec_id <> qid
),
vote AS (
  SELECT qid, true_label, nl, COUNT(*) AS c FROM sc WHERE rn <= {KNN_K} GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, true_label, nl AS pred_label FROM (
    SELECT qid, true_label, nl,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, nl) AS r
    FROM vote
  ) WHERE r = 1
)
SELECT CAST(qid AS BIGINT) AS query_id, CAST(true_label AS BIGINT) AS true_label,
       CAST(pred_label AS BIGINT) AS pred_label,
       CAST(pred_label = true_label AS BOOLEAN) AS correct
FROM pred
""",
)
def q_similarity_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label voting ON the engine — the weak-supervision /
    label-propagation primitive: each of {KNN_N_QUERIES} held-out
    queries takes the majority label of its {KNN_K} nearest neighbors
    (ties to the smallest label), reported beside the true label.
    Deterministic end to end (bit-exact cosine folds, total
    tie-breaks), so predictions hash-match the DuckDB twin. On THIS
    corpus the labels are only weakly embedded (accuracy ~14% vs 10%
    chance) — the honest readout; pytest pins >=90% on planted
    clusters, the regime the primitive exists for.

    Scale: identical shape to similarity_ann_recall — a broadcast
    query sample against one corpus scan; the vote runs on K rows per
    query. Swap the brute-force stage for ann_topk_* and the vote is
    unchanged (index-accelerated labeling).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_N_QUERIES)
    nn = sim.brute_force_topk(emb, queries, k=KNN_K).select(
        "query_id", "neighbor_id"
    )
    labels = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    votes = (
        nn.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("label"))
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    ).filter(F.col("query_id") < KNN_N_QUERIES)
    return (
        pred.join(truth, "query_id")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "true_label",
            "pred_label",
            (F.col("pred_label") == F.col("true_label")).alias("correct"),
        )
    )


@query(
    "embedding_label_centroid_cosines",
    oracle=f"""
WITH v AS (
  SELECT label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS aq
  FROM embeddings
),
cells AS (
  SELECT label, u.i AS i, SUM(aq[u.i]) AS s
  FROM v, UNNEST(range(1, len(aq) + 1)) AS u(i)
  GROUP BY 1, 2
),
cent AS (
  SELECT label, list(CAST(s AS DOUBLE) ORDER BY i) AS c, COUNT(*) AS d
  FROM cells GROUP BY label
),
n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1)
SELECT a.label AS label_a, b.label AS label_b,
       na.n AS n_a, nb.n AS n_b,
       round({_cos("a.c", "b.c")}, 6) AS centroid_cosine
FROM cent a JOIN cent b ON a.label < b.label
JOIN n na ON na.label = a.label
JOIN n nb ON nb.label = b.label
""",
)
def q_embedding_label_centroid_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability diagnostic: pairwise cosine between the
    per-label centroid directions — the 10x10 confusability readout an
    embedding-quality audit starts with (centroids near cosine 1 ⇒
    labels not linearly separable in this space; on THIS corpus
    |cos| stays under ~0.37 — weakly-separated classes, the honest
    answer matching the weak kNN accuracy).
    Cosine of the per-label SUM vectors equals cosine of means (scale
    invariance), so after integer micro-unit quantization the whole
    statement is exact sums + one deterministic fold — hash-exact.

    Scale: one posexplode pass with map-side partial sums → the
    exchange carries labels x d rows; the pair matrix is
    labels²/2 rows of d-length arrays — constant-size for any corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    aq = emb.select(
        "label",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"
        ).alias("aq"),
    )
    cells = (
        aq.select("label", F.posexplode("aq").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"))
    )
    cent = cells.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "s"))), lambda t: t["s"].cast("double")
        ).alias("c")
    )
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    a = cent.join(n, "label").select(
        F.col("label").alias("label_a"), F.col("c").alias("ca"), F.col("n").alias("n_a")
    )
    b = cent.join(n, "label").select(
        F.col("label").alias("label_b"), F.col("c").alias("cb"), F.col("n").alias("n_b")
    )
    from mock_map_reduce_spark.operators.similarity import cosine

    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(cosine(F.col("ca"), F.col("cb")), 6).alias("centroid_cosine"),
        )
    )
