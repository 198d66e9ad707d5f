"""Dedup catalog — exact, MinHash-LSH, n-gram Jaccard, SimHash, clusters.

Oracle strategy: the MinHash pipeline is built on md5 (bit-identical
in Spark and DuckDB), so even the LSH *candidate generation* is
oracle-checked — the DuckDB twin re-derives shingles, signatures,
band buckets, and pairs in SQL. SimHash depends on xxhash64 (no
DuckDB twin) and connected components is iterative, so those two are
rows-only here and pinned by pytest with planted duplicates.

Shared constants: 3-word shingles, 16 hashes, 4 bands — at the data's
planted-duplicate similarity (~0.99 Jaccard) detection probability is
~1, while ~0.025-Jaccard background pairs almost never band-collide
(4e-7 per band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.functions.materialize import materialize
from mock_map_reduce_spark.operators import dedup as dd
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

NGRAM = 3
NUM_HASHES = 16
BANDS = 4
JACCARD_THRESHOLD = 0.5

# --- shared oracle CTE fragments -------------------------------------------

_TOKS = """
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS w
  FROM documents
)"""

_GRAMS = f"""
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {NGRAM - 1}, 0) + 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
  FROM toks
)"""

# Chunked-md5: hash function i = 8-hex-char substring chunk (i % 4) of
# md5 seeded by (i // 4) — mirrors operators/dedup.minhash_signatures.
# (md5 hex is 32 chars -> exactly four 8-char chunks per digest.)
_SIG_COLS = ",\n         ".join(
    f"min(substring(md5('{i // 4}|' || gram), {1 + 8 * (i % 4)}, 8)) AS h{i}"
    for i in range(NUM_HASHES)
)
_SIGS = f"""
sigs AS (
  SELECT doc_id,
         {_SIG_COLS}
  FROM grams GROUP BY doc_id
)"""

_ROWS_PER_BAND = NUM_HASHES // BANDS
_BANDS = "bands AS (\n" + "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band_idx, md5({concat}) AS bucket FROM sigs".format(
        b=b,
        concat=" || ".join(f"h{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)),
    )
    for b in range(BANDS)
) + "\n)"

# LSH candidate pairs — shared between the estimate/cluster oracles.
_CAND = """
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""

# Candidate-first exact-Jaccard verify: attach each side's FULL gram
# set as a list and intersect in-row. Mirrors _fuzzy_components'
# candidate-first shape (catalog/dedup.py) and is the memory-bounded
# formulation: both joins build on the 1-row-per-doc glist (bounded),
# the candidate list streams through as the probe side. The previous
# gram-level self-join materialized C(doc_freq, 2) rows per gram
# BEFORE any candidate filter — at the sf10 stress corpus (every base
# shingle in 100 docs) that intermediate is ~1.2B rows and the oracle
# became the bottleneck the engine plan had already designed away.
_GLIST = """
glist AS MATERIALIZED (SELECT doc_id, list(gram) AS gs, count(*) AS ng FROM grams GROUP BY doc_id)"""

_EDGES_VERIFIED = f"""
edges AS MATERIALIZED (
  SELECT id_a, id_b
  FROM cand
  JOIN glist ga ON id_a = ga.doc_id
  JOIN glist gb ON id_b = gb.doc_id
  WHERE CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
        / (ga.ng + gb.ng - len(list_intersect(ga.gs, gb.gs))) >= {JACCARD_THRESHOLD}
)"""


def _min_prop_comp(k: int = 12) -> str:
    """CTE chain ``sym -> comp`` by K unrolled min-label-propagation
    rounds + a convergence probe.

    Replaces the recursive transitive-closure CTE (``reach``): that
    formulation materializes every (node, reachable-node) pair —
    O(cluster_size²) rows — and its per-iteration join is
    O(edges × degree). On the sf10 stress corpus (100-member near-dup
    cliques, ~25M edges) DuckDB spilled >70 GB and died; label
    propagation is O(edges) per round and converges in
    eccentricity(min-node) ≤ K rounds. ``nonconv`` feeds the callers'
    sentinel UNION: if labels still move between rounds K and K+1 the
    oracle emits an impossible extra row and the gate fails LOUDLY
    instead of silently under-merging. Exactly the fixpoint the engine
    side iterates (operators/dedup.connected_components), so agreement
    is bit-for-bit.

    Every step CTE is AS MATERIALIZED: DuckDB 1.0 inlines CTEs at each
    reference, and l_{i+1} reads l_i twice — inlining would copy the
    whole upstream pipeline 2^K times (observed as a "too many open
    files" plan explosion before any row flowed).
    """
    steps = [
        "l0 AS MATERIALIZED (SELECT s AS n, least(s, min(t)) AS lab FROM sym GROUP BY s)"
    ]
    for i in range(1, k + 2):
        steps.append(
            f"l{i} AS MATERIALIZED (\n"
            f"  SELECT c.n, least(min(c.lab), coalesce(min(p.lab), min(c.lab))) AS lab\n"
            f"  FROM l{i - 1} c\n"
            f"  LEFT JOIN sym e ON c.n = e.t\n"
            f"  LEFT JOIN l{i - 1} p ON e.s = p.n\n"
            f"  GROUP BY c.n\n"
            f")"
        )
    return (
        ",\n".join(steps)
        + f""",
nonconv AS (
  SELECT 1 AS bad FROM l{k} a JOIN l{k + 1} b ON a.n = b.n AND a.lab <> b.lab LIMIT 1
),
comp AS MATERIALIZED (
  SELECT doc_id, coalesce(l.lab, doc_id) AS component
  FROM documents LEFT JOIN l{k + 1} l ON doc_id = l.n
)"""
    )


@query(
    "dedup_exact",
    oracle="""
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via sha2 digest groupBy (scale: shuffles 32-byte keys)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup_groups(docs).select("keep_id", "n_copies")


@query(
    "dedup_exact_survivors",
    oracle="""
SELECT doc_id, n_chars FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
""",
)
def q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs).select("doc_id", "n_chars")


@query(
    "dedup_minhash_signatures",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
{_SIGS}
SELECT doc_id, h0, h7, h15 FROM sigs
""",
)
def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (3 of 16 columns projected for the compare)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = dd.minhash_signatures(docs, NUM_HASHES, NGRAM, use_md5=True)
    return sig.select("doc_id", "h0", "h7", "h15")


@query(
    "dedup_lsh_candidates",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
{_SIGS},
{_BANDS}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a
JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.doc_id < b.doc_id
""",
)
def q_dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH candidate generation, oracle-checked end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.lsh_candidate_pairs(docs, NUM_HASHES, BANDS, NGRAM, use_md5=True)


MAX_DOC_FREQ = 64  # stop-shingle cap: bounds any shingle's join fan-out to 64^2


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
stop AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > {MAX_DOC_FREQ}),
kept AS (SELECT doc_id, gram FROM grams ANTI JOIN stop USING (gram)),
sizes AS (SELECT doc_id, count(*) AS ng FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
  FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(ns AS DOUBLE) / (sa.ng + sb.ng - ns) AS jaccard
FROM shared
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(ns AS DOUBLE) / (sa.ng + sb.ng - ns) >= {JACCARD_THRESHOLD}
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.5 — finds the corpus's planted near-dups.

    The exposed form is skew-bounded by default: shingles in more than
    MAX_DOC_FREQ docs are stop-listed out of both the intersection and
    the set sizes (the oracle applies the same filter), so no single
    viral shingle can fan the inverted-index join out past 64² rows —
    the module's own 100 TB note, now on by default.
    """
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        docs, NGRAM, JACCARD_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
    )


@query(
    "dedup_minhash_jaccard_estimate",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
{_SIGS},
{_BANDS},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
m AS (
  SELECT c.id_a, c.id_b,
         (CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END) + (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END) + (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END) + (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END) + (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END) + (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END) + (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END) + (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END) + (CASE WHEN sa.h8 = sb.h8 THEN 1 ELSE 0 END) + (CASE WHEN sa.h9 = sb.h9 THEN 1 ELSE 0 END) + (CASE WHEN sa.h10 = sb.h10 THEN 1 ELSE 0 END) + (CASE WHEN sa.h11 = sb.h11 THEN 1 ELSE 0 END) + (CASE WHEN sa.h12 = sb.h12 THEN 1 ELSE 0 END) + (CASE WHEN sa.h13 = sb.h13 THEN 1 ELSE 0 END) + (CASE WHEN sa.h14 = sb.h14 THEN 1 ELSE 0 END) + (CASE WHEN sa.h15 = sb.h15 THEN 1 ELSE 0 END) AS n_match
  FROM cand c JOIN sigs sa ON c.id_a = sa.doc_id JOIN sigs sb ON c.id_b = sb.doc_id
),
cids AS (SELECT id_a AS doc_id FROM cand UNION SELECT id_b AS doc_id FROM cand),
cg AS (SELECT g.doc_id, g.gram FROM grams g SEMI JOIN cids USING (doc_id)),
stop AS (SELECT gram FROM cg GROUP BY gram HAVING count(*) > {MAX_DOC_FREQ}),
kept AS (SELECT doc_id, gram FROM cg ANTI JOIN stop USING (gram)),
sizes AS (SELECT doc_id, count(*) AS ng FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
  FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT m.id_a, m.id_b, CAST(m.n_match AS BIGINT) AS n_match,
       CAST(m.n_match AS DOUBLE) / 16 AS est_jaccard,
       COALESCE(CAST(s.ns AS DOUBLE) / (za.ng + zb.ng - s.ns), 0.0) AS jaccard
FROM m
LEFT JOIN shared s ON m.id_a = s.id_a AND m.id_b = s.id_b
LEFT JOIN sizes za ON m.id_a = za.doc_id
LEFT JOIN sizes zb ON m.id_b = zb.doc_id
""",
)
def q_dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash THEOREM made checkable: for every LSH candidate
    pair, the signature agreement fraction (n_match/16) next to the
    exact n-gram Jaccard — estimator and estimand both engine-exact
    (md5 signatures and integer set counts), so the whole statement
    hash-matches bit-for-bit rather than through a tolerance band.
    test_dedup asserts the estimator's accuracy on planted pairs; this
    entry puts the comparison itself in the hard gate. Plan: the
    signature agg and the gram posting machinery are the same
    exchanges the LSH and Jaccard queries already take, and the
    exact-Jaccard side runs ONLY over docs appearing in some LSH
    candidate pair (doc-level semi-join before shingling), and applies
    the same MAX_DOC_FREQ stop-shingle cap as dedup_ngram_jaccard —
    within the candidate subset — so even a viral boilerplate shingle
    *inside* the candidate set cannot fan out quadratically in
    candidate count. The oracle mirrors both: its kept CTE re-derives
    the capped shingle sets over the candidate docs.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the signature pipeline ONCE; the candidate generation
    # reuses it instead of re-running shingle+md5 from the raw corpus.
    sigs = materialize(dd.minhash_signatures(docs, NUM_HASHES, NGRAM, use_md5=True))
    cand = materialize(dd.lsh_candidate_pairs(
        docs, NUM_HASHES, BANDS, NGRAM, use_md5=True, signatures=sigs
    ))
    cand_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    jac = dd.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents").join(cand_ids, "doc_id", "left_semi"),
        NGRAM,
        threshold=0.0,
        max_doc_freq=MAX_DOC_FREQ,
    )
    sa = sigs.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(16)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(16)]
    )
    n_match = None
    for i in range(16):
        term = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        n_match = term if n_match is None else n_match + term
    m = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", n_match.cast("long").alias("n_match")
    )
    return m.join(jac, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "n_match",
        (F.col("n_match").cast("double") / F.lit(16)).alias("est_jaccard"),
        F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jaccard"),
    )


CONTAINMENT_THRESHOLD = 0.8


@query(
    "dedup_ngram_containment",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
stop AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > {MAX_DOC_FREQ}),
kept AS (SELECT doc_id, gram FROM grams ANTI JOIN stop USING (gram)),
sizes AS (SELECT doc_id, count(*) AS ng FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
  FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ns AS n_shared, sa.ng AS na, sb.ng AS nb,
       CAST(ns AS DOUBLE) / least(sa.ng, sb.ng) AS containment
FROM shared
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(ns AS DOUBLE) / least(sa.ng, sb.ng) >= {CONTAINMENT_THRESHOLD}
""",
)
def q_dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment >= 0.8: n_shared / min(|A|, |B|).

    Catches the subset near-dups Jaccard misses — a short document
    embedded in a long one (quotes, boilerplate wrappers) has a large
    union, so jaccard stays low while containment approaches 1. Same
    skew-bounded grouped posting-list plan as dedup_ngram_jaccard
    (the exchange is shared when both run); ratios of exact integer
    counts, bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_containment_pairs(
        docs, NGRAM, CONTAINMENT_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
    )


# --- SimHash oracle fragments ----------------------------------------------
# md5-nibble bit pattern (operators/dedup.simhash use_md5=True): bit b of
# a token's 64-bit hash = bit (b%4) of hex nibble (b//4) of md5(tok).
# Bit 63's power of two is written as the two's-complement MIN_BIGINT
# literal — DuckDB raises on `1::BIGINT << 63` where Spark's shiftleft
# wraps; the SUM of distinct powers (one possibly negative) stays in
# int64 range in both engines.

_TOK_OCC = """
tokocc AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS tok
  FROM documents
)"""

_SIMHASH = """
votes AS (
  SELECT doc_id, bits.bit,
         CASE WHEN ((strpos('0123456789abcdef', substring(md5(tok), CAST(bits.bit // 4 + 1 AS INT), 1)) - 1)
                    >> (bits.bit % 4)) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM tokocc CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) bits
),
tallies AS (SELECT doc_id, bit, SUM(vote) AS tally FROM votes GROUP BY doc_id, bit),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN tally > 0 THEN
                    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                         ELSE (1::BIGINT << CAST(bit AS INT)) END
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM tallies GROUP BY doc_id
)"""


@query(
    "dedup_simhash",
    oracle=f"WITH {_TOK_OCC},\n{_SIMHASH}\nSELECT doc_id, simhash FROM sh",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash digests, oracle-checked end-to-end via the
    md5-nibble hash (the xxhash64 fast path stays the operator
    default; pytest pins its planted-dup behavior)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, use_md5=True)


@query(
    "dedup_simhash_candidates",
    oracle=f"""
WITH {_TOK_OCC},
{_SIMHASH},
blocks AS (
  SELECT doc_id, bands.band,
         (simhash >> CAST(bands.band * 16 AS INT)) & 65535 AS bucket
  FROM sh CROSS JOIN (SELECT unnest(range(0, {BANDS})) AS band) bands
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM blocks a JOIN blocks b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
""",
)
def q_dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-LSH candidates over 16-bit SimHash blocks — shift-mask
    block extraction is engine-agnostic (low 16 bits of a right shift
    are identical under arithmetic or logical semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_candidate_pairs(docs, BANDS, use_md5=True)


@query(
    "dedup_clusters",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
{_SIGS},
{_BANDS},
{_CAND.strip()},
sym AS MATERIALIZED (SELECT id_a AS s, id_b AS t FROM cand UNION SELECT id_b, id_a FROM cand),
{_min_prop_comp()},
sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
SELECT doc_id, component, cluster_size
FROM comp JOIN sizes USING (component)
WHERE cluster_size > 1
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) FROM nonconv
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: LSH candidates -> connected components.

    Returns only docs whose component differs from themselves or that
    head a multi-doc cluster (i.e., docs involved in duplication).

    Oracle: the md5-chunk LSH candidate edges are re-derived in SQL
    (same fragments as ``dedup_lsh_candidates``) and the iterative
    label propagation is checked against an unrolled min-label
    propagation with a convergence sentinel (``_min_prop_comp``) —
    component = smallest reachable doc_id, so the two fixpoints must
    agree exactly (same strategy that already oracle-checks
    ``dedup_fuzzy_survivors``).
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = dd.lsh_candidate_pairs(docs, NUM_HASHES, BANDS, NGRAM, use_md5=True)
    comp = dd.connected_components(edges, docs.select("doc_id"))
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .filter(F.col("cluster_size") > 1)
        .select("doc_id", "component", "cluster_size")
    )


@query(
    "dedup_fuzzy_survivors",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
{_SIGS},
{_BANDS},
{_CAND.strip()},
{_GLIST.strip()},
{_EDGES_VERIFIED.strip()},
sym AS MATERIALIZED (SELECT id_a AS s, id_b AS t FROM edges UNION SELECT id_b, id_a FROM edges),
{_min_prop_comp()}
SELECT min(doc_id) AS keep_id, count(*) AS cluster_size
FROM comp GROUP BY component
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) FROM nonconv
""",
)
def q_dedup_fuzzy_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fuzzy-dedup pipeline as ONE oracle-checked query:

    LSH candidates -> exact-Jaccard verify (>= 0.5) -> connected
    components -> one surviving (min-id) doc per duplicate cluster.
    The DuckDB twin re-derives the SAME pipeline candidate-first (LSH
    cand -> in-row list_intersect verify -> unrolled min-label
    propagation with a convergence sentinel) — the engine's iterative
    label propagation and the SQL fixpoint must agree exactly. (The
    earlier all-pairs-Jaccard oracle coincided only while every
    near-dup was an exact replica; with genuine 0.5<=j<1 pairs the
    pipeline's LSH recall <1 makes candidate-first the true twin.)

    100 TB shape: candidates come from LSH (never all-pairs); the
    Jaccard verify only scores candidate pairs; components iterate on
    the (tiny) duplicate-edge list, not the corpus.
    """
    comp = _fuzzy_components(spark, sf_dir)
    return comp.groupBy("component").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("cluster_size")
    ).select("keep_id", "cluster_size")


def _fuzzy_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) via LSH candidates -> Jaccard verify ->
    connected components — the shared head of the fuzzy-survivor
    queries."""
    docs = load_table(spark, sf_dir, "documents")
    cand = dd.lsh_candidate_pairs(docs, NUM_HASHES, BANDS, NGRAM, use_md5=True)
    grams = dd.shingles(docs, NGRAM)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("ng"))
    # CANDIDATE-FIRST verification (round-8 scale fix): expand each
    # candidate pair by id_a's grams, then equi-join id_b's grams on
    # (id_b, gram) — intersection size per candidate pair. Cost is
    # |cand| x grams-per-doc, linear in the candidate list. The
    # previous shape (full gram self-join, THEN semi-join on cand)
    # materialized C(df,2) rows for EVERY gram before the candidate
    # filter could apply — a single viral gram with doc-frequency df
    # pays quadratically whether or not its pairs are candidates; at
    # the sf10 100x-replica stress corpus (every gram df >= 100) that
    # plan filled the shuffle disk. Candidate-first never touches a
    # pair LSH didn't nominate.
    ga = grams.select(F.col("doc_id").alias("id_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("id_b"), "gram")
    shared = (
        cand.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("ns"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("ng").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("ng").alias("nb"))
    edges = (
        shared.join(sa, "id_a").join(sb, "id_b")
        .filter(
            F.col("ns").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ns")).cast("double")
            >= JACCARD_THRESHOLD
        )
        .select("id_a", "id_b")
    )
    return dd.connected_components(edges, docs.select("doc_id"))


# --- benchmark decontamination ---------------------------------------------

CONTAM_NGRAM = 4  # n=4 keeps the check selective but non-degenerate on the corpus
BENCH_MAX_ID = 10  # docs with doc_id < 10 play the "benchmark/eval set"

_GRAMS_C = f"""
grams_c AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {CONTAM_NGRAM - 1}, 0) + 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS gram
  FROM toks
)"""


@query(
    "dedup_contamination",
    oracle=f"""
WITH {_TOKS},
{_GRAMS_C},
bench AS (SELECT DISTINCT gram FROM grams_c WHERE doc_id < {BENCH_MAX_ID}),
corp AS (SELECT doc_id, gram FROM grams_c WHERE doc_id >= {BENCH_MAX_ID}),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id),
shared AS (
  SELECT c.doc_id, count(*) AS n_shared_grams
  FROM corp c JOIN bench USING (gram) GROUP BY c.doc_id
)
SELECT s.doc_id, n_shared_grams, n_grams,
       CAST(n_shared_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_ratio
FROM shared s JOIN sizes USING (doc_id)
""",
)
def q_dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any CONTAM_NGRAM-gram with
    the eval set (doc_id < 10). The DISTINCT benchmark gram set
    broadcasts, so detection rides the corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < BENCH_MAX_ID)
    corpus = docs.filter(F.col("doc_id") >= BENCH_MAX_ID)
    return dd.benchmark_contamination(corpus, bench, n=CONTAM_NGRAM)


@query(
    "dedup_incremental_candidates",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
{_SIGS},
{_BANDS}
SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
FROM bands a
JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
""",
)
def q_dedup_incremental_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-index) LSH dedup: odd doc_ids play the
    newly-ingested batch, even doc_ids the existing corpus index. Only
    cross-set band collisions are emitted — the index never re-pairs
    against itself (operators/dedup.incremental_lsh_candidates; the
    oracle re-derives the same cross-set join over the md5 band
    buckets)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index = docs.filter(F.col("doc_id") % 2 == 0)
    return dd.incremental_lsh_candidates(batch, index, NUM_HASHES, BANDS, NGRAM, use_md5=True)


# Quality-aware survivor selection: same duplicate clusters as
# dedup_fuzzy_survivors, but each cluster keeps its HIGHEST-QUALITY
# member (the curation practice: min-id keeps an arbitrary doc; a
# trained-corpus pipeline keeps the best one). The oracle composes the
# candidate-first cluster derivation (LSH cand -> list-intersect
# verify -> unrolled min-label propagation) with the quality-score
# chain shared with catalog/textops (its toks CTE also carries
# `text`, which the gram chain below tolerates).
from mock_map_reduce_spark.catalog import textops as _textops  # noqa: E402
from mock_map_reduce_spark.operators import text as tx  # noqa: E402

_GRAMS_FROM_QTOKS = f"""
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {NGRAM - 1}, 0) + 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
  FROM toks
)"""


@query(
    "dedup_survivors_by_quality",
    oracle=f"""
WITH {_textops._QUALITY_CTES},
{_GRAMS_FROM_QTOKS},
{_SIGS},
{_BANDS},
{_CAND.strip()},
{_GLIST.strip()},
{_EDGES_VERIFIED.strip()},
sym AS MATERIALIZED (SELECT id_a AS s, id_b AS t FROM edges UNION SELECT id_b, id_a FROM edges),
{_min_prop_comp()},
q AS (
  SELECT doc_id,
         round(least(mean_word_len / 8.0, 1.0) * 0.25
               + least(stop_ratio * 4.0, 1.0) * 0.25
               + alpha_ratio * 0.25
               + distinct_ratio * 0.25, 6) AS quality_score
  FROM ratios
),
ranked AS (
  SELECT component, comp.doc_id, quality_score,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY quality_score DESC, comp.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS cluster_size
  FROM comp JOIN q ON comp.doc_id = q.doc_id
)
SELECT doc_id AS keep_id, cluster_size, quality_score AS keep_quality
FROM ranked WHERE rn = 1
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS DOUBLE) FROM nonconv
""",
)
def q_dedup_survivors_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup survivors chosen by QUALITY: LSH -> Jaccard ->
    connected components (shared head with dedup_fuzzy_survivors),
    then each duplicate cluster keeps its highest-quality member
    (tie -> smallest doc_id) using the same score as text_quality.

    One groupBy(component) with a max-struct argmax — no window sort;
    the struct's (-doc_id) middle field turns the tie-break into plain
    struct ordering. Corpus-scale inputs only flow through the
    already-bounded dedup head; the quality join carries (id, score).
    """
    comp = _fuzzy_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    quality = tx.quality_score(docs).select("doc_id", "quality_score")
    joined = comp.join(quality, "doc_id")
    agg = joined.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.max(
            F.struct(
                F.col("quality_score"),
                (-F.col("doc_id")).alias("__nid"),
                F.col("doc_id").alias("doc_id"),
            )
        ).alias("best"),
    )
    return agg.select(
        F.col("best.doc_id").alias("keep_id"),
        "cluster_size",
        F.col("best.quality_score").alias("keep_quality"),
    )


SPAN_W = 8
SPAN_MAX_OCC = 64


@query(
    "dedup_substring_spans",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+{SPAN_W - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, len(w) - {SPAN_W} + 2)) AS u(i)
  WHERE len(w) >= {SPAN_W}
),
occ AS (SELECT gram, COUNT(*) AS n FROM grams GROUP BY 1),
dup AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN occ USING (gram)
  WHERE occ.n >= 2 AND occ.n <= {SPAN_MAX_OCC}
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w2 IS NULL OR pos > lag(pos) OVER w2 + {SPAN_W} THEN 1 ELSE 0 END AS new
  FROM dup WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
),
spans AS (
  SELECT doc_id, pos, SUM(new) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {SPAN_W - 1} AS span_end,
       MAX(pos) + {SPAN_W} - MIN(pos) AS span_words
FROM spans GROUP BY doc_id, sid
""",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (operators/dedup.duplicate_spans):
    per doc, every maximal word range all of whose {SPAN_W}-word windows
    occur >= 2 times corpus-wide — the Lee et al. 2022 ExactSubstr dedup
    re-expressed as a positional w-gram groupBy + per-doc span merge, so
    the "remove the repeated substring, keep the rest of the doc"
    curation move has an engine primitive. Integer word positions only —
    hash-exact. Stop-gram cap (occurrences > {SPAN_MAX_OCC}) mirrors the
    oracle and bounds any viral boilerplate window's reducer."""
    return dd.duplicate_spans(
        load_table(spark, sf_dir, "documents"), w=SPAN_W, max_occ=SPAN_MAX_OCC
    )


RECALL_FLOOR = 0.1  # ground-truth pair floor for the recall audit


@query(
    "dedup_lsh_recall_by_jaccard",
    oracle=f"""
WITH {_TOKS},
{_GRAMS},
stop AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > {MAX_DOC_FREQ}),
kept AS (SELECT doc_id, gram FROM grams ANTI JOIN stop USING (gram)),
sizes AS (SELECT doc_id, count(*) AS ng FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
  FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b, CAST(ns AS DOUBLE) / (sa.ng + sb.ng - ns) AS jaccard
  FROM shared
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE CAST(ns AS DOUBLE) / (sa.ng + sb.ng - ns) >= {RECALL_FLOOR}
),
{_SIGS},
{_BANDS},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
j AS (
  SELECT t.jaccard,
         CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS caught
  FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
)
SELECT least(CAST(floor(jaccard * 5) AS BIGINT), 4) AS j_bucket,
       count(*) AS n_pairs,
       CAST(sum(caught) AS BIGINT) AS n_caught,
       CAST(sum(caught) AS DOUBLE) / count(*) AS recall
FROM j GROUP BY 1
""",
)
def q_dedup_lsh_recall_by_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall audit — the measurement a 100 TB dedup run makes
    BEFORE trusting its candidate generation: empirical catch rate of
    the (16-hash, 4-band) MinHash-LSH per exact-Jaccard quintile,
    against the capped inverted-index ground truth (pairs >= 0.1).
    Theory says P(candidate | s) = 1 - (1 - s^4)^4 — near-1 for the
    planted ~0.99 dups, tiny at background similarity; this query puts
    the S-curve itself in the hash gate (the dedup twin of
    similarity_ann_recall). Integer counts + one division per bucket;
    the bucket floor is over a single-division double — engine-exact.

    Scale: both inputs are the already-bounded parents (stop-shingle
    cap on truth, band-bucket generation on candidates); the audit
    join is pair-list x pair-list, a shadow of either parent's cost."""
    docs = load_table(spark, sf_dir, "documents")
    truth = dd.ngram_jaccard_pairs(
        docs, NGRAM, RECALL_FLOOR, max_doc_freq=MAX_DOC_FREQ
    )
    cand = dd.lsh_candidate_pairs(docs, NUM_HASHES, BANDS, NGRAM, use_md5=True)
    flagged = truth.join(
        cand.withColumn("caught", F.lit(1)), ["id_a", "id_b"], "left"
    )
    bucket = F.least(F.floor(F.col("jaccard") * 5), F.lit(4)).cast("long")
    return (
        flagged.groupBy(bucket.alias("j_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce(F.col("caught"), F.lit(0))).cast("long").alias("n_caught"),
        )
        .withColumn(
            "recall", F.col("n_caught").cast("double") / F.col("n_pairs")
        )
    )


def _prefix_filter_oracle(threshold: float) -> str:
    """Exact share-any-gram Jaccard join at ``threshold`` — ONE oracle
    body shared by both prefix-filter entries (they differ only in the
    operating threshold; round-8 VERDICT catalog hygiene)."""
    return f"""
WITH {_TOKS},
{_GRAMS},
stop AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > {MAX_DOC_FREQ}),
kept AS (SELECT doc_id, gram FROM grams ANTI JOIN stop USING (gram)),
sizes AS (SELECT doc_id, count(*) AS ng FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
  FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(ns AS DOUBLE) / (sa.ng + sb.ng - ns) AS jaccard
FROM shared
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(ns AS DOUBLE) / (sa.ng + sb.ng - ns) >= {threshold}
"""


@query(
    "dedup_prefix_filter_jaccard",
    oracle=_prefix_filter_oracle(JACCARD_THRESHOLD),
)
def q_dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PPJoin-family prefix-filtered Jaccard join — same contract
    as dedup_ngram_jaccard (same threshold, same stop-shingle cap,
    same output), but candidates come from an inverted index over
    PREFIX grams only: each doc drops its ceil(t*m) - 1 most-frequent
    grams before the join, provably losing no >=t pair. The oracle is
    the EXACT share-any-gram join — a single missed pair (a broken
    prefix bound, a wrong global order) fails the hash, making this
    the lossless-prune twin of join_bloom_pruned for set similarity.
    LSH (dedup_lsh_candidates) is the probabilistic alternative;
    tests/test_dedup.py pins this one generating strictly fewer
    candidates than the full inverted index on the same corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    return dd.prefix_filter_jaccard_pairs(
        docs, NGRAM, JACCARD_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
    )


STRICT_JACCARD = 0.8  # production near-dup threshold (the 0.7-0.9 regime)


@query(
    "dedup_prefix_filter_jaccard_strict",
    oracle=_prefix_filter_oracle(STRICT_JACCARD),
)
def q_dedup_prefix_filter_jaccard_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix-filter join at the PRODUCTION near-dup threshold
    (t=0.8, the 0.7-0.9 regime real crawl dedup runs at): each doc
    sheds its ceil(0.8*m) - 1 most frequent grams, leaving a ~m/5
    prefix — on this corpus a 29x-smaller candidate set than the full
    inverted index (vs 4x at the t=0.5 demonstration entry, whose
    docstring carries the regime analysis). Same lossless-prune
    contract, same exact share-any-gram oracle, stricter WHERE.
    This is the bench headliner for the family: t=0.5 exists to prove
    output-identity with dedup_ngram_jaccard on a shared threshold;
    t=0.8 is the operating point.
    """
    docs = load_table(spark, sf_dir, "documents")
    return dd.prefix_filter_jaccard_pairs(
        docs, NGRAM, STRICT_JACCARD, max_doc_freq=MAX_DOC_FREQ
    )
