"""Curation catalog — deterministic sampling, train/val/test splits,
sequence packing, stable shuffle, per-group top-k selection.

The LLM-training-pipeline surface a 100 TB curation job runs daily;
absent from the reference (its one query is word count — SURVEY §0).
Every entry is oracle-checked: the determinism primitive is an md5
prefix of the stringified row key, bit-identical in Spark and DuckDB,
so samples/splits/shuffles hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mock_map_reduce_spark.catalog.textops import _QUALITY_CTES
from mock_map_reduce_spark.operators import curation as cu, text as tx
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

_KEY = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"


@query(
    "curation_hash_sample",
    oracle=f"""
SELECT doc_id, n_chars FROM documents
WHERE {_KEY} < '1a'
""",
)
def q_curation_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample (md5-prefix threshold): map-only, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.hash_sample(docs, keep_lt="1a").select("doc_id", "n_chars")


@query(
    "curation_split_counts",
    oracle=f"""
WITH s AS (
  SELECT n_chars,
         CASE WHEN {_KEY} < 'cc' THEN 'train'
              WHEN {_KEY} < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
FROM s GROUP BY split
""",
)
def q_curation_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable ~80/10/10 train/val/test assignment, summarized per split.

    The exact-integer sum / count division keeps avg_chars
    order-independent (bit-identical across engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        cu.split_assign(docs)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 6
            ).alias("avg_chars"),
        )
    )


@query(
    "curation_pack_sequences",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_toks
  FROM documents
)
SELECT doc_id, shard, CAST(n_toks AS BIGINT) AS n_toks,
       CAST((sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_toks) // 1024 AS BIGINT) AS bin_id
FROM t
""",
)
def q_curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 1024-token sequence packing within 16 hash shards.

    Window partitions by shard — no global sort; scale the shard
    count by taking more md5 chars.
    """
    docs = load_table(spark, sf_dir, "documents")
    return cu.pack_sequences(docs, budget=1024)


@query(
    "curation_shuffled_head",
    oracle="""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id
LIMIT 100
""",
)
def q_curation_shuffled_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 docs of the stable pseudo-random order (TakeOrdered)."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.shuffled_head(docs, n=100)


@query(
    "curation_topk_per_language",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS w
  FROM documents
),
feat AS (
  SELECT doc_id, lang,
         len(w) AS n_toks,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(text) AS n_chars,
         len(list_distinct(w)) AS n_distinct
  FROM toks
),
q AS (
  SELECT doc_id, lang,
         round(least(CASE WHEN n_toks > 0 THEN CAST(n_alpha AS DOUBLE) / n_toks ELSE 0.0 END / 8.0, 1.0) * 0.25
               + least(CASE WHEN n_toks > 0 THEN CAST(s.n_stop AS DOUBLE) / n_toks ELSE 0.0 END * 4.0, 1.0) * 0.25
               + CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars ELSE 0.0 END * 0.25
               + CASE WHEN n_toks > 0 THEN CAST(n_distinct AS DOUBLE) / n_toks ELSE 0.0 END * 0.25,
               6) AS quality_score
  FROM feat
  JOIN (SELECT doc_id, len(list_filter(w, t -> list_contains({SW}, t))) AS n_stop
        FROM toks) s USING (doc_id)
)
SELECT doc_id, lang, quality_score, rn FROM (
  SELECT doc_id, lang, quality_score,
         row_number() OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS rn
  FROM q
) WHERE rn <= 5
""".replace("{SW}", "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"]) + "]"),
)
def q_curation_topk_per_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the 5 best-quality docs per language — quality scorer
    composed with a per-group bounded window selection.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang").join(
        tx.quality_score(docs).select("doc_id", "quality_score"), "doc_id"
    )
    return cu.topk_per_group(scored, "lang", "quality_score", k=5).select(
        "doc_id", "lang", "quality_score", "rn"
    )


# Target source mixture: keep all of src0, half of src1, a quarter of
# src2, 10% of everything else. Thresholds are computed by the SAME
# helper the operator uses, so Spark and the oracle can never drift.
MIXTURE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
MIXTURE_DEFAULT = 0.1


def _mix_thresh(rate: float) -> str:
    return "g" if rate >= 1.0 else format(max(int(rate * 65536), 0), "04x")


_MIX_CASE = (
    "CASE source "
    + " ".join(
        f"WHEN '{s}' THEN '{_mix_thresh(r)}'" for s, r in sorted(MIXTURE_RATES.items())
    )
    + f" ELSE '{_mix_thresh(MIXTURE_DEFAULT)}' END"
)


@query(
    "curation_mixture_sample",
    oracle=f"""
SELECT doc_id, source FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {_MIX_CASE}
""",
)
def q_curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture reweighting — the data-mixture
    knob of a training run (e.g. upweight curated sources, downsample
    crawl), map-only so it rides the 100 TB scan."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.mixture_sample(
        docs, MIXTURE_RATES, default_rate=MIXTURE_DEFAULT
    ).select("doc_id", "source")


# Budget divisor shared by the Spark call and the oracle SQL below —
# defined ONCE so the two sides cannot silently drift (round-8 ADVICE).
BUDGET_DEN = 10


@query(
    "curation_temperature_mixture",
    oracle=f"""
WITH c AS (
  SELECT source, count(*) AS n,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
  FROM documents GROUP BY source
),
t AS (SELECT sum(n) AS corpus_n, sum(w) AS denom FROM c),
q AS (
  SELECT c.source,
         least(c.n, ((t.corpus_n // {BUDGET_DEN}) * c.w) // t.denom) AS quota
  FROM c, t
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
SELECT r.doc_id, r.source
FROM r JOIN q ON r.source = q.source
WHERE r.rn <= q.quota
""",
)
def q_curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture (alpha = 1/2): per-source quotas
    proportional to sqrt(n_s) under a 10%-of-corpus budget — the
    alpha-sampling rebalance (XLM-R/mT5 style) that upweights small
    sources relative to the head. Distinct from curation_mixture_sample,
    whose rates are hand-pinned per source: here the mixture is DERIVED
    from the observed source histogram.

    Quota arithmetic is pure integers (isqrt via floor∘sqrt, integer
    mul/div) — no float sum whose addition order could flip a floor()
    across engines; selection is exact lowest-md5-rank per source."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.temperature_mixture(docs, budget_den=BUDGET_DEN)


@query(
    "curation_group_split_counts",
    oracle="""
WITH s AS (
  SELECT n_chars, source,
         CASE WHEN substring(md5(source), 1, 2) < 'cc' THEN 'train'
              WHEN substring(md5(source), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
""",
)
def q_curation_group_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP-level train/val/test split: the split key is
    md5(source), not md5(doc_id), so every document from a source
    lands in the same split. Near-duplicates cluster within a domain —
    a doc-level split leaks near-dup content from train into eval;
    keying the assignment by the group is the standard defense
    (dedup-aware eval splits). Pure reuse of split_assign with the
    group as the hash key: still map-only, rides the scan; integer
    count/sum aggregates keep the summary hash-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        cu.split_assign(docs, id_col="source")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# Epoch budget: curated src0 runs 2.5 epochs, src1 two, everything
# else half an epoch — exact rationals (p, q) so quotas are integer
# arithmetic in both engines.
EPOCH_RATES = {"src0": (5, 2), "src1": (2, 1)}
EPOCH_DEFAULT = (1, 2)

_EPOCH_P = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {p}" for s, (p, _) in sorted(EPOCH_RATES.items()))
    + f" ELSE {EPOCH_DEFAULT[0]} END"
)
_EPOCH_Q = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {q}" for s, (_, q) in sorted(EPOCH_RATES.items()))
    + f" ELSE {EPOCH_DEFAULT[1]} END"
)


@query(
    "curation_epoch_upsample",
    oracle=f"""
WITH c AS (
  SELECT source, count(*) AS n,
         ({_EPOCH_P}) AS p, ({_EPOCH_Q}) AS q
  FROM documents GROUP BY source
),
e AS (
  SELECT source, n,
         ((n * p) // q) // n AS "full",
         ((n * p) // q) % n AS rem
  FROM c
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
),
fulls AS (
  SELECT r.doc_id, r.source, CAST(unnest(range(0, e."full")) AS BIGINT) AS epoch
  FROM r JOIN e USING (source)
),
rems AS (
  SELECT r.doc_id, r.source, CAST(e."full" AS BIGINT) AS epoch
  FROM r JOIN e USING (source) WHERE r.rn <= e.rem
)
SELECT * FROM fulls UNION ALL SELECT * FROM rems
""",
)
def q_curation_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch repetition budget — the hand-tuned mix knob of
    a pretraining run (curated sources repeated 2-3 epochs, crawl
    undersampled): quota_s = (n_s * p) div q docs per source, realized
    as full-epoch repeats of EVERY doc plus a lowest-md5 remainder
    draw, with the epoch index first-class so the trainer can
    interleave copies. All-integer rational rates; distinct from the
    sampling entries because repetition (epochs > 1) multiplies a
    source instead of thinning it."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.epoch_upsample(docs, EPOCH_RATES, default_rate=EPOCH_DEFAULT)


# --- end-to-end curation pipeline ------------------------------------------
# The daily 100 TB curation job as ONE declarative plan: exact dedup ->
# per-language quality floor -> source-mixture reweighting -> rollup.
# Every stage is an already-oracle-checked operator; this entry checks
# their COMPOSITION (the place integration bugs live).


@query(
    "pipeline_curation_end_to_end",
    oracle="""
WITH surv AS (
  SELECT doc_id, lang, source FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
),
{QUALITY},
q AS (
  SELECT doc_id,
         round(least(mean_word_len / 8.0, 1.0) * 0.25
               + least(stop_ratio * 4.0, 1.0) * 0.25
               + alpha_ratio * 0.25
               + distinct_ratio * 0.25, 6) AS quality_score
  FROM ratios
),
j AS (SELECT s.doc_id, s.lang, s.source, q.quality_score FROM surv s JOIN q USING (doc_id)),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality_score, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM j
),
t AS (SELECT lang, quality_score AS thr FROM r WHERE rn = ((n - 1) * 25) // 100 + 1),
floored AS (
  SELECT j.* FROM j JOIN t USING (lang) WHERE j.quality_score >= t.thr
),
mixed AS (
  SELECT * FROM floored
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {MIX}
)
SELECT lang, source, count(*) AS n_docs,
       CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_quality
FROM mixed GROUP BY lang, source
""".replace("{MIX}", _MIX_CASE).replace("{QUALITY}", _QUALITY_CTES.lstrip()),
)
def q_pipeline_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup -> quality floor (per-lang p25) -> mixture sample -> rollup,
    composed from the catalog's own operators and oracle-checked as a
    whole. Exact-decimal avg keeps the rollup order-independent."""
    from mock_map_reduce_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    surv = dd.exact_dedup(docs).select("doc_id", "lang", "source")
    scored = surv.join(
        tx.quality_score(docs).select("doc_id", "quality_score"), "doc_id"
    )
    floored = cu.per_group_quantile_floor(scored, "lang", "quality_score", 25, 100)
    mixed = cu.mixture_sample(floored, MIXTURE_RATES, default_rate=MIXTURE_DEFAULT)
    return mixed.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_quality"),
    )


@query(
    "curation_stratified_sample",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang FROM r WHERE rn <= 25
""",
)
def q_curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly 25 docs per language,
    chosen by md5(doc_id) order — the balanced-eval-set draw. Unlike
    sampleBy (seeded Bernoulli: approximate strata sizes, engine-
    specific RNG), the md5 order is exact, engine-portable, and stable
    under reruns/retries; one window per stratum, shuffle carries
    (id, lang) only.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("doc_id", "lang")
    )


@query(
    "curation_weighted_sample",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1.0)
           / 1152921504606846977.0 AS u
  FROM documents
),
s AS (SELECT doc_id, n_chars, ROUND(ln(u) / n_chars, 12) AS score FROM t)
SELECT doc_id, n_chars, score FROM s ORDER BY score DESC, doc_id LIMIT 20
""",
)
def q_curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic corpus sample (A-ES, top 20):
    longer documents proportionally likelier, yet fully reproducible
    (u derives from md5(doc_id)). Map-side score + bounded top-k heap;
    the corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.weighted_sample(docs, 20)


_DECONTAM_OVERLAP = 0.2  # drop corpus docs with >= 20% eval-set 4-gram overlap


_PRETRAIN_ORACLE = r"""
WITH surv AS (
  SELECT doc_id, lang, source, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
),
corpus AS (SELECT * FROM surv WHERE doc_id >= {BENCH}),
{QUALITY},
{GRAMS_C},
bench AS (SELECT DISTINCT gram FROM grams_c WHERE doc_id < {BENCH}),
corpg AS (SELECT g.doc_id, g.gram FROM grams_c g JOIN corpus c USING (doc_id)),
gsizes AS (SELECT doc_id, count(*) AS n_grams FROM corpg GROUP BY doc_id),
shared AS (SELECT c.doc_id, count(*) AS ns FROM corpg c JOIN bench USING (gram) GROUP BY c.doc_id),
contam AS (
  SELECT s.doc_id FROM shared s JOIN gsizes USING (doc_id)
  WHERE CAST(ns AS DOUBLE) / n_grams >= {OVERLAP}
),
clean AS (SELECT * FROM corpus ANTI JOIN contam USING (doc_id)),
q AS (
  SELECT doc_id,
         round(least(mean_word_len / 8.0, 1.0) * 0.25
               + least(stop_ratio * 4.0, 1.0) * 0.25
               + alpha_ratio * 0.25
               + distinct_ratio * 0.25, 6) AS quality_score
  FROM ratios
),
j AS (SELECT c.doc_id, c.lang, c.text, q.quality_score FROM clean c JOIN q USING (doc_id)),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality_score, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM j
),
t AS (SELECT lang, quality_score AS thr FROM r WHERE rn = ((n - 1) * 25) // 100 + 1),
floored AS (
  SELECT j.* FROM j JOIN t USING (lang) WHERE j.quality_score >= t.thr
),
pk AS (
  SELECT doc_id, lang,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_toks
  FROM floored
),
binned AS (
  SELECT doc_id, lang, shard, n_toks,
         CAST((sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_toks) // 1024 AS BIGINT) AS bin_id
  FROM pk
)
SELECT lang, shard, count(*) AS n_docs,
       CAST(count(DISTINCT bin_id) AS BIGINT) AS n_bins,
       CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
       round(CAST(SUM(n_toks) AS DOUBLE) / (count(DISTINCT bin_id) * 1024.0), 6) AS fill_ratio
FROM binned GROUP BY lang, shard
"""


def _pretrain_oracle() -> str:
    from mock_map_reduce_spark.catalog.dedup import _GRAMS_C, BENCH_MAX_ID

    return (
        _PRETRAIN_ORACLE.replace("{BENCH}", str(BENCH_MAX_ID))
        .replace("{QUALITY}", _QUALITY_CTES.lstrip())
        .replace("{GRAMS_C}", _GRAMS_C.strip())
        .replace("{OVERLAP}", str(_DECONTAM_OVERLAP))
    )


@query("pipeline_pretraining_end_to_end", oracle=_pretrain_oracle())
def q_pipeline_pretraining_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data build, composed from the catalog's own
    operators and oracle-checked AS ONE CHAIN: exact dedup -> eval-set
    decontamination (>= 20% 4-gram overlap drops the doc) -> per-lang
    p25 quality floor -> greedy 1024-token sequence packing -> per
    (lang, shard) data-card rollup with bin fill ratios.

    Every stage is individually oracle-checked elsewhere
    (dedup_exact_survivors, dedup_contamination, curation_quality_floor,
    curation_pack_sequences); this entry proves they COMPOSE — schemas,
    determinism contracts, and filters interoperating in one plan, the
    way the pipeline actually ships. Scale: each stage keeps its own
    plan shape (digest groupBy; broadcast benchmark grams; per-lang
    threshold broadcast; per-shard packing windows) — nothing in the
    composition adds a corpus-wide sort or unbounded join.
    """
    from mock_map_reduce_spark.catalog.dedup import BENCH_MAX_ID, CONTAM_NGRAM
    from mock_map_reduce_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    surv_ids = dd.exact_dedup(docs).select("doc_id")
    corpus = docs.join(surv_ids, "doc_id").filter(F.col("doc_id") >= BENCH_MAX_ID)
    bench = docs.filter(F.col("doc_id") < BENCH_MAX_ID)
    contam = (
        dd.benchmark_contamination(corpus, bench, n=CONTAM_NGRAM)
        .filter(F.col("overlap_ratio") >= _DECONTAM_OVERLAP)
        .select("doc_id")
    )
    clean = corpus.join(contam, "doc_id", "left_anti")
    scored = clean.join(
        tx.quality_score(docs).select("doc_id", "quality_score"), "doc_id"
    )
    floored = cu.per_group_quantile_floor(scored, "lang", "quality_score", 25, 100)
    packed = cu.pack_sequences(floored.select("doc_id", "text"), budget=1024)
    j = packed.join(floored.select("doc_id", "lang"), "doc_id")
    agg = j.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum("n_toks").cast("long").alias("sum_toks"),
    )
    return agg.withColumn(
        "fill_ratio",
        F.round(
            F.col("sum_toks").cast("double") / (F.col("n_bins") * 1024.0), 6
        ),
    )
