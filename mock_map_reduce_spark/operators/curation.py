"""Training-data curation operators — sampling, splits, packing, ordering.

The reference (Mock-Map-Reduce) has no curation surface — its one
query is word count (SURVEY §0); this family is part of the engine's
LLM-pipeline extension (SURVEY §7 M3). Everything here is built on
the one primitive a 100 TB curation pipeline actually needs for
reproducibility: a *content-deterministic* pseudo-random number per
row (an md5 prefix of the row key), so samples, splits, and shuffles
are stable across runs, engines, and cluster sizes — no RNG state,
no seed-per-partition coupling, no reliance on row order.

Scale design:
  * hash_sample / split_assign are map-only (a filter / projection on
    the scan) — zero shuffle, fully pushdown-friendly.
  * pack_sequences windows WITHIN a hash shard, never globally: the
    window partition key is the shard, so state per task is one
    shard's running counter, and shard count scales with the data.
  * shuffled_head is a bounded top-k (TakeOrderedAndProject) over the
    hash order — the scalable way to take "N random-but-stable docs";
    a global ORDER BY + LIMIT would sort everything on one reducer's
    worth of merge, TakeOrdered prunes per partition first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def row_key_hash(id_col: str = "doc_id") -> Column:
    """Deterministic per-row pseudo-random tag: md5 of the stringified id.

    Hex string compares give uniform thresholds: P(prefix2 < 'XY') =
    int('XY', 16) / 256.
    """
    return F.md5(F.col(id_col).cast("string"))


def hash_sample(
    docs: DataFrame, keep_lt: str = "1a", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ~(int(keep_lt,16)/256) sample — stable across runs.

    Map-only: the sample predicate rides the scan, so at 100 TB a 10%
    sample reads full data once but shuffles nothing and keeps
    downstream stages at 10% volume.
    """
    return docs.filter(F.substring(row_key_hash(id_col), 1, 2) < keep_lt)


def split_assign(
    docs: DataFrame,
    train_lt: str = "cc",
    val_lt: str = "e6",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds a stable train/val/test ``split`` column (~80/10/10).

    Content-keyed split assignment is the reproducibility contract of
    a training pipeline: re-runs, backfills, and engine swaps keep
    every doc in the same split.
    """
    b2 = F.substring(row_key_hash(id_col), 1, 2)
    return docs.withColumn(
        "split",
        F.when(b2 < train_lt, "train").when(b2 < val_lt, "val").otherwise("test"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 1024,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: (id, shard, n_toks, bin_id).

    Docs are sharded by a hash nibble, ordered by id within the
    shard, and packed first-fit-in-order into ``budget``-token bins:
    bin_id = (tokens before this doc in the shard) div budget — a doc
    that overflows a bin starts it anyway (bins overflow rather than
    split documents), matching the common "greedy pack then truncate"
    recipe.

    The window partitions by shard, so no global sort and per-task
    state is one running counter; shard count (here a nibble = 16)
    scales up by taking more hash chars.
    """
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))
    sharded = docs.select(
        F.col(id_col),
        F.substring(row_key_hash(id_col), 1, 1).alias("shard"),
        toks.alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_toks").over(w)
    return sharded.select(
        F.col(id_col),
        "shard",
        F.col("n_toks").cast("long").alias("n_toks"),
        ((running - F.col("n_toks")) / budget).cast("long").alias("bin_id"),
    )


def shuffled_head(
    docs: DataFrame, n: int = 100, id_col: str = "doc_id"
) -> DataFrame:
    """First ``n`` rows of the deterministic pseudo-random order.

    orderBy(hash) + limit compiles to TakeOrderedAndProject — each
    partition keeps its local top-n, the driver merges n*partitions
    rows — the bounded way to draw a stable "random" head at scale.
    """
    return (
        docs.select(F.col(id_col), row_key_hash(id_col).alias("shuffle_key"))
        .orderBy("shuffle_key", id_col)
        .limit(n)
    )


def topk_per_group(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k rows per group by score (desc), deterministic id tie-break.

    The curation use: keep the k best-quality docs per language /
    domain / source. Window partitions by the group key, so each
    group ranks independently — the shuffle carries (group, score,
    id), never document bodies.
    """
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group downsampling to a target source mixture.

    rates maps group value -> keep probability; rows keep iff the
    4-hex-char md5 prefix of their id is below the group's threshold
    (P = int(threshold,16)/65536), so re-runs/backfills keep the exact
    same rows. rate >= 1.0 keeps everything ('g' sorts after every hex
    digit, so the compare stays a plain string <).

    Map-only like hash_sample: the mixture predicate rides the scan —
    reweighting a 100 TB corpus shuffles nothing.
    """

    def thresh(rate: float) -> str:
        if rate >= 1.0:
            return "g"
        return format(max(int(rate * 65536), 0), "04x")

    key = F.substring(row_key_hash(id_col), 1, 4)
    t = F.lit(thresh(default_rate))
    for grp, rate in sorted(rates.items()):
        t = F.when(F.col(group_col) == grp, F.lit(thresh(rate))).otherwise(t)
    return docs.filter(key < t)


def per_group_quantile_floor(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q_num: int = 25,
    q_den: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows at/above their group's q-th DISCRETE quantile.

    threshold(group) = the value at 0-indexed rank (n-1)*q_num//q_den
    in (value, id) order — pure integer rank arithmetic selecting an
    ACTUAL data value, so there is no interpolation float to disagree
    about across engines or retries. The per-group filter a curation
    run uses to drop each language's worst quartile without a global
    quality bar (which would gut low-resource languages).

    Scale: the threshold pass is one window sort per group; the
    threshold table is one row per group and broadcasts back, so the
    keep-filter itself rides a second scan. For groups too hot to
    sort, swap the exact rank for percentile_approx (approx_quantiles
    shows the sketch) — same downstream shape.
    """
    w_rank = Window.partitionBy(group_col).orderBy(
        F.asc(value_col), F.asc(id_col)
    )
    w_n = Window.partitionBy(group_col)
    ranked = df.withColumn("__rn", F.row_number().over(w_rank)).withColumn(
        "__n", F.count("*").over(w_n)
    )
    # integer division: ((n-1)*q_num) div q_den + 1
    thr = ranked.filter(
        F.col("__rn") == F.expr(f"((__n - 1) * {q_num}) div {q_den} + 1")
    ).select(F.col(group_col), F.col(value_col).alias("__thr"))
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(F.col(value_col) >= F.col("__thr"))
        .drop("__thr")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u ~ U(0,1) from md5(id) and scores
    ln(u)/w; the k LARGEST scores win, giving inclusion probability
    proportional to weight.

    Determinism: u is a pure function of the id (top 60 bits of the
    md5 digest), so the sample is reproducible across runs, engines,
    and retries — the property that makes weighted corpus subsampling
    auditable. The score is rounded to 12 decimals so the ordering
    survives last-ulp ln() differences across engines; ties (measure
    zero) break by id.

    Scale: map-side score + TakeOrderedAndProject (bounded heap per
    partition, single driver merge of k rows) — no global sort, no
    shuffle of the corpus. The classic distributed one-pass weighted
    reservoir.
    """
    u = (
        F.conv(F.substring(row_key_hash(id_col), 1, 15), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60) + 1.0)
    score = F.round(F.log(u) / F.col(weight_col), 12)
    return (
        docs.select(id_col, weight_col, score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def temperature_mixture(
    docs: DataFrame,
    budget_den: int = 10,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened source mixture (p_s ∝ n_s^alpha, alpha=1/2).

    The standard multilingual / multi-domain rebalancing knob (XLM-R,
    mT5 use alpha-sampling): raising small sources and shrinking the
    head so the mixture is flatter than the corpus. With a total
    budget of T = N / budget_den documents, each source gets

        quota_s = min(n_s, (T * isqrt(n_s)) div sum_j isqrt(n_j))

    and keeps exactly its quota_s lowest-md5 members.

    Exactness: the whole quota computation is INTEGER — isqrt via
    floor(sqrt(n)) (IEEE sqrt is correctly rounded, and for n well
    under 2^52 the nearest double to sqrt(n) never crosses an integer
    boundary, so floor(sqrt(n)) == isqrt(n) in every engine), then
    integer multiply / integer div. No float sum whose addition order
    could flip a floor() across engines (the round-7 lesson).

    Scale: pass 1 is a tiny groupBy(source) count (source cardinality
    rows); quotas broadcast back; pass 2 ranks ids WITHIN each source
    by md5 — the shuffle carries (id, source, hash) only, never
    document bodies. A source too hot for one task's sort is the
    documented seam: swap the exact rank for a hash-threshold filter
    at quota_s/n_s (approximate count, map-only) — same mixture, no
    per-group sort.
    """
    slim = docs.select(id_col, group_col)
    counts = slim.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    counts = counts.withColumn("w", F.floor(F.sqrt(F.col("n"))).cast("long"))
    tots = counts.agg(
        F.sum("n").alias("corpus_n"), F.sum("w").alias("denom")
    )
    quotas = (
        counts.crossJoin(F.broadcast(tots))
        .withColumn(
            "quota",
            F.expr(
                f"least(n, ((corpus_n div {int(budget_den)}) * w) div denom)"
            ),
        )
        .select(group_col, "quota")
    )
    w_ord = Window.partitionBy(group_col).orderBy(
        row_key_hash(id_col), F.col(id_col)
    )
    return (
        slim.withColumn("rn", F.row_number().over(w_ord).cast("long"))
        .join(F.broadcast(quotas), group_col)
        .filter(F.col("rn") <= F.col("quota"))
        .select(id_col, group_col)
    )


def epoch_upsample(
    docs: DataFrame,
    rates: dict[str, tuple[int, int]],
    default_rate: tuple[int, int] = (1, 2),
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fractional-epoch up/down-sampling WITH repetition — the
    hand-tuned epoch budget of a pretraining mix (books x2.5, web
    x0.5): each source s with rate p/q contributes
    quota_s = (n_s * p) div q  (doc, epoch) rows — every doc repeated
    for each FULL epoch (epoch = 0..full-1, full = quota div n), plus
    the remainder epoch's quota mod n lowest-md5 docs at epoch =
    full. Unlike the sampling operators, repetition is first-class:
    epochs > 1 multiply a source, and the epoch column lets the
    trainer interleave copies instead of streaming them back-to-back.

    Rates are exact RATIONALS (p, q), so every quota is one integer
    multiply + one integer div — no float epoch knob to disagree
    across engines. Scale: the counts pass is a tiny groupBy(source);
    full-epoch rows explode by a per-source constant (≤ p/q) riding
    the scan; only the remainder draw ranks ids within a source, and
    that shuffle carries (id, source, hash) only.
    """
    slim = docs.select(id_col, group_col)
    counts = slim.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    p = F.lit(default_rate[0])
    qd = F.lit(default_rate[1])
    for grp, (pn, qn) in sorted(rates.items()):
        p = F.when(F.col(group_col) == grp, F.lit(pn)).otherwise(p)
        qd = F.when(F.col(group_col) == grp, F.lit(qn)).otherwise(qd)
    # quota = (n * p) div q; full = quota div n; rem = quota mod n
    plan = counts.select(
        group_col,
        "n",
        ((F.col("n") * p).cast("long")).alias("__np"),
        qd.cast("long").alias("__q"),
    ).select(
        group_col,
        "n",
        F.expr("__np div __q").alias("quota"),
    ).select(
        group_col,
        F.expr("quota div n").alias("full"),
        F.expr("quota % n").alias("rem"),
    )
    ranked = slim.withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy(group_col).orderBy(
                row_key_hash(id_col), F.col(id_col)
            )
        )
        .cast("long"),
    ).join(F.broadcast(plan), group_col)
    fulls = ranked.filter(F.col("full") > 0).select(
        id_col,
        group_col,
        F.explode(F.expr("sequence(0, full - 1)")).alias("epoch"),
    )
    rems = ranked.filter(F.col("rn") <= F.col("rem")).select(
        id_col, group_col, F.col("full").alias("epoch")
    )
    return fulls.unionByName(rems)
