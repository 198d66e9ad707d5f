"""Skew-mitigation operators: salted two-phase aggregation.

At 100 TB a handful of hot keys ("the", a viral doc id) can pin a
whole aggregation on one reducer. Salting splits each key into
``num_salts`` sub-keys for the first (heavy) aggregation, then merges
partials in a second, tiny aggregation. Results are identical to the
unsalted form — the salt only changes the shuffle distribution —
which is exactly what the catalog entry proves by sharing the plain
word_count oracle.

(Spark's partial HashAggregate already absorbs most agg skew; salting
is the explicit recipe for when the combiner can't help — e.g. high
cardinality per partition, or skewed JOIN keys where AQE's skew-join
split needs a hand.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mock_map_reduce_spark.operators.wordcount import tokenize


def salted_agg_count(
    rows: DataFrame, key_col: str, num_salts: int = 8
) -> DataFrame:
    """count(*) per key via salt -> partial count -> merge."""
    salted = rows.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    )
    partial = salted.groupBy(key_col, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key_col).agg(F.sum("__c").alias("count"))


def salted_word_count(docs: DataFrame, text_col: str = "text", num_salts: int = 8) -> DataFrame:
    """word_count with explicit salting — byte-identical results."""
    return salted_agg_count(tokenize(docs, text_col), "word", num_salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
) -> DataFrame:
    """Equi-join with explicit key salting — identical results, skew-
    proof shuffle distribution.

    The big side scatters each row to one of ``num_salts`` sub-keys;
    the small side replicates once per salt (an explode of a
    num_salts literal array — its shuffle grows num_salts×, which is
    why this is for big×SMALL joins whose hot keys defeat both the
    broadcast threshold and AQE's skew split). Joining on
    (key, salt) spreads any hot key over num_salts reducers. The salt
    derives from monotonically_increasing_id, so no co-key collision
    pattern can concentrate it.
    """
    b = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return b.join(s, [key, "__salt"]).drop("__salt")


def choose_join_strategy(
    n_rows: int,
    n_keys: int,
    max_per_key: int,
    small_side_rows: int,
    broadcast_row_limit: int = 1_000_000,
    skew_factor: float = 5.0,
    extreme_factor: float = 64.0,
) -> str:
    """Turn ``diag_join_key_skew``'s profile (catalog/stats.py) into a
    join-strategy decision — the pre-flight rule a 100 TB pipeline
    applies before committing a fact-side shuffle.

    Returns one of:
      * ``"broadcast"`` — the small side fits the broadcast budget;
        skew on the big side is then irrelevant (no shuffle of it).
      * ``"shuffle"``   — skew_ratio ≈ 1: plain sort-merge/hash join.
      * ``"aqe_skew_split"`` — a hot key dominates but each hot key's
        rows are still independently splittable: let AQE's
        OptimizeSkewedJoin subdivide the hot partitions at runtime
        (tests/test_aqe_skew.py pins that the split actually fires).
      * ``"salted"``    — EXTREME skew: pre-scatter the big side over
        ``num_salts`` sub-keys (``salted_join``). AQE's split works on
        PARTITION granularity, so once a single key's partition can
        no longer be subdivided profitably (or the join must avoid an
        AQE dependency entirely), explicit salting is the reliable
        fallback — at the cost of replicating the small side.

    The thresholds are deliberately coarse: the decision only needs
    the order of magnitude, which is why the profile query computes
    exact integers (no sampling noise to reason about).
    """
    if small_side_rows <= broadcast_row_limit:
        return "broadcast"
    ratio = (max_per_key * n_keys) / n_rows if n_rows else 1.0
    if ratio < skew_factor:
        return "shuffle"
    if ratio < extreme_factor:
        return "aqe_skew_split"
    return "salted"
