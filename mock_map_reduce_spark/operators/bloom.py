"""Bloom-filter runtime join pruning, built from DataFrame primitives.

Spark's optimizer injects this shape itself for some joins (runtime
row-level filtering); the engine-internal ``bloom_filter_agg`` is not
a public function, so this module builds the identical pattern from
codegen-able expressions:

    build side:  k = ``n_hashes`` positions per key via seeded
                 xxhash64, OR-folded into an ``n_bits`` bitmap held as
                 a word_idx -> 64-bit-word map (ONE tiny exchange —
                 the aggregate state is <= n_bits/8 bytes total);
    probe side:  broadcast the one-row bitmap, test all k bits with
                 plain integer expressions riding the scan.

Semantics-preserving by construction: a Bloom filter has false
positives but no false negatives, so pruning the probe side BEFORE an
exact join cannot change the join result — the query's oracle is the
plain join. At 100 TB this is the difference between shuffling the
full fact table and shuffling only rows that can possibly match
(the Lee/Bratbergsengen semi-join-reduction argument; Spark ships it
as spark.sql.optimizer.runtime.bloomFilter.*).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k seeded-hash bit positions for a key (seed = extra hashed col)."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)]


def bloom_bitmap(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 16, n_hashes: int = 3
) -> DataFrame:
    """ONE-row DataFrame holding the dim side's Bloom bitmap as a
    map<word_idx, word> (only non-zero 64-bit words are kept)."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes))).alias("pos")
    words = (
        dim.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_arrays(F.collect_list("word_idx"), F.collect_list("word")).alias("__bf")
    )


def bloom_prune(
    fact: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key tests positive in ``bitmap``.

    The bitmap row broadcasts; every bit test is a map lookup + AND
    inside whole-stage codegen, so the prune rides the fact scan.
    """
    pos_names = [f"__pos_{i}" for i in range(n_hashes)]
    pruned = fact.crossJoin(F.broadcast(bitmap)).withColumns(
        dict(zip(pos_names, _positions(F.col(key_col), n_bits, n_hashes)))
    )
    cond = F.lit(True)
    for p in pos_names:
        word = F.coalesce(F.element_at(F.col("__bf"), F.shiftright(F.col(p), 6)), F.lit(0))
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return pruned.filter(cond).drop("__bf", *pos_names)
