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
