"""Scale-technique catalog: salting, grouping sets, grouped Pandas UDF.

salted_word_count shares the plain word_count oracle — proving the
skew-mitigation rewrite is result-identical is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mock_map_reduce_spark.operators.skew import salted_word_count
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table, register_views

_WORDS_ORACLE = """
WITH words AS (
  SELECT unnest(string_split_regex(text, '[^A-Za-z]+')) AS word
  FROM documents
)
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
"""


@query("word_count_salted", oracle=_WORDS_ORACLE)
def q_word_count_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe word count: salt -> partial -> merge, same results."""
    return salted_word_count(load_table(spark, sf_dir, "documents"))


_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("grouping_sets_orders", oracle=_GROUPING_SETS)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS)


@query(
    "pandas_zscore_per_segment",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROUND((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_pop(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
FROM customer
""",
)
def q_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-segment z-score.

    The UDAF-shaped slot of the reference's generic reduce contract
    (SURVEY UD1) on the Arrow path: each group arrives as one pandas
    DataFrame. Rounded to 4 so pandas' pairwise float summation and
    the oracle's streaming aggregate agree.
    """
    import pandas as pd

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=0)
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["z"] = ((pdf["c_acctbal"] - m) / sd).round(4)
        return out

    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").applyInPandas(
        per_segment, "c_custkey long, c_mktsegment string, z double"
    )
