"""mock_map_reduce_spark — a PySpark-native analytics engine.

A brand-new DataFrame/SQL-first engine with the query and
data-processing capabilities of the reference mock-MapReduce system
(FaizanAziz2001/Mock-Map-Reduce, read at /root/reference), re-expressed
idiomatically on Apache Spark, plus the LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
    session     — SparkSession factory tuned for the target cluster
    sources     — table loaders / sinks (parquet, text, csv, json)
    operators   — composable DataFrame operators (wordcount, relational,
                  dedup, similarity, text analysis, multimodal)
    functions   — reusable column expression builders
    streaming   — Structured Streaming operators (windows, sessionization)
    plans       — plan inspection helpers (explain, shuffle audit)
"""

from mock_map_reduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
