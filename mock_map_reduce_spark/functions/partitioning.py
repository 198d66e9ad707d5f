"""Partitioning helpers shared by operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition to full parallelism before expensive per-row compute.

    Input splits follow file sizes — a corpus arriving as a few small
    parquet files would otherwise run per-row hashing / shingling /
    vector math on a few cores. The shuffle moves only the projected
    columns (cheap relative to the compute it parallelizes). Size the
    call so it is a no-op on a well-partitioned 100 TB corpus and a
    ~cores-x win on a single-file one.
    """
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
