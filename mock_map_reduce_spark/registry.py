"""Query registry — the driver-facing catalog of named queries.

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame``
with (when SQL-expressible) an ANSI-SQL oracle string DuckDB runs on
the same parquet tables. Column names/aliases MUST match between the
two — the driver's compare sorts columns by name before hashing.

Modules register here at import time via the ``query`` decorator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a named query, optionally with a DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from mock_map_reduce_spark import catalog  # noqa: F401
