"""Reusable column-expression and partitioning helpers."""

from mock_map_reduce_spark.functions.partitioning import spread

__all__ = ["spread"]
