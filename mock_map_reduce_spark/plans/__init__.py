"""Plan inspection helpers — assert the physical plan is the one you want."""

from mock_map_reduce_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    final_plan,
    has_broadcast_join,
    has_pushed_filters,
)

__all__ = [
    "count_exchanges",
    "executed_plan",
    "final_plan",
    "has_broadcast_join",
    "has_pushed_filters",
]
