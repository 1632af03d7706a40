"""Plan-inspection helpers — used by tests to assert the physical plans we
designed for actually materialize (broadcasts chosen, filters pushed down,
whole-stage codegen engaged)."""

from apache_spark_streaming_project_spark.plans.inspect import (
    count_shuffles,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)

__all__ = [
    "count_shuffles",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
]
