"""Reusable column-expression helpers (all JVM-side built-ins, codegen'd)."""

from apache_spark_streaming_project_spark.functions.exact import (
    avg_exact,
    stddev_exact,
    sum_money,
    var_components,
)
from apache_spark_streaming_project_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "avg_exact",
    "stddev_exact",
    "sum_money",
    "var_components",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
