"""Vector math over ``array<float|double>`` columns — pure built-in
higher-order functions (JVM-side, no Python round-trips).

Used by the similarity-search and embedding-dedup operators (SURVEY.md §2.11
X3/X5). Computation is done in doubles regardless of storage type so results
are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two equal-length arrays: zip_with multiply + aggregate
    sum. Left-to-right accumulation -> deterministic for a fixed row."""
    prods = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    arr = _as_double_array(a)
    sq = F.aggregate(
        F.zip_with(arr, arr, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.sqrt(sq)


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); null-safe on zero norms."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(None).cast("double"))
