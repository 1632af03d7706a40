"""Vector math over ``array<float|double>`` columns — pure built-in
higher-order functions (JVM-side, no Python round-trips).

Used by the similarity-search and embedding-dedup operators (SURVEY.md §2.11
X3/X5). Computation is done in doubles regardless of storage type so results
are deterministic and oracle-comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    # exactly sqrt(dot(a, a)) — same zip_with/aggregate expression, so
    # the float path (and the oracle-pinned bits) are shared, not cloned
    return F.sqrt(dot(a, a))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); null-safe on zero norms."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(None).cast("double"))


# ---------------------------------------------------------------------------
# Arrow-vectorized kernels (numpy batch matmul)
#
# The higher-order-function forms above are JVM-side but INTERPRETED per
# array element — fine for one dot product per row, but the dominant cost
# when a candidate join evaluates hundreds of thousands of 64-dim products
# (measured ~10x slower than Arrow+numpy on the sf0.1 near-dup bench).
# These pandas_udf kernels batch rows through Arrow and do one numpy
# matmul / einsum per batch. Use them in candidate-verification hot paths;
# keep the built-in forms for oracle-checked queries (deterministic
# left-to-right accumulation).
# ---------------------------------------------------------------------------


def dot_pd():
    """Returns a pandas_udf CALLABLE (not a Column — invoke the result:
    ``dot_udf = dot_pd(); dot_udf(col_a, col_b)``): (array, array) ->
    double dot product, one einsum per Arrow batch. On unit vectors this
    IS the cosine.

    NULL-tolerant like the built-in ``dot`` it substitutes for in hot
    paths: a NULL on either side yields a NULL product for that row
    (np.stack on a batch containing None would otherwise kill the whole
    job with an opaque PythonException). Ragged lengths within a batch
    still raise — unequal dims are a schema bug, not data."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ok = (a.notna() & b.notna()).to_numpy()
        # nullable Float64 so the null rows arrive as SQL NULL (a plain
        # float64 NaN would surface as NaN, not NULL, on the Spark side)
        out = pd.array([None] * len(a), dtype="Float64")
        if ok.any():
            A = np.stack(a[ok].to_numpy()).astype(np.float64)
            B = np.stack(b[ok].to_numpy()).astype(np.float64)
            out[ok] = np.einsum("ij,ij->i", A, B)
        return pd.Series(out, index=a.index)

    return _dot
