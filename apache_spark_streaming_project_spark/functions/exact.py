"""Cross-engine-deterministic aggregate expressions.

Floating-point SUM/AVG/STDDEV are order-dependent: a partial+final hash
aggregation over doubles gives low-order bits that differ run-to-run and
engine-to-engine, which breaks value-hash comparison against a DuckDB oracle.

The testdata money/measure columns carry <= 2 decimal digits, so casting to
DECIMAL before summing makes the sum EXACT — then a final cast to double is a
single deterministic conversion shared by both engines. Same trick yields
exact AVG (exact sum / exact count, one IEEE division) and exact STDDEV via
the sum-of-squares identity computed on exact decimal sums:

    var_samp = (n * sum(x^2) - sum(x)^2) / (n * (n - 1))

with the numerator formed in exact decimal arithmetic and only the final
division + sqrt done in doubles. Precisions are sized so no intermediate
exceeds DECIMAL(38) (no engine-specific precision-loss rounding). This is
also the SCALABLE formulation: one pass, partial-aggregatable, no second
scan — exactly what Spark's HashAggregate does for the three component sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_money(col: str | Column, scale: int = 2, out_alias: str | None = None) -> Column:
    """Exact sum of a fixed-point-valued double column, returned as double.

    DECIMAL(16,s) like the whole family — see :func:`var_components` for
    the shared input-domain bound |x| < 10^(16-s) and its failure modes.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = F.sum(c.cast(f"decimal(16,{scale})")).cast("double")
    return expr.alias(out_alias) if out_alias else expr


def avg_exact(col: str | Column, scale: int = 2, out_alias: str | None = None) -> Column:
    """Deterministic average: exact decimal sum, then one double division.

    The count is over the CAST column, not the raw one: under non-ANSI an
    out-of-range value nulls out of the sum but would stay in a raw-column
    divisor — exactly the 'wrong mean with no error' failure mode
    :func:`var_components` documents. Same DECIMAL(16,s) domain as the
    rest of the family."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast(f"decimal(16,{scale})")
    expr = F.sum(d).cast("double") / F.count(d)
    return expr.alias(out_alias) if out_alias else expr


def var_components(col: str | Column, scale: int = 2) -> tuple[Column, Column, Column]:
    """(n, sum(x), sum(x^2)) with the sums exact decimals.

    x has `scale` fractional digits -> the cast is DECIMAL(16,s) (NOT 18:
    the square (16,s)*(16,s) -> (33,2s) must stay inside DECIMAL(38)),
    so the safe input range is |x| < 10^(16-s). Values beyond it fail
    LOUDLY under ANSI (this project's Spark 4 sessions keep ANSI on);
    under non-ANSI the cast nulls out, and ``n`` counts the CAST column
    so the components stay mutually consistent (a mean over rows the
    sum silently excluded would be wrong with no error).
    """
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast(f"decimal(16,{scale})")
    n = F.count(d)
    s = F.sum(d)
    # square in decimal: (16,s)*(16,s) -> (33,2s): exact, fits in 38.
    sq = F.sum(d * d)
    return n, s, sq


def stddev_exact(col: str | Column, scale: int = 2, out_alias: str | None = None) -> Column:
    """Deterministic sample stddev (matches Spark ``stddev`` / DuckDB
    ``stddev`` both = stddev_samp) via the exact-sums identity.

    The numerator n*sum_sq - sum^2 is computed in doubles AFTER exact decimal
    sums — the two products can exceed DECIMAL(38) at large n, so we convert
    the three exact components to double first; the conversion is
    deterministic and identical in both engines, and the two products/one
    subtraction in IEEE doubles are order-free (fixed expression tree).
    """
    n, s, sq = var_components(col, scale)
    nd = n.cast("double")
    sd = s.cast("double")
    sqd = sq.cast("double")
    # clamp at 0: the exact numerator is >= 0, but the two double products
    # each round, and for zero-variance groups of large values the rounded
    # difference can land epsilon-negative -> sqrt(NaN). greatest(_, 0.0)
    # (mirrored in the SQL twin) keeps those groups at stddev 0.
    var = F.greatest(
        (nd * sqd - sd * sd) / (nd * (nd - F.lit(1.0))), F.lit(0.0)
    )
    expr = F.when(n > 1, F.sqrt(var)).otherwise(F.lit(None).cast("double"))
    return expr.alias(out_alias) if out_alias else expr


def _dec2dbl(expr: str) -> str:
    """Correctly-rounded decimal->double for DuckDB.

    DuckDB's direct ``CAST(decimal AS DOUBLE)`` multiplies the scaled integer
    by 10^-scale in doubles (two roundings — NOT correctly rounded once the
    decimal exceeds ~17 significant digits), while Spark's Decimal.toDouble
    (java.math.BigDecimal.doubleValue) is correctly rounded. Routing through
    VARCHAR makes DuckDB correctly rounded too, so both engines produce
    bit-identical doubles from the same exact decimal sum.
    """
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def stddev_exact_sql(col_sql: str, scale: int = 2) -> str:
    """DuckDB-side mirror of :func:`stddev_exact` (same expression tree;
    COUNT is over the cast expression like the Python twin's
    ``F.count(d)``, keeping n and the sums over the same population)."""
    d = f"CAST({col_sql} AS DECIMAL(16,{scale}))"
    return (
        f"CASE WHEN COUNT({d}) > 1 THEN sqrt(GREATEST("
        f"(CAST(COUNT({d}) AS DOUBLE) * {_dec2dbl(f'SUM({d} * {d})')}"
        f" - {_dec2dbl(f'SUM({d})')} * {_dec2dbl(f'SUM({d})')})"
        f" / (CAST(COUNT({d}) AS DOUBLE) * (CAST(COUNT({d}) AS DOUBLE) - 1.0))"
        f", 0.0)) ELSE NULL END"
    )


def avg_exact_sql(col_sql: str, scale: int = 2) -> str:
    """Mirror of :func:`avg_exact` — DECIMAL(16,s), COUNT of the cast."""
    d = f"CAST({col_sql} AS DECIMAL(16,{scale}))"
    return f"{_dec2dbl(f'SUM({d})')} / COUNT({d})"


def sum_money_sql(col_sql: str, scale: int = 2) -> str:
    """Mirror of :func:`sum_money` — DECIMAL(16,s)."""
    return _dec2dbl(f"SUM(CAST({col_sql} AS DECIMAL(16,{scale})))")
