"""Shared helpers for cross-engine-deterministic queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact decimal accumulator wide enough for 100 TB-scale sums of
# price-like doubles (22 integer digits) while keeping 6 fractional
# digits; both Spark and DuckDB compute decimal sums exactly. The sum is
# then ROUNDED to scale 2 (the source data's true precision) BEFORE the
# DOUBLE cast: a decimal→double conversion is only guaranteed identical
# across engines while the decimal's unscaled value stays ≤ 2^53 (DuckDB
# converts int128/10^s in floating point; Java BigDecimal rounds
# correctly — they disagree by 1 ulp beyond that). Scale 2 keeps sums
# exact-in-double up to ~9e13, i.e. any realistic SF. (Found the hard
# way: sum_disc_price at scale 8 diverged in the last ulp at sf0.1.)
_DEC = "DECIMAL(28,6)"


def dsum(col: str | Column) -> Column:
    """Order-independent, engine-independent SUM of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)), 2).cast("double")


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`dsum` (same decimal width + rounding)."""
    return f"CAST(ROUND(SUM(CAST({sql_expr} AS {_DEC})), 2) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """AVG via exact decimal sum / count — deterministic double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c).cast("double")


def davg_expr(sql_expr: str) -> str:
    return f"{dsum_expr(sql_expr)} / CAST(COUNT({sql_expr}) AS DOUBLE)"


# Revenue expression used by several TPC-H-style queries; the product is
# taken at DECIMAL(18,4) so the multiply result (and hence the sum) is
# exactly the same number in both engines; rounded to scale 2 before the
# double cast (see _DEC comment).
def revenue() -> Column:
    return F.round(
        F.sum(
            (F.col("l_extendedprice").cast("DECIMAL(18,4)")
             * (F.lit(1.0) - F.col("l_discount")).cast("DECIMAL(18,4)"))
        ),
        2,
    ).cast("double")


REVENUE_SQL = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)"
)
