"""Shared helpers for cross-engine-deterministic queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact decimal accumulator wide enough for 100 TB-scale sums of
# price-like doubles (22 integer digits) while keeping 6 fractional
# digits; both Spark and DuckDB compute decimal sums exactly, so the
# final DOUBLE cast is bit-identical across engines and partitionings.
_DEC = "DECIMAL(28,6)"


def dsum(col: str | Column) -> Column:
    """Order-independent, engine-independent SUM of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`dsum` (same decimal width)."""
    return f"CAST(SUM(CAST({sql_expr} AS {_DEC})) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """AVG via exact decimal sum / count — deterministic double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c).cast("double")


def davg_expr(sql_expr: str) -> str:
    return f"{dsum_expr(sql_expr)} / CAST(COUNT({sql_expr}) AS DOUBLE)"


# Revenue expression used by several TPC-H-style queries; the product is
# taken at DECIMAL(18,4) so the multiply result (and hence the sum) is
# exactly the same number in both engines.
def revenue() -> Column:
    return F.sum(
        (F.col("l_extendedprice").cast("DECIMAL(18,4)") * (F.lit(1.0) - F.col("l_discount")).cast("DECIMAL(18,4)"))
    ).cast("double")


REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE)"
)
