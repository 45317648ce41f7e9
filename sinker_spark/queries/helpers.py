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

# Money fast path. Price-like columns have true scale 2 and magnitude
# < 10^6 (TPC-H o_totalprice tops out ~5.3e5), so they fit DECIMAL(8,2);
# Spark's SUM over DECIMAL(p≤8,s) produces a DECIMAL(p+10≤18,s)
# accumulator, which Tungsten stores as a LONG — pure 64-bit integer
# arithmetic inside whole-stage codegen, measured ~2× faster than the
# byte-array-backed DECIMAL(38,6) accumulator the wide path uses. Still
# exact and order-independent; capacity = 10^16 cents ≈ 10^14 dollars
# per GROUP. Beyond that (group sums above ~$100 trillion — far past any
# TPC-H SF this engine targets per-group) set SINKER_SPARK_EXACT_WIDE=1
# to route money aggregates through the wide path; overflow under the
# narrow path is loud, not silent (Spark decimal sums null on overflow).
import os as _os

WIDE_MONEY = _os.environ.get("SINKER_SPARK_EXACT_WIDE", "") == "1"
_DEC_MONEY = _DEC if WIDE_MONEY else "DECIMAL(8,2)"


def dsum(col: str | Column) -> Column:
    """Order-independent, engine-independent SUM of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)), 2).cast("double")


def msum(col: str | Column) -> Column:
    """:func:`dsum` for true-scale-2 money columns < 10^6 in magnitude:
    long-backed accumulator (see ``_DEC_MONEY``), identical values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC_MONEY)), 2).cast("double")


def msum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`msum` (same cast + rounding)."""
    return f"CAST(ROUND(SUM(CAST({sql_expr} AS {_DEC_MONEY})), 2) AS DOUBLE)"


def mavg(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return msum(c) / F.count(c).cast("double")


def mavg_expr(sql_expr: str) -> str:
    return f"{msum_expr(sql_expr)} / CAST(COUNT({sql_expr}) AS DOUBLE)"


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`dsum` (same decimal width + rounding)."""
    return f"CAST(ROUND(SUM(CAST({sql_expr} AS {_DEC})), 2) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """AVG via exact decimal sum / count — deterministic double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c).cast("double")


def davg_expr(sql_expr: str) -> str:
    return f"{dsum_expr(sql_expr)} / CAST(COUNT({sql_expr}) AS DOUBLE)"


# Revenue = SUM(l_extendedprice * (1 - l_discount)), used by several
# TPC-H-style queries. Fast path: both factors have true scale 2, so the
# per-row product is exact in units of 10^-4 dollars and fits a LONG
# (≤ 10^9/row); summing longs is the cheapest exact order-independent
# accumulation Spark has (pure codegen'd 64-bit adds, no decimal at all).
# Rounding to cents = integer (units + 50) DIV 100 — identical to
# ROUND-half-up on DuckDB's side because revenue is non-negative — then
# cents/100.0: cents stays ≤ 2^53 so the double is exact, and a final
# IEEE division is bit-identical across engines. Capacity ≈ 9.2e18 units
# ≈ $9e14 per group; SINKER_SPARK_EXACT_WIDE=1 restores the wide decimal
# form beyond that.
_UNITS = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"
)


def revenue() -> Column:
    if WIDE_MONEY:
        return F.round(
            F.sum(
                (F.col("l_extendedprice").cast("DECIMAL(18,4)")
                 * (F.lit(1.0) - F.col("l_discount")).cast("DECIMAL(18,4)"))
            ),
            2,
        ).cast("double")
    return (F.expr(f"(SUM({_UNITS}) + 50) DIV 100").cast("double") / F.lit(100.0))


if WIDE_MONEY:
    REVENUE_SQL = (
        "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)"
    )
    REVENUE_SPARK = REVENUE_SQL
else:
    REVENUE_SQL = f"CAST((SUM({_UNITS}) + 50) // 100 AS DOUBLE) / 100.0"
    # Spark SQL spells integer division DIV (DuckDB: //); same math.
    REVENUE_SPARK = f"CAST((SUM({_UNITS}) + 50) DIV 100 AS DOUBLE) / 100.0"
