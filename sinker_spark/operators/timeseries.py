"""Time-series subsequence similarity search over event streams.

The distributed form of streaming subsequence matching (cf. PAPERS.md,
"Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019): find the sliding windows of each key's value
series closest to a query pattern under z-normalized Euclidean distance
— the UCR-suite/MASS problem statement, expressed as Catalyst
primitives instead of a specialized index:

- windows come from ONE partitioned frame (`collect_list` over
  ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW``) — a single shuffle on
  the series key, each key's frames built in sort order;
- z-normalization and the distance fold are higher-order array
  expressions (zip_with/aggregate) inside whole-stage codegen — no
  Python, no explosion of the windows into rows;
- the global top-k is ``ORDER BY dist LIMIT k`` → TakeOrderedAndProject
  (per-partition heaps, k rows to the driver — never a full sort).

At 100 TB the shuffle moves each series once; flat windows (zero
variance) are dropped before the distance math, mirroring the standard
z-norm guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fold_sum(arr) -> F.Column:
    # explicit left fold: the identical summation order the DuckDB oracle
    # reproduces with list_reduce (bit-identical doubles on both engines)
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


def sliding_znorm_match(
    df: DataFrame,
    pattern: list[float],
    value_col: str = "value",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` sliding windows (one per (key, end-row)) most similar to
    ``pattern`` under z-normalized Euclidean distance. Returns
    ``(key_col, *order_cols, zdist)`` ordered by ascending distance with
    a deterministic (key, order) tie-break."""
    n = len(pattern)
    if n < 2 or len(set(pattern)) == 1:
        raise ValueError(
            "sliding_znorm_match: pattern must have non-zero variance "
            "(z-normalization is undefined for a constant pattern)"
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    win = F.collect_list(F.col(value_col).cast("double")).over(w)
    base = df.select(key_col, *order_cols, win.alias("win")).where(F.size("win") == n)

    def znorm(arr):
        m = _fold_sum(arr) / n
        s = F.sqrt(_fold_sum(F.transform(arr, lambda x: (x - m) * (x - m))) / n)
        return m, s

    pat = F.array(*[F.lit(float(x)) for x in pattern])
    base = base.withColumn("pat", pat)
    m, s = znorm(F.col("win"))
    pm, ps = znorm(F.col("pat"))
    zw = F.transform(F.col("win"), lambda x: (x - m) / s)
    zp = F.transform(F.col("pat"), lambda x: (x - pm) / ps)
    dist = F.round(F.sqrt(_fold_sum(F.zip_with(zw, zp, lambda x, y: (x - y) * (x - y)))), round_digits)
    return (
        base.withColumn("zdist", dist)
        .where(s > 0)
        .select(key_col, *order_cols, "zdist")
        .orderBy("zdist", key_col, *order_cols)
        .limit(k)
    )
