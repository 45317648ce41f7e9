"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, find the most recent right row (same key) with
``right_ts <= left_ts``. The classic implementations are a per-row
correlated subquery (what an RDBMS would run — O(n·lookup)); the
Spark-scalable composition used here is:

    union(right, left) → single shuffle on key
    → window ``last(payload, ignorenulls=True)`` ordered by (ts, side)
    → keep left rows

One shuffle, one per-partition sort, no correlated lookups, no row
explosion — the plan a dedicated as-of operator would produce. At 100 TB
both inputs shuffle on the key once (same cost as one sort-merge join);
skewed keys are split by AQE.

The ``side`` ordering column (right=0 before left=1) breaks ts ties so a
right row with ts == left_ts IS visible to that left row — inclusive
as-of semantics, matching DuckDB's ASOF JOIN and pandas merge_asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str] | None = None,
) -> DataFrame:
    """Inclusive as-of join; returns all left columns + ``asof_ts`` (+ payload).

    ``payload`` maps output column name -> column name of ``right`` to carry
    alongside the matched timestamp.
    """
    payload = payload or {}

    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rts"),
        *[F.col(src).alias(f"__p_{n}") for n, src in payload.items()],
    )
    left_struct = F.struct(*left.columns).alias("__left")
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        left_struct,
    )
    # null placeholders with the right side's exact types, and vice versa
    rtypes = {f.name: f.dataType for f in r.schema.fields}
    l = l.select(
        "__k", "__ts", "__side",
        F.lit(None).cast(rtypes["__rts"]).alias("__rts"),
        *[F.lit(None).cast(rtypes[f"__p_{n}"]).alias(f"__p_{n}") for n in payload],
        "__left",
    )
    r = r.select(
        "__k", "__ts", "__side", "__rts",
        *[F.col(f"__p_{n}") for n in payload],
        F.lit(None).cast(dict((f.name, f.dataType) for f in l.schema.fields)["__left"]).alias("__left"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "__side",
        "__left",
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"__p_{n}", ignorenulls=True).over(w).alias(f"__a_{n}") for n in payload],
    )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        "asof_ts",
        *[F.col(f"__a_{n}").alias(n) for n in payload],
    )
