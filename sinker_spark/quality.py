"""Load-time data-quality invariants.

Spark enforces no constraints (SURVEY §1.1/B22: the reference's PK/FK/
NOT NULL DDL becomes engine-checked invariants here). Each check returns
a violations DataFrame — empty means the invariant holds; counting it is
one aggregation, so checks compose into ingest pipelines cheaply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """Keys violating uniqueness (the reference's unique MV index,
    query_templates.py:12) with their multiplicities."""
    return df.groupBy(key).agg(F.count("*").alias("n")).where(F.col("n") > 1)


def null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows violating NOT NULL on any of ``cols``."""
    cond = None
    for c in cols:
        clause = F.col(c).isNull()
        cond = clause if cond is None else (cond | clause)
    return df.where(cond) if cond is not None else df.limit(0)


def orphan_foreign_keys(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Child rows whose FK has no parent (left-anti join — no payload
    shuffle of the parent side beyond the key column)."""
    return child.join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")


def observed(df: DataFrame, name: str, key: str | None = None) -> tuple[DataFrame, Observation]:
    """Attach zero-cost pipeline metrics to a DataFrame via Spark's
    Observation API: row count, and null-key count when ``key`` is given.

    The metrics are accumulated DURING whatever action consumes the
    DataFrame (a sink write, a snapshot materialization) — no second
    scan, which is the only affordable way to monitor a 100 TB write.
    Read ``obs.get`` after the action completes. This is the Spark-native
    replacement for the reference's driver-side row-count monitoring
    (reference README.md:350-352 polls counts with separate queries)."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if key is not None:
        metrics.append(F.sum(F.col(key).isNull().cast("long")).alias("null_keys"))
    return df.observe(obs, *metrics), obs


def expectations(df: DataFrame, checks: dict[str, "F.Column"]) -> DataFrame:
    """Declarative expectation suite (the dbt-test / Great Expectations
    analog): each named check is a boolean Column that must hold per
    row; the result is one row per check with its violation count and
    pass flag.

    All checks evaluate in a SINGLE scan — each compiles to a
    conditional count inside one aggregation (map-side combined), so a
    20-check suite over 100 TB costs one pass, not 20. Uniqueness and
    FK checks need joins/grouping — use ``duplicate_keys`` /
    ``orphan_foreign_keys`` and union the summaries.
    """
    # violation = check not TRUE (false OR null): a NULL comparison fails
    # the expectation — when(cond, 0).otherwise(1) lands NULLs in the
    # violation branch, where ~cond would silently skip them
    aggs = [
        F.sum(F.when(cond, 0).otherwise(1)).cast("bigint").alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    out = None
    for name in checks:
        row = wide.select(
            F.lit(name).alias("check"),
            F.col(name).alias("n_violations"),
            (F.col(name) == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out
