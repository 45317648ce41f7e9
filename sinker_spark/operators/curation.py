"""Corpus-curation operators: domain-mixture resampling and token
budgeting — the dataset-recipe layer of a training-data pipeline (the
"sample wikipedia 3x, cap web crawl at N tokens" step that sits between
dedup/quality filtering and export).

Everything here is deterministic by construction (md5-derived uniforms,
never RNG): the same corpus produces the same sample on any cluster
layout, any partitioning, any retry — the property that makes a 100 TB
data recipe auditable and resumable. All logic is JVM-side Catalyst
expressions; no Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sinker_spark.operators.text import tokens


def _uniform01(col) -> "F.Column":
    """Deterministic uniform in [0, 1): first 6 md5 hex chars / 16^6.
    24 bits of precision — identical arithmetic in DuckDB, so the
    sampling decision is engine-portable."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("double")
        / F.lit(float(16**6))
    )


def weighted_resample(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain-mixture resampling: every row from source ``s`` with weight
    ``w`` emits ``floor(w)`` replicas plus one more iff its deterministic
    uniform < ``frac(w)`` — expected multiplicity exactly ``w`` per row,
    zero variance across reruns. Output = input columns + ``replica``
    (1-based copy index), ready for a downstream shuffle-shard export.

    Scale shape: a pure per-row map (weight lookup is a literal map, the
    replica fan-out is an explode bounded by ``ceil(max weight)``); no
    shuffle, no driver participation. Upsampling 100 TB by 2x writes 2x
    rows and nothing else.

    Choose weights with exact binary fractions (x.0, x.25, x.5) so the
    ``u < frac(w)`` comparison can't straddle float rounding across
    engines.
    """
    mapping = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w = F.coalesce(mapping[F.col(source_col)], F.lit(float(default_weight)))
    u = _uniform01(F.col(id_col))
    n_copies = (F.floor(w) + F.when(u < w - F.floor(w), 1).otherwise(0)).cast("int")
    return (
        df.withColumn("__n_copies", n_copies)
        .where(F.col("__n_copies") > 0)
        .withColumn("replica", F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .drop("__n_copies")
    )


def token_budget_cap(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token budget: rank each source's documents by a
    deterministic md5 priority and keep documents while the running
    (inclusive) token total stays within ``budget_tokens`` — the "cap
    web crawl at N tokens" recipe step, reproducible on any cluster.

    Output: ``(id, source, n_tokens, cum_tokens)`` for the kept rows.

    Scale shape: one shuffle on ``source`` for the running-sum window.
    A pathologically hot source concentrates its window in one task; at
    that point pre-aggregate per (source, priority-prefix) bucket first
    (two-phase running sum) — the same salting pattern as
    :mod:`sinker_spark.operators.skew`.
    """
    n_tok = F.size(tokens(text_col))
    pri = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy("pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            n_tok.alias("n_tokens"),
            pri.alias("pri"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .where(F.col("cum_tokens") <= budget_tokens)
        .drop("pri")
    )
