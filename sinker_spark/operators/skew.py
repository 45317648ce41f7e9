"""Skew mitigation: salted joins (and the AQE-first guidance).

First line of defense at 100 TB is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it splits
oversized partitions of a sort-merge join automatically. Salting is the
explicit fallback for the cases AQE can't fix: broadcast-ineligible
dimension sides, skewed aggregations, or pre-AQE engines:

- fact side: append a random-ish salt ``key → (key, salt ∈ [0,S))``
  (here: deterministic ``pmod(hash(payload-ish), S)`` so plans stay
  reproducible);
- dim side: replicate each row S times (explode over the salt range);
- join on (key, salt): the hot key's rows spread across S partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with the dim side replicated
    ``salt_buckets``× so a skewed fact key spreads over that many
    partitions. Output columns = fact ∪ dim (minus the dim's join key).

    Cost model: dim shuffle volume × S — use only when dim ≪ fact and the
    fact key histogram is pathological."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")
    f_s = fact.withColumn("__salt", salt)
    d_s = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    dim_key = d_s[key]
    joined = f_s.join(d_s, (f_s[key] == dim_key) & (f_s["__salt"] == d_s["__salt"]), how)
    drop_cols = [d_s[key], f_s["__salt"], d_s["__salt"]]
    out = joined
    for c in drop_cols:
        out = out.drop(c)
    return out


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial agg on
    (key, salt) then final agg on key. ``aggs`` maps output name →
    (function ∈ {sum, count, min, max}, column). Associative functions
    only — exactly the partial/final split Spark already does map-side,
    made explicit for cases where a single reducer key still overflows."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")
    partial_exprs, final_exprs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{name}"))
            final_exprs.append(getattr(F, fn)(f"__p_{name}").alias(name))
        else:
            raise ValueError(f"non-associative aggregate {fn!r} cannot be salted")
    partial = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
