"""Distributed model training as pure dataflow — no driver-side math.

The pattern shared by every routine here: model parameters live in a
ONE-ROW DataFrame that broadcasts onto the feature relation each
iteration, and every gradient/statistic that crosses a partition
boundary is accumulated as a rounded DECIMAL — so the aggregate is exact
in any order and the whole training run is bit-reproducible at any
parallelism (and mirrorable in a SQL oracle). Per-row float math uses
only fixed-shape IEEE expression chains; libm calls (exp, ln) are
rounded to 9 decimals before entering any sum, which absorbs the ≤1-ulp
differences between math libraries.

At 100 TB: per iteration ONE scan of the feature relation (itself the
product of a single pass over the fact table), map-side partial
aggregation of k decimal sums, and a one-row result — the classic
batch-gradient-descent shape; minibatching/sampling drops in by
filtering the feature relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "DECIMAL(28,12)"


def logreg_gd(
    features: DataFrame,
    x_cols: list[str],
    y_col: str,
    iterations: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Binary logistic regression via full-batch gradient descent →
    a single row: learned weights (w0 = intercept, w1.. per feature,
    rounded to 6), final mean log-loss, training accuracy at p≥0.5, n.

    Determinism contract (mirrored by the unrolled-CTE oracle):
    p = round(sigmoid(z), 9); per-row gradient contributions and
    log-loss terms round to 12 decimals and sum as DECIMAL(28,12);
    weight updates are then identical doubles in every engine."""
    xs = list(x_cols)
    feat = features.select(
        *[F.col(c).cast("double").alias(c) for c in xs],
        F.col(y_col).cast("double").alias("__y"),
    ).localCheckpoint(eager=True)

    w = feat.sparkSession.createDataFrame(
        [tuple([0.0] * (len(xs) + 1))],
        ", ".join(f"w{j} double" for j in range(len(xs) + 1)),
    )

    def p_expr():
        z = F.col("w0")
        for j, c in enumerate(xs, start=1):
            z = z + F.col(f"w{j}") * F.col(c)
        return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)

    n = feat.count()
    for _ in range(iterations):
        joined = feat.crossJoin(F.broadcast(w)).withColumn("__p", p_expr())
        resid = F.col("__p") - F.col("__y")
        grads = joined.agg(
            F.sum(F.round(resid, 12).cast(_DEC)).alias("g0"),
            *[
                F.sum(F.round(resid * F.col(c), 12).cast(_DEC)).alias(f"g{j}")
                for j, c in enumerate(xs, start=1)
            ],
        )
        w = (
            w.crossJoin(F.broadcast(grads))
            .select(
                *[
                    (
                        F.col(f"w{j}")
                        - F.lit(lr) * (F.col(f"g{j}").cast("double") / F.lit(float(n)))
                    ).alias(f"w{j}")
                    for j in range(len(xs) + 1)
                ]
            )
            .localCheckpoint(eager=True)
        )

    scored = feat.crossJoin(F.broadcast(w)).withColumn("__p", p_expr())
    # clamp inside (0,1): p is rounded to 9, so saturated rows would hit
    # ln(0) — the standard eps-clip, identical in the oracle
    p_c = F.least(F.greatest(F.col("__p"), F.lit(1e-9)), F.lit(1.0 - 1e-9))
    ll_term = -(
        F.col("__y") * F.log(p_c) + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - p_c)
    )
    out = scored.agg(
        F.sum(F.round(ll_term, 12).cast(_DEC)).alias("__ll"),
        F.sum(
            F.when(
                ((F.col("__p") >= 0.5) & (F.col("__y") == 1.0))
                | ((F.col("__p") < 0.5) & (F.col("__y") == 0.0)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )
    return (
        w.crossJoin(F.broadcast(out))
        .select(
            *[F.round(F.col(f"w{j}"), 6).alias(f"w{j}") for j in range(len(xs) + 1)],
            F.round(F.col("__ll").cast("double") / F.lit(float(n)), 6).alias("log_loss"),
            F.round(F.col("n_correct").cast("double") / F.lit(float(n)), 6).alias("accuracy"),
            F.lit(n).cast("bigint").alias("n"),
        )
    )
