"""Incremental maintenance of DISTINCT-COUNT views via mergeable HLL
register state — the sketch lane joined to the IVM lane.

``COUNT(DISTINCT x) GROUP BY keys`` is the one common aggregate that is
NOT self-maintainable with signed deltas (``ivm_delta``): a delete
can't decrement a distinct count without per-value multiplicity state
the size of the data. The standard engineering answer at 100 TB is an
*insert-only approximate* view: maintain HyperLogLog registers per
group and fold each CDC batch in with a MAX-merge.

State: ``(keys..., bucket, r)`` — 64 rows per group, regardless of fact
size (the same explicit md5 register construction as the
``hll_manual_distinct_customers`` gate query, so the estimator is
cross-engine verified there). Refresh cost per batch: one aggregation
over the batch + one MAX-merge against 64·|touched groups| state rows,
co-partitioned when the state store hash-partitions on the group keys.
The fact table is never rescanned.

Deletes: HLL registers are monotone — deletions cannot be folded in.
``apply_hll_delta`` ignores DELETE rows by contract and surfaces the
affected groups via ``dirty_distinct_groups`` so the caller can route
them through a scoped exact recompute (mirroring
``ivm_delta.dirty_minmax_groups``); a pure-insert stream (events,
telemetry, documents — the usual distinct-count sources) never needs
that fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sinker_spark.ivm_delta import DELETE, INSERT, OP_COL, null_safe_join

M = 64          # registers per group (6 bucket bits)
_RANK_BITS = 54  # 60-bit md5 value, 6 bits spent on the bucket


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def _registers(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """(keys..., bucket, r) partial registers for one relation — the
    map-side-combinable unit both the initial build and every batch
    produce."""
    h = _h60(F.col(value_col))
    w = (h / M).cast("bigint")  # value field above the bucket bits
    rho = (
        F.when(w == 0, _RANK_BITS + 1)
        .otherwise(_RANK_BITS - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return (
        df.select(*keys, F.pmod(h, F.lit(M)).alias("bucket"), rho.alias("r"))
        .groupBy(*keys, "bucket")
        .agg(F.max("r").alias("r"))
    )


def initial_hll_state(fact: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One-time register build over the fact table."""
    return _registers(fact, keys, value_col)


def apply_hll_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str = OP_COL,
) -> DataFrame:
    """Fold a CDC batch's INSERT rows into the register state (MAX-merge;
    DELETE rows are ignored by contract — see module docstring)."""
    batch = _registers(changes.where(F.col(op_col) == INSERT), keys, value_col)
    return (
        state.unionByName(batch)
        .groupBy(*keys, "bucket")
        .agg(F.max("r").alias("r"))
    )


def dirty_distinct_groups(
    changes: DataFrame, keys: list[str], op_col: str = OP_COL
) -> DataFrame:
    """Group keys whose distinct count may have DECREASED (deletes seen)
    — route these through a scoped exact recompute, exactly like
    ``ivm_delta.dirty_minmax_groups`` for min/max."""
    return changes.where(F.col(op_col) == DELETE).select(*keys).distinct()


def hll_estimate(state: DataFrame, keys: list[str]) -> DataFrame:
    """Register state → per-group estimate ``(keys..., n_distinct_est)``.

    Same estimator as the gate query: S = Σ 2^(rmax − r) over all M
    registers (exact BIGINT — no float-sum order anywhere), empty
    buckets contribute r = 0, linear counting below 2.5·M. Every literal
    is an explicit DOUBLE (Spark parses bare decimal literals as
    DECIMAL, whose division truncates differently than IEEE).
    """
    groups = state.select(*keys).distinct()
    spine = groups.crossJoin(
        F.broadcast(
            state.sparkSession.range(M).select(F.col("id").cast("bigint").alias("bucket"))
        )
    )
    # NULL-SAFE on the group keys: GROUP BY makes NULL its own group, so
    # a NULL-keyed group's spine rows must find their registers (a plain
    # equi-join never matches NULL and would serve estimate 0 for a
    # populated NULL group). `bucket` rides along in the same null-safe
    # join: spine buckets are 0..63 (never NULL), so the NULL-bucket
    # register rows that NULL *values* produce still match nothing —
    # exactly COUNT(DISTINCT x)'s ignore-NULL-values semantics.
    full = (
        null_safe_join(spine, state, [*keys, "bucket"], "left")
        .select(*keys, "bucket", F.coalesce("r", F.lit(0)).alias("r"))
        .withColumn("rmax", F.max("r").over(Window.partitionBy(*keys)))
    )
    agg = full.groupBy(*keys, "rmax").agg(
        # F.shiftleft only takes a literal bit count — use the SQL form
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), rmax - r)")).alias("s"),
        F.sum(F.when(F.col("r") == 0, 1).otherwise(0)).alias("v"),
    )
    alpha = F.lit(0.7213).cast("double") / (
        F.lit(1.0).cast("double") + F.lit(1.079).cast("double") / F.lit(float(M))
    )
    e_raw = (
        alpha
        * F.lit(float(M * M))
        * F.pow(F.lit(2.0), F.col("rmax").cast("double"))
        / F.col("s").cast("double")
    )
    lin = F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("v").cast("double"))
    est = F.when((e_raw <= F.lit(2.5 * M)) & (F.col("v") > 0), lin).otherwise(e_raw)
    return agg.select(
        *keys,
        (F.floor(est * F.lit(10000.0).cast("double") + F.lit(0.5).cast("double")).cast("bigint")
         / F.lit(10000.0).cast("double")).alias("n_distinct_est"),
    )
