"""Incremental HLL distinct-count maintenance (ivm_hll): batch folds
must be equivalent to a full rebuild (register merge is associative/
commutative/idempotent), estimates must track exact counts within the
sketch's error bound, and deletes must surface as dirty groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark.ivm_delta import DELETE, INSERT, OP_COL
from sinker_spark.ivm_hll import (
    apply_hll_delta,
    dirty_distinct_groups,
    hll_estimate,
    initial_hll_state,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "grp string, uid bigint")


def _chg(spark, rows):
    return spark.createDataFrame(rows, f"grp string, uid bigint, {OP_COL} string")


def _collect_state(state):
    return {(r["grp"], r["bucket"]): r["r"] for r in state.collect()}


def test_incremental_equals_rebuild(spark):
    base = _facts(spark, [("a", i) for i in range(50)] + [("b", i) for i in range(20)])
    state = initial_hll_state(base, ["grp"], "uid")
    batch = _chg(spark, [("a", 1000 + i, INSERT) for i in range(30)] + [("b", 3, INSERT)])
    folded = apply_hll_delta(state, batch, ["grp"], "uid")

    rebuilt = initial_hll_state(
        base.unionByName(batch.select("grp", "uid")), ["grp"], "uid"
    )
    assert _collect_state(folded) == _collect_state(rebuilt)


def test_fold_is_idempotent_for_duplicate_batches(spark):
    """At-least-once delivery: replaying the same batch changes nothing —
    MAX-merge is idempotent, so the sink needs no replay bookkeeping."""
    base = _facts(spark, [("a", i) for i in range(40)])
    state = initial_hll_state(base, ["grp"], "uid")
    batch = _chg(spark, [("a", 500 + i, INSERT) for i in range(10)])
    once = apply_hll_delta(state, batch, ["grp"], "uid")
    twice = apply_hll_delta(once, batch, ["grp"], "uid")
    assert _collect_state(once) == _collect_state(twice)


def test_estimate_tracks_exact_within_bound(spark):
    n = 600
    base = _facts(spark, [("a", i) for i in range(n)])
    est = hll_estimate(initial_hll_state(base, ["grp"], "uid"), ["grp"]).collect()[0]
    # 64 registers → ~13% standard error; allow 3 sigma
    assert abs(est["n_distinct_est"] - n) / n <= 0.39


def test_deletes_ignored_but_surfaced(spark):
    base = _facts(spark, [("a", i) for i in range(30)])
    state = initial_hll_state(base, ["grp"], "uid")
    batch = _chg(spark, [("a", 5, DELETE), ("b", 7, DELETE), ("a", 99, INSERT)])
    folded = apply_hll_delta(state, batch, ["grp"], "uid")
    # only the INSERT affected registers
    expect = apply_hll_delta(state, _chg(spark, [("a", 99, INSERT)]), ["grp"], "uid")
    assert _collect_state(folded) == _collect_state(expect)
    dirty = {r["grp"] for r in dirty_distinct_groups(batch, ["grp"]).collect()}
    assert dirty == {"a", "b"}


def test_estimator_matches_gate_query_construction(spark):
    """The module's estimator and the hll_manual_distinct_customers gate
    query share the register/estimator math — same input, same estimate."""
    from sinker_spark.queries import REGISTRY, _load
    from tests.conftest import SF_SMALL
    from sinker_spark.catalog import load_tables

    _load()
    gate = {
        r["prio"]: r["hll_estimate"]
        for r in REGISTRY["hll_manual_distinct_customers"].fn(spark, SF_SMALL).collect()
    }
    orders = load_tables(spark, SF_SMALL)["orders"].select(
        F.col("o_orderpriority").alias("grp"), F.col("o_custkey").alias("uid")
    )
    mod = {
        r["grp"]: r["n_distinct_est"]
        for r in hll_estimate(initial_hll_state(orders, ["grp"], "uid"), ["grp"]).collect()
    }
    assert gate == mod
