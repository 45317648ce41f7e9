"""Delta-lane fallback consistency: when a lane-eligible view is forced
through the recompute lane (a batch without before-images, or a change
on a non-lane dependency), the lane's maintained state and the doc
snapshot must be repaired — otherwise every later delta fold merges
into stale state and serves wrong documents, and the fallback's
snapshot-diff misses repairs for keys the lanes changed since backfill.

The reference never hits this (its only refresh primitive is a full
recompute, query_templates.py:13); it is a hazard this engine's hybrid
lanes introduce, so it gets its own regression suite:

- lane state staleness: fold → fallback → fold must equal truth
  (agg, top-k, HLL-register variants);
- snapshot divergence: a value the delta lane changed and the fallback
  recompute changed BACK must still be repaired in the sink, and a
  group the delta lane created must be deleted when the fallback sees
  it gone (no ghost docs);
- backfill-time lane-state initialization: with states seeded at
  backfill (fact == snapshot point, the only unambiguous moment), the
  first CDC batch folds correctly even when the catalog table already
  reflects it (the live-table contract every recompute lane assumes).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import (
    AggViewSpec,
    DistinctViewSpec,
    TopKViewSpec,
    ViewDef,
)

ROW_SCHEMA = "id string, region string, amount double"
HLL_SCHEMA = "id string, region string, cust string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _register(spark, name, rows, schema):
    spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


def _cdc(spark, table, records):
    """records: (lsn, op, after|None, before|None)."""
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("id", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


def _agg_view(table="lf_sales"):
    def recompute(spark):
        return (
            spark.table(table)
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_amt"),
            )
            .select(
                F.col("region").alias("id"),
                F.struct(
                    "region", "n_rows", F.col("sum_amt").cast("double").alias("sum_amt")
                ).alias("doc"),
            )
        )

    return ViewDef(
        name="lf_sales_by_region",
        fn=recompute,
        deps={table},
        agg=AggViewSpec(
            table=table,
            keys=["region"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            row_schema=ROW_SCHEMA,
        ),
    )


def _topk_view(table="lf_scores"):
    def recompute(spark):
        from pyspark.sql.window import Window

        w = Window.partitionBy("region").orderBy(F.desc("amount"), F.asc("id"))
        ranked = (
            spark.table(table)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 2)
        )
        return ranked.groupBy("region").agg(
            F.sort_array(F.collect_list(F.struct("rank", "id", "amount"))).alias("top")
        ).select(
            F.col("region").alias("k"),
            F.struct("region", "top").alias("doc"),
        )

    return ViewDef(
        name="lf_top2_by_region",
        fn=recompute,
        deps={table},
        topk=TopKViewSpec(
            table=table,
            keys=["region"],
            order_col="amount",
            id_col="id",
            k=2,
            buffer=1,
            row_schema=ROW_SCHEMA,
        ),
    )


def _hll_view(table="lf_custs"):
    def recompute(spark):
        from sinker_spark import ivm_hll

        est = ivm_hll.hll_estimate(
            ivm_hll.initial_hll_state(spark.table(table), ["region"], "cust"),
            ["region"],
        )
        return est.select(
            F.col("region").alias("id"),
            F.struct("region", "n_distinct_est").alias("doc"),
        )

    return ViewDef(
        name="lf_distinct_custs",
        fn=recompute,
        deps={table},
        distinct=DistinctViewSpec(
            table=table, keys=["region"], value_col="cust", row_schema=HLL_SCHEMA
        ),
    )


def _engine(spark, tmp_path, view):
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_agg_fold_after_fallback_matches_truth(spark, tmp_path):
    """fold → missing-before-image fallback → fold: the last fold must
    start from state that reflects the fallback batch."""
    eng, sink = _engine(spark, tmp_path, _agg_view())
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0)], ROW_SCHEMA)
    # b1 (foldable insert): legacy snapshot-point init + fold
    eng.process_cdc_batch(_cdc(spark, "lf_sales", [(1, "INSERT", {"id": "4", "region": "eu", "amount": 2.5}, None)]))
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 3, "sum_amt": 32.5}
    # b2: DELETE of id=2 WITHOUT a before-image -> recompute fallback
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("3", "us", 5.0), ("4", "eu", 2.5)], ROW_SCHEMA)
    eng.process_cdc_batch(_cdc(spark, "lf_sales", [(2, "DELETE", None, None)]))
    assert "delta_agg" not in eng.last_stats["lf_sales_by_region"]
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 12.5}
    # b3 (foldable insert): must fold into REPAIRED state, not pre-b2 state
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("3", "us", 5.0), ("4", "eu", 2.5), ("5", "eu", 1.0)], ROW_SCHEMA)
    eng.process_cdc_batch(_cdc(spark, "lf_sales", [(3, "INSERT", {"id": "5", "region": "eu", "amount": 1.0}, None)]))
    assert eng.last_stats["lf_sales_by_region"].get("delta_agg") == 1
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 3, "sum_amt": 13.5}


def test_fallback_repairs_sink_divergence_and_ghosts(spark, tmp_path):
    """The fallback must repair keys the delta lanes changed since the
    last snapshot write — including a value changed BACK to its
    snapshot value (diff-invisible) and a lane-created group that no
    longer exists (ghost)."""
    eng, sink = _engine(spark, tmp_path, _agg_view())
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("2", "us", 5.0)], ROW_SCHEMA)
    eng.backfill()
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 1, "sum_amt": 10.0}
    # b1 (foldable): eu amount 10->20; new group ap created by the lane
    eng.process_cdc_batch(_cdc(spark, "lf_sales", [
        (1, "UPDATE", {"id": "1", "region": "eu", "amount": 20.0}, {"id": "1", "region": "eu", "amount": 10.0}),
        (2, "INSERT", {"id": "3", "region": "ap", "amount": 7.0}, None),
    ]))
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 1, "sum_amt": 20.0}
    assert sink.get("lf_sales_by_region", "ap") == {"region": "ap", "n_rows": 1, "sum_amt": 7.0}
    # b2 (unfoldable): eu back to 10 (with image) + ap row deleted
    # WITHOUT an image -> whole batch falls back to recompute
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("2", "us", 5.0)], ROW_SCHEMA)
    eng.process_cdc_batch(_cdc(spark, "lf_sales", [
        (3, "UPDATE", {"id": "1", "region": "eu", "amount": 10.0}, {"id": "1", "region": "eu", "amount": 20.0}),
        (4, "DELETE", None, None),
    ]))
    # diff-invisible repair: recompute(eu)=10.0 equals the stale
    # snapshot, but the sink held 20.0 — it must still be repaired
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 1, "sum_amt": 10.0}
    # ghost: ap exists in neither the snapshot nor the recompute — the
    # fallback must know the lane created it and delete it
    assert sink.get("lf_sales_by_region", "ap") is None


def test_topk_fold_after_fallback_matches_truth(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path, _topk_view())
    _register(
        spark,
        "lf_scores",
        [("1", "eu", 40.0), ("2", "eu", 30.0), ("3", "eu", 20.0), ("4", "eu", 10.0)],
        ROW_SCHEMA,
    )
    # b1 (foldable insert): legacy snapshot-point init + fold
    eng.process_cdc_batch(_cdc(spark, "lf_scores", [(1, "INSERT", {"id": "5", "region": "eu", "amount": 5.0}, None)]))
    doc = sink.get("lf_top2_by_region", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("1", 40.0), ("2", 30.0)]
    # b2: DELETE of the leader WITHOUT a before-image -> fallback
    _register(
        spark,
        "lf_scores",
        [("2", "eu", 30.0), ("3", "eu", 20.0), ("4", "eu", 10.0), ("5", "eu", 5.0)],
        ROW_SCHEMA,
    )
    eng.process_cdc_batch(_cdc(spark, "lf_scores", [(2, "DELETE", None, None)]))
    doc = sink.get("lf_top2_by_region", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("2", 30.0), ("3", 20.0)]
    # b3 (foldable delete WITH image): the stale pre-b2 rows-state still
    # held id=1 (40.0) — a correct engine serves (20.0, 10.0) now
    _register(
        spark,
        "lf_scores",
        [("3", "eu", 20.0), ("4", "eu", 10.0), ("5", "eu", 5.0)],
        ROW_SCHEMA,
    )
    eng.process_cdc_batch(_cdc(spark, "lf_scores", [
        (3, "DELETE", None, {"id": "2", "region": "eu", "amount": 30.0}),
    ]))
    doc = sink.get("lf_top2_by_region", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("3", 20.0), ("4", 10.0)]


def test_hll_registers_rebuilt_after_delete_fallback(spark, tmp_path):
    from sinker_spark import ivm_hll

    eng, sink = _engine(spark, tmp_path, _hll_view())
    _register(spark, "lf_custs", [("1", "eu", "c1"), ("2", "eu", "c2")], HLL_SCHEMA)
    # b1 (insert-only, foldable)
    eng.process_cdc_batch(_cdc(spark, "lf_custs", [(1, "INSERT", {"id": "3", "region": "eu", "cust": "c3"}, None)]))
    # b2: delete c3 -> monotone lane falls back to recompute
    _register(spark, "lf_custs", [("1", "eu", "c1"), ("2", "eu", "c2")], HLL_SCHEMA)
    eng.process_cdc_batch(_cdc(spark, "lf_custs", [
        (2, "DELETE", None, {"id": "3", "region": "eu", "cust": "c3"}),
    ]))
    # b3 (insert-only, foldable): registers must no longer contain c3
    _register(spark, "lf_custs", [("1", "eu", "c1"), ("2", "eu", "c2"), ("4", "eu", "c4")], HLL_SCHEMA)
    eng.process_cdc_batch(_cdc(spark, "lf_custs", [(3, "INSERT", {"id": "4", "region": "eu", "cust": "c4"}, None)]))
    expected = ivm_hll.hll_estimate(
        ivm_hll.initial_hll_state(spark.table("lf_custs"), ["region"], "cust"), ["region"]
    ).collect()[0]["n_distinct_est"]
    assert sink.get("lf_distinct_custs", "eu")["n_distinct_est"] == pytest.approx(expected)


def test_backfill_seeds_lane_state_for_live_table_contract(spark, tmp_path):
    """After backfill() the lane state is seeded at the snapshot point,
    so the first CDC batch folds exactly once even when the catalog
    table already reflects it (live tables always do — the CDC feed
    lags the table it describes)."""
    eng, sink = _engine(spark, tmp_path, _agg_view())
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("2", "us", 5.0)], ROW_SCHEMA)
    eng.backfill()
    # live-table contract: the table ALREADY contains the b1 row when
    # the batch is processed
    _register(spark, "lf_sales", [("1", "eu", 10.0), ("2", "us", 5.0), ("3", "eu", 2.5)], ROW_SCHEMA)
    eng.process_cdc_batch(_cdc(spark, "lf_sales", [(1, "INSERT", {"id": "3", "region": "eu", "amount": 2.5}, None)]))
    assert eng.last_stats["lf_sales_by_region"].get("delta_agg") == 1
    assert sink.get("lf_sales_by_region", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 12.5}
