"""SyncEngine delta-aggregate lane: keyed-aggregate views fold CDC
batches into stored state (O(batch), no fact recompute), emit actions
for touched groups only, persist exact decimal state across batches,
and fall back to the recompute lane when before-images are missing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import AggViewSpec, ViewDef

ROW_SCHEMA = "id string, region string, amount double"
CDC_COLS = "lsn bigint, schema string, table string, op string, id string, payload string, payload_before string"


def _fact(spark, rows):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView("sales")


def _view():
    def recompute(spark):
        return (
            spark.table("sales")
            .groupBy("region")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_amt"))
            .select(
                F.col("region").alias("id"),
                F.struct("region", "n_rows", F.col("sum_amt").cast("double").alias("sum_amt")).alias("doc"),
            )
        )

    return ViewDef(
        name="sales_by_region",
        fn=recompute,
        deps={"sales"},
        agg=AggViewSpec(
            table="sales",
            keys=["region"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            row_schema=ROW_SCHEMA,
        ),
    )


def _cdc(spark, records):
    """records: (lsn, op, after_row|None, before_row|None) on table sales."""
    rows = [
        (
            lsn,
            "public",
            "sales",
            op,
            (after or before or {}).get("id", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


@pytest.fixture()
def engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_fold_touched_groups_only(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0)])
    batch = _cdc(spark, [
        (1, "INSERT", {"id": "4", "region": "eu", "amount": 2.5}, None),
        (2, "INSERT", {"id": "5", "region": "ap", "amount": 7.0}, None),
    ])
    eng.process_cdc_batch(batch)
    assert eng.last_stats["sales_by_region"].get("delta_agg") == 1
    assert sink.get("sales_by_region", "eu") == {"region": "eu", "n_rows": 3, "sum_amt": 32.5}
    assert sink.get("sales_by_region", "ap") == {"region": "ap", "n_rows": 1, "sum_amt": 7.0}
    # untouched group gets no action at all
    assert all(key != "us" for _, _, key in sink.action_log)


def test_update_delete_and_group_vanish(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0)])
    # batch 1: establish state
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "4", "region": "us", "amount": 1.0}, None),
    ]))
    # state must now come from the store, not the fact table: poison the
    # fact view to prove no re-initialization happens
    _fact(spark, [("9", "zz", 999.0)])
    # batch 2: update one eu row (delete+insert images) and delete both us rows
    eng.process_cdc_batch(_cdc(spark, [
        (2, "UPDATE", {"id": "2", "region": "eu", "amount": 25.0}, {"id": "2", "region": "eu", "amount": 20.0}),
        (3, "DELETE", None, {"id": "3", "region": "us", "amount": 5.0}),
        (4, "DELETE", None, {"id": "4", "region": "us", "amount": 1.0}),
    ]))
    assert sink.get("sales_by_region", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 35.0}
    assert sink.get("sales_by_region", "us") is None  # group vanished -> delete
    assert ("sales_by_region", "delete", "us") in sink.action_log


def test_missing_before_image_falls_back_to_recompute(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10.0), ("2", "us", 5.0)])
    # DELETE with no before-image: the fold can't process it; the
    # recompute lane must take over (fact table already reflects the
    # delete in this lane's contract)
    _fact(spark, [("1", "eu", 10.0)])
    batch = _cdc(spark, [(1, "DELETE", None, None)])
    eng.process_cdc_batch(batch)
    stats = eng.last_stats["sales_by_region"]
    assert "delta_agg" not in stats
    assert sink.get("sales_by_region", "eu") == {"region": "eu", "n_rows": 1, "sum_amt": 10.0}
    assert sink.get("sales_by_region", "us") is None


# -- min/max hybrid in the lane (AggViewSpec.maxes/mins) ------------------


def _mm_view():
    def recompute(spark):
        return (
            spark.table("sales")
            .groupBy("region")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_amt"),
                 F.max("amount").alias("max_amt"),
                 F.min("amount").alias("min_amt"))
            .select(
                F.col("region").alias("id"),
                F.struct(
                    "region", "n_rows",
                    F.col("sum_amt").cast("double").alias("sum_amt"),
                    F.col("max_amt").cast("double").alias("max_amt"),
                    F.col("min_amt").cast("double").alias("min_amt"),
                ).alias("doc"),
            )
        )

    return ViewDef(
        name="sales_minmax",
        fn=recompute,
        deps={"sales"},
        agg=AggViewSpec(
            table="sales",
            keys=["region"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            maxes={"max_amt": "amount"},
            mins={"min_amt": "amount"},
            row_schema=ROW_SCHEMA,
        ),
    )


@pytest.fixture()
def mm_engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_mm_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_minmax_insert_fold_no_fact_scan(spark, mm_engine):
    eng, sink = mm_engine
    _fact(spark, [("1", "eu", 10.0), ("2", "eu", 20.0)])
    eng.backfill()
    # poison the fact: an insert-only fold must not read it (extremes
    # are monotone under inserts — no heal, no scan)
    _fact(spark, [("9", "zz", 999.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "3", "region": "eu", "amount": 25.0}, None),
    ]))
    stats = eng.last_stats["sales_minmax"]
    assert stats.get("delta_agg") == 1 and stats.get("minmax_dirty") == 0
    assert sink.get("sales_minmax", "eu") == {
        "region": "eu", "n_rows": 3, "sum_amt": 55.0, "max_amt": 25.0, "min_amt": 10.0,
    }


def test_minmax_delete_of_extreme_heals_scoped(spark, mm_engine):
    eng, sink = mm_engine
    _fact(spark, [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0)])
    eng.backfill()
    # delete the eu max (with image); live-table contract: fact already
    # reflects the delete when the batch is processed
    _fact(spark, [("1", "eu", 10.0), ("3", "us", 5.0)])
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "DELETE", None, {"id": "2", "region": "eu", "amount": 20.0}),
    ]))
    stats = eng.last_stats["sales_minmax"]
    assert stats.get("delta_agg") == 1 and stats.get("minmax_dirty") == 1
    assert sink.get("sales_minmax", "eu") == {
        "region": "eu", "n_rows": 1, "sum_amt": 10.0, "max_amt": 10.0, "min_amt": 10.0,
    }
    # untouched group got no action from the fold (backfill upserted it)
    assert all(key != "us" for _, _, key in sink.action_log[log_before:])


def test_minmax_delete_recovered_by_insert_no_heal(spark, mm_engine):
    eng, sink = mm_engine
    _fact(spark, [("1", "eu", 10.0), ("2", "eu", 20.0)])
    eng.backfill()
    _fact(spark, [("1", "eu", 10.0), ("4", "eu", 30.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "DELETE", None, {"id": "2", "region": "eu", "amount": 20.0}),
        (2, "INSERT", {"id": "4", "region": "eu", "amount": 30.0}, None),
    ]))
    stats = eng.last_stats["sales_minmax"]
    assert stats.get("delta_agg") == 1 and stats.get("minmax_dirty") == 0
    assert sink.get("sales_minmax", "eu") == {
        "region": "eu", "n_rows": 2, "sum_amt": 40.0, "max_amt": 30.0, "min_amt": 10.0,
    }
