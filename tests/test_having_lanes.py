"""HAVING-filtered aggregate lanes: AggViewSpec.having /
JoinAggViewSpec.having serve only groups passing the predicate, emit a
DELETE when a touched group crosses out, an upsert when it crosses in,
and keep full state for every group so crossings are exact in both
directions. The recompute/fallback lane applies the same filter via the
view's own sql/fn (SQL HAVING), so both paths agree."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import AggViewSpec, JoinAggViewSpec, ViewDef

ROW_SCHEMA = "id string, region string, amount double"
DIM_SCHEMA = "region string, mgr string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)
HAVING = "n_rows >= 2 AND sum_amt > 20.0"


def _fact(spark, rows):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView("hsales")


def _dims(spark, rows):
    spark.createDataFrame(rows, DIM_SCHEMA).createOrReplaceTempView("hdims")


def _agg_view():
    def recompute(spark):
        served = (
            spark.table("hsales")
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_dec"),
            )
            .select(
                "region",
                "n_rows",
                F.col("sum_dec").cast("double").alias("sum_amt"),
            )
            .where(F.expr(HAVING))
        )
        return served.select(
            F.col("region").alias("id"),
            F.struct("region", "n_rows", "sum_amt").alias("doc"),
        )

    return ViewDef(
        name="big_regions",
        fn=recompute,
        deps={"hsales"},
        agg=AggViewSpec(
            table="hsales",
            keys=["region"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            row_schema=ROW_SCHEMA,
            having=HAVING,
        ),
    )


def _cdc(spark, records, table="hsales"):
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("id", (after or before or {}).get("region", "?")),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


@pytest.fixture()
def agg_engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_agg_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_backfill_serves_passing_groups_only(spark, agg_engine):
    eng, sink = agg_engine
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0), ("3", "us", 5.0)])
    eng.backfill()
    assert sink.get("big_regions", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 25.0}
    assert sink.get("big_regions", "us") is None


def test_group_crosses_into_predicate(spark, agg_engine):
    eng, sink = agg_engine
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0), ("3", "us", 5.0)])
    eng.backfill()
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0), ("3", "us", 5.0), ("4", "us", 30.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "4", "region": "us", "amount": 30.0}, None),
    ]))
    assert eng.last_stats["big_regions"].get("delta_agg") == 1
    assert sink.get("big_regions", "us") == {"region": "us", "n_rows": 2, "sum_amt": 35.0}


def test_group_crosses_out_of_predicate_retracts(spark, agg_engine):
    eng, sink = agg_engine
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0)])
    eng.backfill()
    assert sink.get("big_regions", "eu") is not None
    _fact(spark, [("2", "eu", 10.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "DELETE", None, {"id": "1", "region": "eu", "amount": 15.0}),
    ]))
    assert eng.last_stats["big_regions"].get("delta_agg") == 1
    # group still EXISTS (1 row) but fails HAVING -> doc retracted
    assert sink.get("big_regions", "eu") is None
    assert ("big_regions", "delete", "eu") in sink.action_log
    # ... and crossing back in works off the kept state
    _fact(spark, [("2", "eu", 10.0), ("5", "eu", 40.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "INSERT", {"id": "5", "region": "eu", "amount": 40.0}, None),
    ]))
    assert sink.get("big_regions", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 50.0}


def test_failing_touched_group_gets_no_upsert(spark, agg_engine):
    eng, sink = agg_engine
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0)])
    eng.backfill()
    log_before = len(sink.action_log)
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0), ("6", "ap", 100.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "6", "region": "ap", "amount": 100.0}, None),
    ]))
    # ap has 1 row -> fails n_rows >= 2: no doc, and crucially no
    # delete-storm either (it was never served); the lane emits a
    # delete only for the touched-but-not-served key
    assert sink.get("big_regions", "ap") is None
    ops = [(op, key) for _, op, key in sink.action_log[log_before:]]
    assert ("upsert", "ap") not in ops


def _joinagg_view():
    def recompute(spark):
        j = spark.table("hsales").join(spark.table("hdims"), "region")
        served = (
            j.groupBy("mgr")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_dec"),
            )
            .select("mgr", "n_rows", F.col("sum_dec").cast("double").alias("sum_amt"))
            .where(F.expr(HAVING))
        )
        return served.select(
            F.col("mgr").alias("id"),
            F.struct("mgr", "n_rows", "sum_amt").alias("doc"),
        )

    return ViewDef(
        name="big_mgrs",
        fn=recompute,
        deps={"hsales", "hdims"},
        joinagg=JoinAggViewSpec(
            table_a="hsales",
            table_b="hdims",
            on=["region"],
            row_schema_a=ROW_SCHEMA,
            row_schema_b=DIM_SCHEMA,
            keys=["mgr"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            having=HAVING,
        ),
    )


@pytest.fixture()
def joinagg_engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_joinagg_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_joinagg_having_crossings(spark, joinagg_engine):
    eng, sink = joinagg_engine
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0), ("3", "us", 50.0)])
    _dims(spark, [("eu", "ada"), ("us", "bob")])
    eng.backfill()
    assert sink.get("big_mgrs", "ada") == {"mgr": "ada", "n_rows": 2, "sum_amt": 25.0}
    assert sink.get("big_mgrs", "bob") is None  # 1 row: fails
    # bob crosses in
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 10.0), ("3", "us", 50.0), ("4", "us", 1.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "4", "region": "us", "amount": 1.0}, None),
    ]))
    assert eng.last_stats["big_mgrs"].get("join_agg") == 1
    assert sink.get("big_mgrs", "bob") == {"mgr": "bob", "n_rows": 2, "sum_amt": 51.0}
    # ada crosses out (sum drops to 20.0, predicate demands > 20.0)
    _fact(spark, [("1", "eu", 15.0), ("2", "eu", 5.0), ("3", "us", 50.0), ("4", "us", 1.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "UPDATE", {"id": "2", "region": "eu", "amount": 5.0},
         {"id": "2", "region": "eu", "amount": 10.0}),
    ]))
    assert eng.last_stats["big_mgrs"].get("join_agg") == 1
    assert sink.get("big_mgrs", "ada") is None
    assert ("big_mgrs", "delete", "ada") in sink.action_log
