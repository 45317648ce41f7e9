"""SyncEngine HLL distinct-count lane: INSERT-only batches MAX-merge
into stored registers (O(batch), no fact scan), estimates land in the
sink for touched groups only, replay is idempotent, and deletes fall
back to the authoritative recompute lane."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import DistinctViewSpec, ViewDef

ROW_SCHEMA = "id string, region string, user_id bigint"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _fact(spark, rows):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView("visits")


def _view():
    def recompute(spark):
        from sinker_spark.ivm_hll import hll_estimate, initial_hll_state

        est = hll_estimate(
            initial_hll_state(spark.table("visits"), ["region"], "user_id"), ["region"]
        )
        return est.select(
            F.col("region").alias("id"),
            F.struct("region", "n_distinct_est").alias("doc"),
        )

    return ViewDef(
        name="visitors_by_region",
        fn=recompute,
        deps={"visits"},
        distinct=DistinctViewSpec(
            table="visits", keys=["region"], value_col="user_id", row_schema=ROW_SCHEMA
        ),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn,
            "public",
            "visits",
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


def test_insert_batch_folds_without_fact_scan(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), "eu", i) for i in range(40)] + [("u1", "us", 1)])
    batch = _cdc(spark, [
        (1, "INSERT", {"id": "n1", "region": "eu", "user_id": 4000}, None),
        (2, "INSERT", {"id": "n2", "region": "eu", "user_id": 4001}, None),
    ])
    eng.process_cdc_batch(batch)
    assert eng.last_stats["visitors_by_region"].get("hll_distinct") == 1
    # only the touched group (eu) was written
    assert sink.ids("visitors_by_region") == {"eu"}
    est = sink.get("visitors_by_region", "eu")["n_distinct_est"]
    assert abs(est - 42) / 42 <= 0.39  # 3-sigma bound for 64 registers


def test_replay_is_idempotent(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), "eu", i) for i in range(30)])
    batch = _cdc(spark, [(1, "INSERT", {"id": "x", "region": "eu", "user_id": 999}, None)])
    eng.process_cdc_batch(batch)
    first = sink.get("visitors_by_region", "eu")["n_distinct_est"]
    eng.process_cdc_batch(batch)  # at-least-once replay
    assert eng.last_stats["visitors_by_region"].get("hll_distinct") == 1
    assert sink.get("visitors_by_region", "eu")["n_distinct_est"] == first


def test_delete_falls_back_to_recompute(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), "eu", i) for i in range(20)])
    batch = _cdc(spark, [
        (1, "DELETE", None, {"id": "3", "region": "eu", "user_id": 3}),
    ])
    eng.process_cdc_batch(batch)
    stats = eng.last_stats["visitors_by_region"]
    assert "hll_distinct" not in stats  # monotone registers can't fold deletes
