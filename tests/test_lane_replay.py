"""At-least-once replay safety for the algebraic delta lanes.

The agg/topk/join/joinagg folds apply SIGNED deltas, so a redelivered
batch — a foreachBatch epoch replayed after a crash, or a pg_slot peek
re-serving a tail that was processed but not yet advanced — must not
fold twice. The engine's replay guard (runner._lane_guard) drops rows
at or below the per-view lane watermark (max folded lsn) and detects
torn multi-snapshot state writes via recorded store versions, routing
those to the authoritative lane-fallback rebuild.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import AggViewSpec, TopKViewSpec, ViewDef

ROW_SCHEMA = "id string, region string, amount double"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _register(spark, rows, table="lr_sales"):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView(table)


def _cdc(spark, records, table="lr_sales"):
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


def _agg_view():
    def recompute(spark):
        return (
            spark.table("lr_sales")
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
        name="lr_sales_by_region",
        fn=recompute,
        deps={"lr_sales"},
        agg=AggViewSpec(
            table="lr_sales",
            keys=["region"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            row_schema=ROW_SCHEMA,
        ),
    )


def _topk_view():
    def recompute(spark):
        from pyspark.sql.window import Window

        w = Window.partitionBy("region").orderBy(F.desc("amount"), F.asc("id"))
        ranked = (
            spark.table("lr_sales")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 2)
        )
        return ranked.groupBy("region").agg(
            F.sort_array(F.collect_list(F.struct("rank", "id", "amount"))).alias("top")
        ).select(F.col("region").alias("k"), F.struct("region", "top").alias("doc"))

    return ViewDef(
        name="lr_top2",
        fn=recompute,
        deps={"lr_sales"},
        topk=TopKViewSpec(
            table="lr_sales",
            keys=["region"],
            order_col="amount",
            id_col="id",
            k=2,
            buffer=1,
            row_schema=ROW_SCHEMA,
        ),
    )


def _engine(spark, tmp_path, view):
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_replayed_batch_does_not_double_fold(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path, _agg_view())
    _register(spark, [("1", "eu", 10.0), ("2", "us", 5.0)])
    eng.backfill()
    _register(spark, [("1", "eu", 10.0), ("2", "us", 5.0), ("3", "eu", 2.5)])
    batch = _cdc(spark, [(7, "INSERT", {"id": "3", "region": "eu", "amount": 2.5}, None)])
    eng.process_cdc_batch(batch, epoch_id=1)
    assert sink.get("lr_sales_by_region", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 12.5}
    # at-least-once redelivery of the SAME batch (epoch replay)
    eng.process_cdc_batch(batch, epoch_id=1)
    assert eng.last_stats["lr_sales_by_region"].get("delta_agg") == 1
    assert sink.get("lr_sales_by_region", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 12.5}


def test_partial_overlap_redelivery_folds_only_new_rows(spark, tmp_path):
    """pg_slot shape: after a crash between process and advance, the
    next peek re-serves the processed tail PLUS newer changes. Only the
    rows beyond the lane watermark may fold."""
    eng, sink = _engine(spark, tmp_path, _agg_view())
    _register(spark, [("1", "eu", 10.0)])
    eng.backfill()
    _register(spark, [("1", "eu", 10.0), ("2", "eu", 4.0)])
    eng.process_cdc_batch(_cdc(spark, [(5, "INSERT", {"id": "2", "region": "eu", "amount": 4.0}, None)]))
    assert sink.get("lr_sales_by_region", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 14.0}
    # redelivered lsn=5 row + genuinely new lsn=6 row in one batch
    _register(spark, [("1", "eu", 10.0), ("2", "eu", 4.0), ("3", "eu", 1.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (5, "INSERT", {"id": "2", "region": "eu", "amount": 4.0}, None),
        (6, "INSERT", {"id": "3", "region": "eu", "amount": 1.0}, None),
    ]))
    assert eng.last_stats["lr_sales_by_region"].get("delta_agg") == 1
    assert sink.get("lr_sales_by_region", "eu") == {"region": "eu", "n_rows": 3, "sum_amt": 15.0}


def test_replayed_delete_batch_topk(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path, _topk_view())
    _register(spark, [("1", "eu", 40.0), ("2", "eu", 30.0), ("3", "eu", 20.0)])
    eng.backfill()
    _register(spark, [("2", "eu", 30.0), ("3", "eu", 20.0)])
    batch = _cdc(spark, [(9, "DELETE", None, {"id": "1", "region": "eu", "amount": 40.0})])
    eng.process_cdc_batch(batch)
    doc = sink.get("lr_top2", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("2", 30.0), ("3", 20.0)]
    # replay: the group total must not decrement twice (a double-fold
    # would leave __n_total=1 and corrupt later dirty detection)
    eng.process_cdc_batch(batch)
    doc = sink.get("lr_top2", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("2", 30.0), ("3", 20.0)]
    # prove the maintained count is still the truth: delete one more row
    # with the count at 2, the group must still serve the survivor
    _register(spark, [("3", "eu", 20.0)])
    eng.process_cdc_batch(_cdc(spark, [(10, "DELETE", None, {"id": "2", "region": "eu", "amount": 30.0})]))
    doc = sink.get("lr_top2", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("3", 20.0)]


def test_torn_state_write_detected_and_rebuilt(spark, tmp_path):
    """Simulate a crash that committed only part of a lane's
    multi-snapshot state write: the version check must flag the tear,
    decline the fold, and rebuild through the authoritative fallback."""
    eng, sink = _engine(spark, tmp_path, _topk_view())
    _register(spark, [("1", "eu", 40.0), ("2", "eu", 30.0), ("3", "eu", 20.0)])
    eng.backfill()
    # tear: bump one of the two top-k state snapshots out from under the
    # marker (as if the crash happened between the two writes)
    packed = eng.store.read("lr_top2__topkrows")
    eng.store.write("lr_top2__topkrows", packed.select("id", "doc"), key="id")
    _register(spark, [("1", "eu", 40.0), ("2", "eu", 30.0), ("3", "eu", 20.0), ("4", "eu", 50.0)])
    eng.process_cdc_batch(_cdc(spark, [(3, "INSERT", {"id": "4", "region": "eu", "amount": 50.0}, None)]))
    stats = eng.last_stats["lr_top2"]
    assert stats.get("lane_fallback") == 1 and "topk" not in stats
    doc = sink.get("lr_top2", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("4", 50.0), ("1", 40.0)]
    # and the rebuilt state folds cleanly again on the next batch
    _register(spark, [("1", "eu", 40.0), ("2", "eu", 30.0), ("3", "eu", 20.0), ("4", "eu", 50.0), ("5", "eu", 45.0)])
    eng.process_cdc_batch(_cdc(spark, [(4, "INSERT", {"id": "5", "region": "eu", "amount": 45.0}, None)]))
    assert eng.last_stats["lr_top2"].get("topk") == 1
    doc = sink.get("lr_top2", "eu")
    assert [(t["id"], t["amount"]) for t in doc["top"]] == [("4", 50.0), ("5", 45.0)]
