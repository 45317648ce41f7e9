"""SyncEngine composed lane (JoinAggViewSpec): an aggregate over a
two-table join maintained end to end — join deltas fold into aggregate
state through signed multiplicities, only touched groups reach the
sink, groups that empty out are deleted, and missing before-images fall
back to the recompute lane."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import JoinAggViewSpec, ViewDef

ORDERS_SCHEMA = "order_id bigint, cust string"
LINES_SCHEMA = "order_id bigint, qty bigint"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _facts(spark, orders, lines):
    spark.createDataFrame(orders, ORDERS_SCHEMA).createOrReplaceTempView("ja_orders")
    spark.createDataFrame(lines, LINES_SCHEMA).createOrReplaceTempView("ja_lines")


def _view():
    def recompute(spark):
        j = spark.table("ja_orders").join(spark.table("ja_lines"), "order_id")
        agg = j.groupBy("cust").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.expr("CAST(qty AS DECIMAL(18,0))")).cast("double").alias("sum_qty"),
        )
        return agg.select(
            F.col("cust").alias("id"),
            F.struct("cust", "n_rows", "sum_qty").alias("doc"),
        )

    return ViewDef(
        name="cust_line_totals",
        fn=recompute,
        deps={"ja_orders", "ja_lines"},
        joinagg=JoinAggViewSpec(
            table_a="ja_orders",
            table_b="ja_lines",
            on=["order_id"],
            row_schema_a=ORDERS_SCHEMA,
            row_schema_b=LINES_SCHEMA,
            keys=["cust"],
            sums={"sum_qty": "CAST(qty AS DECIMAL(18,0))"},
        ),
    )


def _cdc(spark, records):
    rows = [
        (lsn, "public", table, op, "x",
         json.dumps(after) if after else None,
         json.dumps(before) if before else None)
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


@pytest.fixture()
def engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


ORDERS = [(1, "a"), (2, "a"), (3, "b")]
LINES = [(1, 10), (1, 20), (2, 5), (3, 7)]


def _doc(sink, cust):
    d = sink.get("cust_line_totals", cust)
    return (d["n_rows"], d["sum_qty"]) if d else None


def test_line_insert_folds_through_the_join(spark, engine):
    eng, sink = engine
    _facts(spark, ORDERS, LINES)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "ja_lines", "INSERT", {"order_id": 2, "qty": 9}, None),
    ]))
    assert eng.last_stats["cust_line_totals"].get("join_agg") == 1
    assert sink.ids("cust_line_totals") == {"a"}  # b untouched
    assert _doc(sink, "a") == (4, 44.0)


def test_order_delete_cascades_fanout_and_group_delete(spark, engine):
    eng, sink = engine
    _facts(spark, ORDERS, LINES)
    # delete order 1 (fan-out 2) and order 3 (b's only order)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "ja_orders", "DELETE", None, {"order_id": 1, "cust": "a"}),
        (2, "ja_orders", "DELETE", None, {"order_id": 3, "cust": "b"}),
    ]))
    assert eng.last_stats["cust_line_totals"] == {
        "upserts": 1, "deletes": 1, "join_agg": 1,
    }
    assert _doc(sink, "a") == (1, 5.0)           # only order 2's line remains
    assert "b" not in sink.ids("cust_line_totals")  # b's group vanished


def test_both_sides_change_in_one_batch(spark, engine):
    eng, sink = engine
    _facts(spark, ORDERS, LINES)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "ja_orders", "INSERT", {"order_id": 4, "cust": "c"}, None),
        (2, "ja_lines", "INSERT", {"order_id": 4, "qty": 100}, None),   # ΔA⋈ΔB term
        (3, "ja_lines", "DELETE", None, {"order_id": 1, "qty": 20}),
    ]))
    assert _doc(sink, "c") == (1, 100.0)
    assert _doc(sink, "a") == (2, 15.0)


def test_state_survives_batches_and_missing_before_image_falls_back(spark, engine):
    eng, sink = engine
    _facts(spark, ORDERS, LINES)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "ja_lines", "INSERT", {"order_id": 3, "qty": 1}, None),
    ]))
    eng.process_cdc_batch(_cdc(spark, [
        (2, "ja_lines", "INSERT", {"order_id": 3, "qty": 2}, None),
    ]))
    assert _doc(sink, "b") == (3, 10.0)
    # malformed delete (no before-image) → recompute lane
    eng.process_cdc_batch(_cdc(spark, [(3, "ja_lines", "DELETE", None, None)]))
    assert "join_agg" not in eng.last_stats["cust_line_totals"]


def test_state_persists_across_engine_restart(spark, tmp_path):
    """A NEW SyncEngine over the same store resumes the aggregate and
    base-relation states — the post-restart fold reflects pre-restart
    changes that are NOT in the catalog tables."""
    store = SnapshotStore(spark, str(tmp_path / "snap2"))
    eng1 = SyncEngine(spark, [_view()], InMemorySink(), store)
    _facts(spark, ORDERS, LINES)
    eng1.process_cdc_batch(_cdc(spark, [
        (1, "ja_lines", "INSERT", {"order_id": 2, "qty": 9}, None),
    ]))

    sink2 = InMemorySink()
    eng2 = SyncEngine(spark, [_view()], sink2, store)
    eng2.process_cdc_batch(_cdc(spark, [
        (2, "ja_lines", "DELETE", None, {"order_id": 2, "qty": 9}),
    ]))
    assert eng2.last_stats["cust_line_totals"].get("join_agg") == 1
    # net effect of insert-then-delete across the restart is zero
    assert _doc(sink2, "a") == (3, 35.0)


# -- aggregate over a LEFT OUTER join (JoinAggViewSpec.how='left') --------


def _loj_agg_view():
    def recompute(spark):
        j = spark.table("ja_orders").join(spark.table("ja_lines"), "order_id", "left")
        agg = j.groupBy("cust").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.expr("CAST(qty AS DECIMAL(18,0))")).cast("double").alias("sum_qty"),
        )
        return agg.select(
            F.col("cust").alias("id"),
            F.struct("cust", "n_rows", "sum_qty").alias("doc"),
        )

    return ViewDef(
        name="cust_line_totals_loj",
        fn=recompute,
        deps={"ja_orders", "ja_lines"},
        joinagg=JoinAggViewSpec(
            table_a="ja_orders",
            table_b="ja_lines",
            on=["order_id"],
            row_schema_a=ORDERS_SCHEMA,
            row_schema_b=LINES_SCHEMA,
            keys=["cust"],
            sums={"sum_qty": "CAST(qty AS DECIMAL(18,0))"},
            how="left",
        ),
    )


def test_loj_agg_counts_lineless_orders(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(
        spark, [_loj_agg_view()], sink, SnapshotStore(spark, str(tmp_path / "snap"))
    )
    # bob's order o2 has NO lines: LOJ semantics count it as one row
    _facts(spark, [(1, "alice"), (2, "bob")], [(1, 5), (1, 3)])
    eng.backfill()
    assert sink.get("cust_line_totals_loj", "alice") == {"cust": "alice", "n_rows": 2, "sum_qty": 8.0}
    assert sink.get("cust_line_totals_loj", "bob") == {"cust": "bob", "n_rows": 1, "sum_qty": None}
    # first line for o2: the padded row's count is REPLACED, not added
    _facts(spark, [(1, "alice"), (2, "bob")], [(1, 5), (1, 3), (2, 7)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "ja_lines", "INSERT", {"order_id": 2, "qty": 7}, None),
    ]))
    assert eng.last_stats["cust_line_totals_loj"].get("join_agg") == 1
    assert sink.get("cust_line_totals_loj", "bob") == {"cust": "bob", "n_rows": 1, "sum_qty": 7.0}
    # losing the last line re-pads: count stays 1, sum returns to NULL
    _facts(spark, [(1, "alice"), (2, "bob")], [(1, 5), (1, 3)])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "ja_lines", "DELETE", None, {"order_id": 2, "qty": 7}),
    ]))
    assert sink.get("cust_line_totals_loj", "bob") == {"cust": "bob", "n_rows": 1, "sum_qty": None}
