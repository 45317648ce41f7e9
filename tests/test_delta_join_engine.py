"""SyncEngine delta-join lane: two-table join views refresh via the
bilinear IVM rule — CDC batches produce the signed join delta against
stored base-relation multiplicity state, emit actions for touched doc
keys only, persist all three states across batches, and fall back to
the recompute lane when before-images are missing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import JoinViewSpec, ViewDef

A_SCHEMA = "oid string, cust string"
B_SCHEMA = "lid string, oid string, qty bigint"
CDC_COLS = "lsn bigint, schema string, table string, op string, id string, payload string, payload_before string"


def _tables(spark, a_rows, b_rows):
    spark.createDataFrame(a_rows, A_SCHEMA).createOrReplaceTempView("ord")
    spark.createDataFrame(b_rows, B_SCHEMA).createOrReplaceTempView("item")


def _view():
    def recompute(spark):
        j = spark.table("ord").join(spark.table("item"), "oid")
        return j.select(
            F.concat_ws("|", "oid", "lid").alias("id"),
            F.struct("oid", "cust", "lid", "qty", F.lit(1).cast("bigint").alias("n_rows")).alias("doc"),
        )

    return ViewDef(
        name="order_items",
        fn=recompute,
        deps={"ord", "item"},
        join=JoinViewSpec(
            table_a="ord",
            table_b="item",
            on=["oid"],
            row_schema_a=A_SCHEMA,
            row_schema_b=B_SCHEMA,
            key_cols=["oid", "lid"],
        ),
    )


def _cdc(spark, records):
    """records: (lsn, table, op, after|None, before|None)."""
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("oid", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


@pytest.fixture()
def engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_insert_joins_against_stored_state(spark, engine):
    eng, sink = engine
    _tables(
        spark,
        [("o1", "alice"), ("o2", "bob")],
        [("l1", "o1", 5), ("l2", "o1", 3)],
    )
    # new line for o2 — must join against the STORED ord state
    batch = _cdc(spark, [(1, "item", "INSERT", {"lid": "l3", "oid": "o2", "qty": 7}, None)])
    eng.process_cdc_batch(batch, epoch_id=1)
    assert eng.last_stats["order_items"].get("delta_join") == 1
    assert sink.get("order_items", "o2|l3") == {
        "oid": "o2", "cust": "bob", "lid": "l3", "qty": 7, "n_rows": 1,
    }
    # untouched docs got no action
    assert eng.last_stats["order_items"]["upserts"] == 1
    assert eng.last_stats["order_items"]["deletes"] == 0


def test_delete_removes_joined_docs_fanout(spark, engine):
    eng, sink = engine
    _tables(
        spark,
        [("o1", "alice")],
        [("l1", "o1", 5), ("l2", "o1", 3)],
    )
    # seed states with an empty-ish batch: insert then delete a dummy line
    eng.process_cdc_batch(
        _cdc(spark, [(1, "item", "INSERT", {"lid": "lx", "oid": "o1", "qty": 1}, None)]),
        epoch_id=1,
    )
    # deleting the ORDER must delete every joined doc (fan-out through B)
    batch = _cdc(spark, [(2, "ord", "DELETE", None, {"oid": "o1", "cust": "alice"})])
    eng.process_cdc_batch(batch, epoch_id=2)
    assert eng.last_stats["order_items"]["deletes"] == 3  # l1, l2, lx docs
    assert sink.get("order_items", "o1|l1") is None
    assert sink.get("order_items", "o1|l2") is None


def test_update_emits_upsert_for_changed_rows(spark, engine):
    eng, sink = engine
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5)])
    batch = _cdc(
        spark,
        [(1, "item", "UPDATE", {"lid": "l1", "oid": "o1", "qty": 9}, {"lid": "l1", "oid": "o1", "qty": 5})],
    )
    eng.process_cdc_batch(batch, epoch_id=1)
    assert eng.last_stats["order_items"].get("delta_join") == 1
    assert sink.get("order_items", "o1|l1")["qty"] == 9


def test_state_persists_across_batches(spark, engine):
    eng, sink = engine
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5)])
    eng.process_cdc_batch(
        _cdc(spark, [(1, "ord", "INSERT", {"oid": "o2", "cust": "bob"}, None)]), epoch_id=1
    )
    # second batch: the line insert must see o2 from PERSISTED a-state,
    # not from the temp view (prove it: change the temp view underneath)
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5)])
    eng.process_cdc_batch(
        _cdc(spark, [(2, "item", "INSERT", {"lid": "l9", "oid": "o2", "qty": 2}, None)]), epoch_id=2
    )
    assert sink.get("order_items", "o2|l9")["cust"] == "bob"


def test_missing_before_image_falls_back_to_recompute(spark, engine):
    eng, sink = engine
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5)])
    batch = _cdc(spark, [(1, "item", "DELETE", None, None)])  # no before-image
    eng.process_cdc_batch(batch, epoch_id=1)
    stats = eng.last_stats["order_items"]
    assert "delta_join" not in stats  # recompute lane handled it


# -- left-outer-join lane (JoinViewSpec.how='left') -----------------------


def _loj_view():
    def recompute(spark):
        item = spark.table("item").withColumn("__matched", F.lit(True))
        j = (
            spark.table("ord")
            .join(item, "oid", "left")
            .withColumn("__matched", F.coalesce(F.col("__matched"), F.lit(False)))
        )
        return j.select(
            F.concat_ws("|", "oid", "lid").alias("id"),
            F.struct(
                "oid", "cust", "lid", "qty", "__matched",
                F.lit(1).cast("bigint").alias("n_rows"),
            ).alias("doc"),
        )

    return ViewDef(
        name="order_items_loj",
        fn=recompute,
        deps={"ord", "item"},
        join=JoinViewSpec(
            table_a="ord",
            table_b="item",
            on=["oid"],
            row_schema_a=A_SCHEMA,
            row_schema_b=B_SCHEMA,
            key_cols=["oid", "lid"],
            how="left",
        ),
    )


@pytest.fixture()
def loj_engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_loj_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_loj_backfill_pads_then_first_item_flips(spark, loj_engine):
    eng, sink = loj_engine
    _tables(spark, [("o1", "alice"), ("o2", "bob")], [("l1", "o1", 5)])
    eng.backfill()
    assert sink.get("order_items_loj", "o2") == {
        "oid": "o2", "cust": "bob", "lid": None, "qty": None, "__matched": False, "n_rows": 1,
    }
    _tables(spark, [("o1", "alice"), ("o2", "bob")], [("l1", "o1", 5), ("l2", "o2", 7)])
    eng.process_cdc_batch(_cdc(spark, [(1, "item", "INSERT", {"lid": "l2", "oid": "o2", "qty": 7}, None)]))
    assert eng.last_stats["order_items_loj"].get("delta_join") == 1
    assert sink.get("order_items_loj", "o2") is None  # pad retracted
    assert sink.get("order_items_loj", "o2|l2") == {
        "oid": "o2", "cust": "bob", "lid": "l2", "qty": 7, "__matched": True, "n_rows": 1,
    }


def test_loj_last_item_loss_restores_pad(spark, loj_engine):
    eng, sink = loj_engine
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5)])
    eng.backfill()
    _tables(spark, [("o1", "alice")], [])
    eng.process_cdc_batch(_cdc(spark, [(1, "item", "DELETE", None, {"lid": "l1", "oid": "o1", "qty": 5})]))
    assert sink.get("order_items_loj", "o1|l1") is None
    assert sink.get("order_items_loj", "o1") == {
        "oid": "o1", "cust": "alice", "lid": None, "qty": None, "__matched": False, "n_rows": 1,
    }


def test_loj_new_order_without_items_pads(spark, loj_engine):
    eng, sink = loj_engine
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5)])
    eng.backfill()
    _tables(spark, [("o1", "alice"), ("o3", "cara")], [("l1", "o1", 5)])
    eng.process_cdc_batch(_cdc(spark, [(1, "ord", "INSERT", {"oid": "o3", "cust": "cara"}, None)]))
    assert sink.get("order_items_loj", "o3") == {
        "oid": "o3", "cust": "cara", "lid": None, "qty": None, "__matched": False, "n_rows": 1,
    }
    # and the matched docs were untouched
    assert sink.get("order_items_loj", "o1|l1")["qty"] == 5


# -- full-outer-join lane (JoinViewSpec.how='full') -----------------------


def _foj_view():
    def recompute(spark):
        am = spark.table("ord").withColumn("__ap", F.lit(True))
        bm = spark.table("item").withColumn("__bp", F.lit(True))
        j = am.join(bm, "oid", "full").withColumn(
            "__matched",
            F.coalesce(F.col("__ap"), F.lit(False)) & F.coalesce(F.col("__bp"), F.lit(False)),
        ).drop("__ap", "__bp")
        return j.select(
            F.concat_ws("|", "oid", "lid").alias("id"),
            F.struct(
                "oid", "cust", "lid", "qty", "__matched",
                F.lit(1).cast("bigint").alias("n_rows"),
            ).alias("doc"),
        )

    return ViewDef(
        name="order_items_foj",
        fn=recompute,
        deps={"ord", "item"},
        join=JoinViewSpec(
            table_a="ord",
            table_b="item",
            on=["oid"],
            row_schema_a=A_SCHEMA,
            row_schema_b=B_SCHEMA,
            key_cols=["oid", "lid"],
            how="full",
        ),
    )


def test_foj_orphan_item_pads_then_order_arrival_flips(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_foj_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5), ("l9", "o9", 9)])
    eng.backfill()
    # orphan item (no order o9): b-side pad with NULL order columns
    assert sink.get("order_items_foj", "o9|l9") == {
        "oid": "o9", "cust": None, "lid": "l9", "qty": 9, "__matched": False, "n_rows": 1,
    }
    # the order arrives: pad flips to a matched doc (same id, upsert)
    _tables(spark, [("o1", "alice"), ("o9", "zoe")], [("l1", "o1", 5), ("l9", "o9", 9)])
    eng.process_cdc_batch(_cdc(spark, [(1, "ord", "INSERT", {"oid": "o9", "cust": "zoe"}, None)]))
    assert eng.last_stats["order_items_foj"].get("delta_join") == 1
    assert sink.get("order_items_foj", "o9|l9") == {
        "oid": "o9", "cust": "zoe", "lid": "l9", "qty": 9, "__matched": True, "n_rows": 1,
    }
    # and deleting the order re-pads the item side
    _tables(spark, [("o1", "alice")], [("l1", "o1", 5), ("l9", "o9", 9)])
    eng.process_cdc_batch(_cdc(spark, [(2, "ord", "DELETE", None, {"oid": "o9", "cust": "zoe"})]))
    assert sink.get("order_items_foj", "o9|l9") == {
        "oid": "o9", "cust": None, "lid": "l9", "qty": 9, "__matched": False, "n_rows": 1,
    }
