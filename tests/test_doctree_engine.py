"""SyncEngine doc-tree lane (DocTreeViewSpec / runner._doctree_refresh):
the COMPLETE flagship document shape — parent + to-one dim chain +
child array with per-element dim lookups (reference course_mv.sql:1-26:
course→teacher→person chain, enrollments array with student→person
element lookups) — maintained by the ENGINE as a pure delta fold with
persistent key-local states across batches.

The gate queries (ivm_flagship_doc) prove the fold algebra on one
simulated batch; this suite proves the ENGINE integration: persistent
states across many batches, dim fan-out through stored reverse
indexes (a nation rename touches exactly the docs in that nation — no
rescans), chain retraction, replay suppression, before-image fallback,
and the lane-vs-recompute contract after every batch.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec, ViewDef

O_SCHEMA = "okey bigint, cust bigint"
C_SCHEMA = "ckey bigint, cname string, nkey bigint"
N_SCHEMA = "natkey bigint, nname string"
L_SCHEMA = "lokey bigint, line bigint, qty double, pkey bigint"
P_SCHEMA = "partkey bigint, pname string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _tables(spark, orders, custs, nations, lines, parts):
    spark.createDataFrame(orders or [], O_SCHEMA).createOrReplaceTempView("dt_orders")
    spark.createDataFrame(custs or [], C_SCHEMA).createOrReplaceTempView("dt_cust")
    spark.createDataFrame(nations or [], N_SCHEMA).createOrReplaceTempView("dt_nation")
    spark.createDataFrame(lines or [], L_SCHEMA).createOrReplaceTempView("dt_lines")
    spark.createDataFrame(parts or [], P_SCHEMA).createOrReplaceTempView("dt_part")


def _view():
    def recompute(spark):
        o = spark.table("dt_orders")
        c = spark.table("dt_cust")
        n = spark.table("dt_nation")
        li = spark.table("dt_lines")
        p = spark.table("dt_part")
        elem = li.join(p, li["pkey"] == p["partkey"], "left").drop("partkey")
        pair = F.struct(
            F.col("line").alias("__o0"), F.col("qty").alias("__o1"),
            F.col("pkey").alias("__o2"),
            F.struct("line", "qty", "pkey", "pname").alias("__c"),
        )
        arrays = elem.groupBy("lokey").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("items")
        )
        cur = (
            o.join(c, o["cust"] == c["ckey"], "inner").drop("ckey")
            .join(n, F.col("nkey") == n["natkey"], "inner").drop("natkey")
            .join(arrays, F.col("okey") == F.col("lokey"), "left").drop("lokey")
        )
        arr_type = cur.schema["items"].dataType
        cur = cur.withColumn("items", F.coalesce(F.col("items"), F.array().cast(arr_type)))
        return cur.select(
            F.col("okey").cast("string").alias("k"),
            F.struct("okey", "cust", "cname", "nkey", "nname", "items").alias("doc"),
        )

    return ViewDef(
        name="dt_view", fn=recompute, key="k",
        deps={"dt_orders", "dt_cust", "dt_nation", "dt_lines", "dt_part"},
        doctree=DocTreeViewSpec(
            parent_table="dt_orders", key="okey", row_schema_parent=O_SCHEMA,
            dims=[
                DimLookup("dt_cust", fk="cust", key="ckey", row_schema=C_SCHEMA),
                DimLookup("dt_nation", fk="nkey", key="natkey", row_schema=N_SCHEMA),
            ],
            children=[
                ChildArraySpec(
                    table="dt_lines", fk="lokey", row_schema=L_SCHEMA,
                    alias="items", order=["line", "qty", "pkey"],
                    dims=[DimLookup("dt_part", fk="pkey", key="partkey",
                                    row_schema=P_SCHEMA)],
                )
            ],
        ),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn, "public", table, op,
            str((after or before or {}).get("okey", "?")),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


ORDERS = [(1, 10), (2, 10), (3, 11), (4, 12)]
CUSTS = [(10, "ann", 100), (11, "bob", 100), (12, "cy", 200)]
NATIONS = [(100, "de"), (200, "jp")]
LINES = [(1, 1, 5.0, 7), (1, 2, 3.0, 8), (2, 1, 1.0, 7), (3, 1, 2.0, 9)]
PARTS = [(7, "bolt"), (8, "nut"), (9, "gear")]


def _truth(spark):
    """Recompute fn evaluated on the live tables → {doc_id: plain doc}."""
    from sinker_spark.sinks.memory import _row_to_plain

    return {
        r["k"]: _row_to_plain(r["doc"])
        for r in _view().fn(spark).collect()
    }


def _check(spark, sink):
    assert sink.indices.get("dt_view", {}) == _truth(spark)


@pytest.fixture()
def engine(spark, tmp_path):
    _tables(spark, list(ORDERS), list(CUSTS), list(NATIONS), list(LINES), list(PARTS))
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    _check(spark, sink)
    return eng, sink


def test_one_batch_mutating_all_five_tables(spark, engine):
    eng, sink = engine
    # order insert; line insert + delete; customer rename; nation rename;
    # part rename — every constituent table in ONE batch
    orders = ORDERS + [(5, 11)]
    lines = [x for x in LINES if x != (2, 1, 1.0, 7)] + [(5, 1, 9.0, 8)]
    custs = [(10, "ann2", 100), (11, "bob", 100), (12, "cy", 200)]
    nations = [(100, "de"), (200, "jp!")]
    parts = [(7, "bolt*"), (8, "nut"), (9, "gear")]
    _tables(spark, orders, custs, nations, lines, parts)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "dt_orders", "INSERT", {"okey": 5, "cust": 11}, None),
        (2, "dt_lines", "INSERT", {"okey": None, "lokey": 5, "line": 1, "qty": 9.0, "pkey": 8}, None),
        (3, "dt_lines", "DELETE", None, {"lokey": 2, "line": 1, "qty": 1.0, "pkey": 7}),
        (4, "dt_cust", "UPDATE", {"ckey": 10, "cname": "ann2", "nkey": 100},
         {"ckey": 10, "cname": "ann", "nkey": 100}),
        (5, "dt_nation", "UPDATE", {"natkey": 200, "nname": "jp!"}, {"natkey": 200, "nname": "jp"}),
        (6, "dt_part", "UPDATE", {"partkey": 7, "pname": "bolt*"}, {"partkey": 7, "pname": "bolt"}),
    ]), epoch_id=1)
    assert eng.last_stats["dt_view"].get("doc_tree") == 1
    _check(spark, sink)


def test_dim_fanout_touches_exactly_affected_docs(spark, engine):
    eng, sink = engine
    # nation 100 rename: customers 10,11 → orders 1,2,3 — order 4 (jp)
    # must NOT be re-upserted (no rescans; reverse-index walk only)
    nations = [(100, "de2"), (200, "jp")]
    _tables(spark, list(ORDERS), list(CUSTS), nations, list(LINES), list(PARTS))
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (10, "dt_nation", "UPDATE", {"natkey": 100, "nname": "de2"},
         {"natkey": 100, "nname": "de"}),
    ]), epoch_id=1)
    assert eng.last_stats["dt_view"].get("doc_tree") == 1
    touched = {k for (_, op, k) in sink.action_log[log_before:]}
    assert touched == {"1", "2", "3"}
    _check(spark, sink)

    # element-dim fan-out: part 7 rename touches docs 1 and 2 only
    parts = [(7, "bolt9", ), (8, "nut"), (9, "gear")]
    parts = [(7, "bolt9"), (8, "nut"), (9, "gear")]
    _tables(spark, list(ORDERS), list(CUSTS), nations, list(LINES), parts)
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (11, "dt_part", "UPDATE", {"partkey": 7, "pname": "bolt9"},
         {"partkey": 7, "pname": "bolt"}),
    ]), epoch_id=2)
    touched = {k for (_, op, k) in sink.action_log[log_before:]}
    assert touched == {"1", "2"}
    _check(spark, sink)


def test_parent_delete_and_broken_chain_retract(spark, engine):
    eng, sink = engine
    # parent delete retracts doc 4
    orders = [x for x in ORDERS if x[0] != 4]
    _tables(spark, orders, list(CUSTS), list(NATIONS), list(LINES), list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (20, "dt_orders", "DELETE", None, {"okey": 4, "cust": 12}),
    ]), epoch_id=1)
    assert "4" not in sink.indices["dt_view"]
    _check(spark, sink)

    # customer delete breaks the chain for orders 1,2 → both retract
    custs = [x for x in CUSTS if x[0] != 10]
    _tables(spark, orders, custs, list(NATIONS), list(LINES), list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (21, "dt_cust", "DELETE", None, {"ckey": 10, "cname": "ann", "nkey": 100}),
    ]), epoch_id=2)
    assert "1" not in sink.indices["dt_view"] and "2" not in sink.indices["dt_view"]
    _check(spark, sink)

    # re-pointing order 3 to another customer serves the new chain
    orders2 = [(3, 12) if x[0] == 3 else x for x in orders]
    _tables(spark, orders2, custs, list(NATIONS), list(LINES), list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (22, "dt_orders", "UPDATE", {"okey": 3, "cust": 12}, {"okey": 3, "cust": 11}),
    ]), epoch_id=3)
    assert sink.indices["dt_view"]["3"]["cname"] == "cy"
    _check(spark, sink)


def test_replay_suppressed_and_missing_before_image_falls_back(spark, engine):
    eng, sink = engine
    lines = LINES + [(4, 1, 8.0, 9)]
    _tables(spark, list(ORDERS), list(CUSTS), list(NATIONS), lines, list(PARTS))
    batch = _cdc(spark, [
        (30, "dt_lines", "INSERT", {"lokey": 4, "line": 1, "qty": 8.0, "pkey": 9}, None),
    ])
    eng.process_cdc_batch(batch, epoch_id=1)
    assert eng.last_stats["dt_view"].get("doc_tree") == 1
    _check(spark, sink)
    # verbatim redelivery: signed fold must not double-apply
    eng.process_cdc_batch(batch, epoch_id=1)
    _check(spark, sink)

    # a mutating row WITHOUT its before-image cannot fold → authoritative
    # fallback repairs and the next batch folds again
    lines2 = [x for x in lines if x != (1, 2, 3.0, 8)]
    _tables(spark, list(ORDERS), list(CUSTS), list(NATIONS), lines2, list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (31, "dt_lines", "DELETE", None, None),
    ]), epoch_id=2)
    assert "lane_fallback" in eng.last_stats["dt_view"]
    _check(spark, sink)
    lines3 = lines2 + [(2, 2, 6.0, 8)]
    _tables(spark, list(ORDERS), list(CUSTS), list(NATIONS), lines3, list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (32, "dt_lines", "INSERT", {"lokey": 2, "line": 2, "qty": 6.0, "pkey": 8}, None),
    ]), epoch_id=3)
    assert eng.last_stats["dt_view"].get("doc_tree") == 1
    _check(spark, sink)


T_SCHEMA = "tokey bigint, tag string"


def _flat_view(spark, tags_rows):
    """Depth-0 doc tree: NO to-one chain, parent + TWO child arrays —
    the minimal composition the randomized engine fuzzer also draws
    (tools/fuzz_engine.make_doctree_view with depth=0, two_children)."""
    spark.createDataFrame(tags_rows or [], T_SCHEMA).createOrReplaceTempView("dt_tags")

    def recompute(spark):
        o = spark.table("dt_orders")
        li = spark.table("dt_lines")
        tg = spark.table("dt_tags")
        pair = F.struct(
            F.col("line").alias("__o0"), F.col("qty").alias("__o1"),
            F.col("pkey").alias("__o2"),
            F.struct("line", "qty", "pkey").alias("__c"),
        )
        items = li.groupBy("lokey").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("items")
        )
        tpair = F.struct(F.col("tag").alias("__o0"), F.struct("tag").alias("__c"))
        tags = tg.groupBy("tokey").agg(
            F.transform(F.array_sort(F.collect_list(tpair)), lambda x: x["__c"]).alias("tags")
        )
        cur = (
            o.join(items, F.col("okey") == F.col("lokey"), "left").drop("lokey")
            .join(tags, F.col("okey") == F.col("tokey"), "left").drop("tokey")
        )
        it = cur.schema["items"].dataType
        tt = cur.schema["tags"].dataType
        cur = cur.withColumn("items", F.coalesce(F.col("items"), F.array().cast(it)))
        cur = cur.withColumn("tags", F.coalesce(F.col("tags"), F.array().cast(tt)))
        return cur.select(
            F.col("okey").cast("string").alias("k"),
            F.struct("okey", "cust", "items", "tags").alias("doc"),
        )

    return ViewDef(
        name="dt_flat", fn=recompute, key="k",
        deps={"dt_orders", "dt_lines", "dt_tags"},
        doctree=DocTreeViewSpec(
            parent_table="dt_orders", key="okey", row_schema_parent=O_SCHEMA,
            dims=[],
            children=[
                ChildArraySpec(table="dt_lines", fk="lokey", row_schema=L_SCHEMA,
                               alias="items", order=["line", "qty", "pkey"]),
                ChildArraySpec(table="dt_tags", fk="tokey", row_schema=T_SCHEMA,
                               alias="tags", order=["tag"]),
            ],
        ),
    )


def test_depth0_multichild_folds(spark, tmp_path):
    from sinker_spark.sinks.memory import _row_to_plain

    _tables(spark, list(ORDERS), list(CUSTS), list(NATIONS), list(LINES), list(PARTS))
    tags = [(1, "red"), (1, "big"), (3, "red")]
    view = _flat_view(spark, tags)
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()

    def check():
        want = {r["k"]: _row_to_plain(r["doc"]) for r in view.fn(spark).collect()}
        assert sink.indices.get("dt_flat", {}) == want

    check()
    # one batch mutating the parent and BOTH children
    orders = [x for x in ORDERS if x[0] != 2] + [(6, 12)]
    lines = [x for x in LINES if x[0] != 2] + [(6, 1, 4.0, 9)]
    tags2 = [(1, "big"), (3, "red"), (6, "new")]
    _tables(spark, orders, list(CUSTS), list(NATIONS), lines, list(PARTS))
    spark.createDataFrame(tags2, T_SCHEMA).createOrReplaceTempView("dt_tags")
    batch = _cdc(spark, [
        (40, "dt_orders", "DELETE", None, {"okey": 2, "cust": 10}),
        (41, "dt_orders", "INSERT", {"okey": 6, "cust": 12}, None),
        (42, "dt_lines", "DELETE", None, {"lokey": 2, "line": 1, "qty": 1.0, "pkey": 7}),
        (43, "dt_lines", "INSERT", {"lokey": 6, "line": 1, "qty": 4.0, "pkey": 9}, None),
        (44, "dt_tags", "DELETE", None, {"tokey": 1, "tag": "red"}),
        (45, "dt_tags", "INSERT", {"tokey": 6, "tag": "new"}, None),
    ])
    eng.process_cdc_batch(batch, epoch_id=1)
    assert eng.last_stats["dt_flat"].get("doc_tree") == 1
    assert "2" not in sink.indices["dt_flat"]
    assert sink.indices["dt_flat"]["6"]["tags"] == [{"tag": "new"}]
    check()
    # verbatim redelivery must not double-apply
    eng.process_cdc_batch(batch, epoch_id=1)
    check()
