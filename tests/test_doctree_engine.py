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


# ----------------------------------------------- branched dim trees (r6)

K_SCHEMA = "kkey bigint, kname string"
BT_ORDERS = [(1, 10, 70), (2, 10, 71), (3, 11, 70), (4, 12, 71)]
BT_CLERKS = [(70, "kim"), (71, "lee")]


def _bt_tables(spark, orders, custs, nations, clerks):
    spark.createDataFrame(orders or [], "okey bigint, cust bigint, clerk bigint") \
        .createOrReplaceTempView("bt_orders")
    spark.createDataFrame(custs or [], C_SCHEMA).createOrReplaceTempView("bt_cust")
    spark.createDataFrame(nations or [], N_SCHEMA).createOrReplaceTempView("bt_nation")
    spark.createDataFrame(clerks or [], K_SCHEMA).createOrReplaceTempView("bt_clerk")


def _bt_view():
    def recompute(spark):
        o = spark.table("bt_orders")
        c = spark.table("bt_cust")
        n = spark.table("bt_nation")
        k = spark.table("bt_clerk")
        cur = (
            o.join(c, o["cust"] == c["ckey"], "inner").drop("ckey")
            .join(n, F.col("nkey") == n["natkey"], "inner").drop("natkey")
            .join(k, F.col("clerk") == k["kkey"], "inner").drop("kkey")
        )
        return cur.select(
            F.col("okey").cast("string").alias("k"),
            F.struct("okey", "cust", "clerk", "cname", "nkey", "nname",
                     "kname").alias("doc"),
        )

    return ViewDef(
        name="bt_view", fn=recompute, key="k",
        deps={"bt_orders", "bt_cust", "bt_nation", "bt_clerk"},
        doctree=DocTreeViewSpec(
            parent_table="bt_orders", key="okey",
            row_schema_parent="okey bigint, cust bigint, clerk bigint",
            dim_forest=[
                DimLookup("bt_cust", fk="cust", key="ckey", row_schema=C_SCHEMA,
                          children=[DimLookup("bt_nation", fk="nkey",
                                              key="natkey", row_schema=N_SCHEMA)]),
                DimLookup("bt_clerk", fk="clerk", key="kkey", row_schema=K_SCHEMA),
            ],
        ),
    )


def _bt_truth(spark):
    from sinker_spark.sinks.memory import _row_to_plain

    return {r["k"]: _row_to_plain(r["doc"]) for r in _bt_view().fn(spark).collect()}


@pytest.fixture()
def bt_engine(spark, tmp_path):
    _bt_tables(spark, list(BT_ORDERS), list(CUSTS), list(NATIONS), list(BT_CLERKS))
    sink = InMemorySink()
    eng = SyncEngine(spark, [_bt_view()], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert sink.indices.get("bt_view", {}) == _bt_truth(spark)
    return eng, sink


def test_branched_forest_state_naming_is_preorder(spark):
    """dim_forest normalization: d0=cust, d1=nation (child of d0),
    d2=clerk (second parent-anchored root) — and the reverse indexes
    anchor on the right referrers."""
    from sinker_spark.ivm_flagship import doc_tree_states

    states = {s.suffix: s for s in doc_tree_states(_bt_view().doctree)}
    assert states["d0"].table == "bt_cust"
    assert states["d1"].table == "bt_nation"
    assert states["d2"].table == "bt_clerk"
    assert states["rp0"].table == "bt_orders" and states["rp0"].source == "p"
    assert states["rp1"].table == "bt_cust" and states["rp1"].source == "d0"
    assert states["rp2"].table == "bt_orders" and states["rp2"].source == "p"


def test_branched_fanout_walks_each_branch(spark, bt_engine):
    eng, sink = bt_engine
    # clerk 70 rename → orders 1,3 only (branch-2 reverse index)
    clerks = [(70, "kim2"), (71, "lee")]
    _bt_tables(spark, list(BT_ORDERS), list(CUSTS), list(NATIONS), clerks)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "bt_clerk", "UPDATE", {"kkey": 70, "kname": "kim2"},
         {"kkey": 70, "kname": "kim"}),
    ]), epoch_id=1)
    assert eng.last_stats["bt_view"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"1", "3"}
    assert sink.indices.get("bt_view", {}) == _bt_truth(spark)

    # nation 100 rename → custs 10,11 → orders 1,2,3 (branch-1 walk,
    # two hops); order 4 (jp) untouched
    nations = [(100, "de!"), (200, "jp")]
    _bt_tables(spark, list(BT_ORDERS), list(CUSTS), nations, clerks)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "bt_nation", "UPDATE", {"natkey": 100, "nname": "de!"},
         {"natkey": 100, "nname": "de"}),
    ]), epoch_id=2)
    assert eng.last_stats["bt_view"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"1", "2", "3"}
    assert sink.indices.get("bt_view", {}) == _bt_truth(spark)


def test_branched_retraction_and_repoint(spark, bt_engine):
    eng, sink = bt_engine
    # clerk 71 delete → docs 2,4 retract (inner chain on branch 2)
    clerks = [(70, "kim")]
    _bt_tables(spark, list(BT_ORDERS), list(CUSTS), list(NATIONS), clerks)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "bt_clerk", "DELETE", None, {"kkey": 71, "kname": "lee"}),
    ]), epoch_id=1)
    assert eng.last_stats["bt_view"].get("doc_tree") == 1
    assert sink.get("bt_view", "2") is None and sink.get("bt_view", "4") is None
    assert sink.indices.get("bt_view", {}) == _bt_truth(spark)

    # re-point order 2's clerk to 70 → doc reappears with kim
    orders = [(1, 10, 70), (2, 10, 70), (3, 11, 70), (4, 12, 71)]
    _bt_tables(spark, orders, list(CUSTS), list(NATIONS), clerks)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "bt_orders", "UPDATE", {"okey": 2, "cust": 10, "clerk": 70},
         {"okey": 2, "cust": 10, "clerk": 71}),
    ]), epoch_id=2)
    assert eng.last_stats["bt_view"].get("doc_tree") == 1
    assert sink.get("bt_view", "2")["kname"] == "kim"
    # replay the same batch verbatim: signed fold must not double-apply
    eng.process_cdc_batch(_cdc(spark, [
        (2, "bt_orders", "UPDATE", {"okey": 2, "cust": 10, "clerk": 70},
         {"okey": 2, "cust": 10, "clerk": 71}),
    ]), epoch_id=2)
    assert sink.indices.get("bt_view", {}) == _bt_truth(spark)
