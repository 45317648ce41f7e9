"""NESTED to-many doc trees (ChildArraySpec.children): customer docs
carrying an orders[] array whose ELEMENTS each carry their own
lineitems[] sub-array with a part element-dim — the reference README
person example generalized one to-many level down — maintained by the
ENGINE as a pure delta fold with persistent key-local states.

Exercised here: state naming (depth-1 names stay bit-for-bit, nested
states get path suffixes + the child→container ``rk`` ascent index),
fold-vs-recompute parity across batches mutating every level, minimal
fan-out (a part rename reaches exactly the root docs whose grandchild
rows reference it, via the dim walk + rk ascent — no rescans),
grandchild/child re-pointing (both containers re-served), replay
suppression, and retraction.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec, ViewDef

C_SCHEMA = "ckey bigint, cname string"
O_SCHEMA = "okey bigint, cust bigint, ostat string"
L_SCHEMA = "lord bigint, line bigint, qty double, pkey bigint"
P_SCHEMA = "partkey bigint, pname string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _tables(spark, custs, orders, lines, parts):
    spark.createDataFrame(custs or [], C_SCHEMA).createOrReplaceTempView("nx_cust")
    spark.createDataFrame(orders or [], O_SCHEMA).createOrReplaceTempView("nx_orders")
    spark.createDataFrame(lines or [], L_SCHEMA).createOrReplaceTempView("nx_lines")
    spark.createDataFrame(parts or [], P_SCHEMA).createOrReplaceTempView("nx_part")


def _spec() -> DocTreeViewSpec:
    return DocTreeViewSpec(
        parent_table="nx_cust", key="ckey", row_schema_parent=C_SCHEMA,
        children=[
            ChildArraySpec(
                table="nx_orders", fk="cust", row_schema=O_SCHEMA,
                alias="ords", order=["okey"], key="okey",
                children=[
                    ChildArraySpec(
                        table="nx_lines", fk="lord", row_schema=L_SCHEMA,
                        alias="items", order=["line", "qty", "pkey"],
                        dims=[DimLookup("nx_part", fk="pkey", key="partkey",
                                        row_schema=P_SCHEMA)],
                    )
                ],
            )
        ],
    )


def _view():
    def recompute(spark):
        c = spark.table("nx_cust")
        o = spark.table("nx_orders")
        li = spark.table("nx_lines")
        p = spark.table("nx_part")
        elem = li.join(p, li["pkey"] == p["partkey"], "left").drop("partkey")
        pair = F.struct(
            F.col("line").alias("__o0"), F.col("qty").alias("__o1"),
            F.col("pkey").alias("__o2"),
            F.struct("line", "qty", "pkey", "pname").alias("__c"),
        )
        items = elem.groupBy("lord").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("items")
        )
        oe = o.join(items, F.col("okey") == F.col("lord"), "left").drop("lord")
        it = oe.schema["items"].dataType
        oe = oe.withColumn("items", F.coalesce(F.col("items"), F.array().cast(it)))
        opair = F.struct(
            F.col("okey").alias("__o0"),
            F.struct("okey", "ostat", "items").alias("__c"),
        )
        ords = oe.groupBy("cust").agg(
            F.transform(F.array_sort(F.collect_list(opair)), lambda x: x["__c"]).alias("ords")
        )
        cur = c.join(ords, F.col("ckey") == F.col("cust"), "left").drop("cust")
        ot = cur.schema["ords"].dataType
        cur = cur.withColumn("ords", F.coalesce(F.col("ords"), F.array().cast(ot)))
        return cur.select(
            F.col("ckey").cast("string").alias("k"),
            F.struct("ckey", "cname", "ords").alias("doc"),
        )

    return ViewDef(
        name="nx_view", fn=recompute, key="k",
        deps={"nx_cust", "nx_orders", "nx_lines", "nx_part"},
        doctree=_spec(),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn, "public", table, op,
            str((after or before or {}).get("ckey", "?")),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


CUSTS = [(10, "ann"), (11, "bob"), (12, "cy")]
ORDERS = [(1, 10, "O"), (2, 10, "F"), (3, 11, "O"), (4, 12, "P")]
LINES = [
    (1, 1, 5.0, 7), (1, 2, 3.0, 8), (2, 1, 1.0, 7), (3, 1, 2.0, 9),
    (4, 1, 4.0, 8),
]
PARTS = [(7, "bolt"), (8, "nut"), (9, "gear")]


def _truth(spark):
    from sinker_spark.sinks.memory import _row_to_plain

    return {r["k"]: _row_to_plain(r["doc"]) for r in _view().fn(spark).collect()}


def _check(spark, sink):
    assert sink.indices.get("nx_view", {}) == _truth(spark)


@pytest.fixture()
def engine(spark, tmp_path):
    _tables(spark, list(CUSTS), list(ORDERS), list(LINES), list(PARTS))
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    _check(spark, sink)
    return eng, sink


def test_state_naming_depth1_unchanged_and_nested_suffixed():
    from sinker_spark.ivm_flagship import doc_tree_states

    # depth-1 spec: historical flat names, bit-for-bit
    flat = DocTreeViewSpec(
        parent_table="t", key="k", row_schema_parent="k bigint",
        dims=[DimLookup("d", fk="f", key="dk", row_schema="dk bigint, v string")],
        children=[ChildArraySpec(
            table="c", fk="f2", row_schema="f2 bigint, x bigint", alias="a",
            dims=[DimLookup("e", fk="x", key="ek", row_schema="ek bigint, w string")],
        )],
    )
    assert [s.suffix for s in doc_tree_states(flat)] == [
        "p", "d0", "rp0", "c0", "c0d0", "rc00",
    ]
    # nested spec: path suffixes + one rk ascent index per nesting container
    nested = _spec()
    assert [s.suffix for s in doc_tree_states(nested)] == [
        "p", "c0", "rkc0", "c0x0", "c0x0d0", "rc0x00",
    ]
    rk = next(s for s in doc_tree_states(nested) if s.suffix == "rkc0")
    assert rk.cols == ("okey", "cust") and rk.key_cols == ("okey",) and rk.source == "c0"


def test_nested_requires_child_key():
    with pytest.raises(ValueError, match="unique `key`"):
        ChildArraySpec(
            table="c", fk="f", row_schema="f bigint", alias="a",
            children=[ChildArraySpec(table="g", fk="gf",
                                     row_schema="gf bigint", alias="b")],
        )
    from sinker_spark.ivm_flagship import doc_tree_states

    bad = DocTreeViewSpec(
        parent_table="t", key="k", row_schema_parent="k bigint",
        children=[ChildArraySpec(
            table="c", fk="f", row_schema="f bigint, x bigint", alias="a",
            key="nope",
            children=[ChildArraySpec(table="g", fk="gf",
                                     row_schema="gf bigint, y bigint", alias="b")],
        )],
    )
    with pytest.raises(ValueError, match="row_schema"):
        doc_tree_states(bad)


def test_one_batch_mutating_all_four_tables(spark, engine):
    eng, sink = engine
    custs = [(10, "ann2"), (11, "bob"), (12, "cy")]
    orders = ORDERS + [(5, 11, "O")]
    lines = [x for x in LINES if x != (2, 1, 1.0, 7)] + [(5, 1, 9.0, 8)]
    parts = [(7, "bolt*"), (8, "nut"), (9, "gear")]
    _tables(spark, custs, orders, lines, parts)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nx_cust", "UPDATE", {"ckey": 10, "cname": "ann2"},
         {"ckey": 10, "cname": "ann"}),
        (2, "nx_orders", "INSERT", {"okey": 5, "cust": 11, "ostat": "O"}, None),
        (3, "nx_lines", "INSERT", {"lord": 5, "line": 1, "qty": 9.0, "pkey": 8}, None),
        (4, "nx_lines", "DELETE", None, {"lord": 2, "line": 1, "qty": 1.0, "pkey": 7}),
        (5, "nx_part", "UPDATE", {"partkey": 7, "pname": "bolt*"},
         {"partkey": 7, "pname": "bolt"}),
    ]), epoch_id=1)
    assert eng.last_stats["nx_view"].get("doc_tree") == 1
    _check(spark, sink)


def test_grandchild_dim_fanout_exact(spark, engine):
    eng, sink = engine
    # part 9 is referenced only by line (3,...) → order 3 → customer 11:
    # the rename must re-serve doc 11 ONLY (dim walk + rk ascent)
    parts = [(7, "bolt"), (8, "nut"), (9, "gear2")]
    _tables(spark, list(CUSTS), list(ORDERS), list(LINES), parts)
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (10, "nx_part", "UPDATE", {"partkey": 9, "pname": "gear2"},
         {"partkey": 9, "pname": "gear"}),
    ]), epoch_id=1)
    assert eng.last_stats["nx_view"].get("doc_tree") == 1
    touched = {k for (_, op, k) in sink.action_log[log_before:]}
    assert touched == {"11"}
    _check(spark, sink)

    # part 7 is referenced by lines of orders 1,2 (both customer 10)
    parts2 = [(7, "bolt3"), (8, "nut"), (9, "gear2")]
    _tables(spark, list(CUSTS), list(ORDERS), list(LINES), parts2)
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (11, "nx_part", "UPDATE", {"partkey": 7, "pname": "bolt3"},
         {"partkey": 7, "pname": "bolt"}),
    ]), epoch_id=2)
    touched = {k for (_, op, k) in sink.action_log[log_before:]}
    assert touched == {"10"}
    _check(spark, sink)


def test_grandchild_repoint_reserves_both_roots(spark, engine):
    eng, sink = engine
    # line (4,1) moves from order 4 (cust 12) to order 3 (cust 11):
    # BOTH customer docs must re-serve (old image's container too)
    lines = [(3, 9, 4.0, 8) if x == (4, 1, 4.0, 8) else x for x in LINES]
    _tables(spark, list(CUSTS), list(ORDERS), lines, list(PARTS))
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (20, "nx_lines", "UPDATE", {"lord": 3, "line": 9, "qty": 4.0, "pkey": 8},
         {"lord": 4, "line": 1, "qty": 4.0, "pkey": 8}),
    ]), epoch_id=1)
    assert eng.last_stats["nx_view"].get("doc_tree") == 1
    touched = {k for (_, op, k) in sink.action_log[log_before:]}
    assert touched == {"11", "12"}
    _check(spark, sink)


def test_child_repoint_carries_nested_array(spark, engine):
    eng, sink = engine
    # order 2 (with its lines) moves from customer 10 to customer 12
    orders = [(2, 12, "F") if x[0] == 2 else x for x in ORDERS]
    _tables(spark, list(CUSTS), orders, list(LINES), list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (30, "nx_orders", "UPDATE", {"okey": 2, "cust": 12, "ostat": "F"},
         {"okey": 2, "cust": 10, "ostat": "F"}),
    ]), epoch_id=1)
    assert eng.last_stats["nx_view"].get("doc_tree") == 1
    doc12 = sink.indices["nx_view"]["12"]
    assert [o["okey"] for o in doc12["ords"]] == [2, 4]
    assert [i["qty"] for o in doc12["ords"] for i in o["items"]] == [1.0, 4.0]
    _check(spark, sink)


def test_replay_suppressed_and_retraction(spark, engine):
    eng, sink = engine
    lines = LINES + [(3, 2, 6.0, 7)]
    _tables(spark, list(CUSTS), list(ORDERS), lines, list(PARTS))
    batch = _cdc(spark, [
        (40, "nx_lines", "INSERT", {"lord": 3, "line": 2, "qty": 6.0, "pkey": 7}, None),
    ])
    eng.process_cdc_batch(batch, epoch_id=1)
    _check(spark, sink)
    eng.process_cdc_batch(batch, epoch_id=1)  # verbatim redelivery
    _check(spark, sink)

    # root delete retracts the doc (grandchildren orphaned silently)
    custs = [x for x in CUSTS if x[0] != 11]
    _tables(spark, custs, list(ORDERS), lines, list(PARTS))
    eng.process_cdc_batch(_cdc(spark, [
        (41, "nx_cust", "DELETE", None, {"ckey": 11, "cname": "bob"}),
    ]), epoch_id=2)
    assert "11" not in sink.indices["nx_view"]
    _check(spark, sink)


def test_depth3_algebra_fold(spark):
    """Three to-many levels (region→custs[]→orders[]→items[]): the
    deepest relation's delta ascends TWO rk hops to the root; state
    names are path-suffixed per level."""
    from pyspark.sql import functions as F

    from sinker_spark.ivm_delta import (
        apply_join_state, changes_to_mult, relation_state,
    )
    from sinker_spark.ivm_flagship import (
        doc_tree_states, relation_rows_for, serve_docs, touched_parent_keys,
    )

    spec = DocTreeViewSpec(
        parent_table="d3_region", key="rkey", row_schema_parent="rkey bigint, rname string",
        children=[ChildArraySpec(
            table="d3_cust", fk="creg", row_schema="ckey bigint, creg bigint",
            alias="custs", order=["ckey"], key="ckey",
            children=[ChildArraySpec(
                table="d3_ord", fk="ocust", row_schema="okey bigint, ocust bigint",
                alias="ords", order=["okey"], key="okey",
                children=[ChildArraySpec(
                    table="d3_item", fk="iord", row_schema="inum int, iord bigint, iqty bigint",
                    alias="items", order=["inum"],
                )],
            )],
        )],
    )
    assert [s.suffix for s in doc_tree_states(spec)] == [
        "p", "c0", "rkc0", "c0x0", "rkc0x0", "c0x0x0",
    ]

    regions = spark.createDataFrame([(1, "eu"), (2, "us")], "rkey bigint, rname string")
    custs = spark.createDataFrame([(10, 1), (11, 1), (12, 2)], "ckey bigint, creg bigint")
    ords = spark.createDataFrame([(100, 10), (101, 11), (102, 12)], "okey bigint, ocust bigint")
    items = spark.createDataFrame(
        [(1, 100, 5), (2, 100, 3), (1, 102, 2)], "inum int, iord bigint, iqty bigint"
    )
    # delta: ONE new item under order 101 (cust 11, region 1) — the walk
    # must ascend item→order(rk c0x0)→cust(rk c0)→region and touch 1 only
    i_ch = spark.createDataFrame([(9, 101, 7)], "inum int, iord bigint, iqty bigint") \
        .withColumn("__op", F.lit("insert"))
    posts = {
        "p": relation_state(regions),
        "c0": relation_state(custs),
        "c0x0": relation_state(ords),
        "c0x0x0": apply_join_state(
            relation_state(items), changes_to_mult(i_ch)
        ),
    }
    rows_for = relation_rows_for(posts)
    touched = touched_parent_keys(spec, {"c0x0x0": i_ch.select("iord")}, rows_for)
    assert [r["rkey"] for r in touched.collect()] == [1]
    docs = serve_docs(spec, touched, rows_for)
    rows = docs.collect()
    assert len(rows) == 1
    doc = rows[0]
    assert doc["rkey"] == 1 and [c["ckey"] for c in doc["custs"]] == [10, 11]
    c11 = doc["custs"][1]
    assert [o["okey"] for o in c11["ords"]] == [101]
    assert [i["iqty"] for i in c11["ords"][0]["items"]] == [7]
    # deepest arrays three levels down for cust 10 intact
    c10 = doc["custs"][0]
    assert [i["iqty"] for o in c10["ords"] for i in o["items"]] == [5, 3]
