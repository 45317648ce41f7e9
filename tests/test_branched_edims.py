"""BRANCHED element dim trees in the FLAT DocTreeViewSpec lane
(views.edim_nodes): a child array whose elements carry TWO independent
to-one lookups — a part object (itself nesting a brand lookup) AND a
supplier object — maintained by the ENGINE as a pure delta fold.

Exercised: per-branch states + reverse indexes (DFS preorder numbering;
a linear chain keeps the historical {sfx}d0..dN names bit-for-bit —
pinned in test_doc_sql/test_nested_doctree — so this file pins the TREE
shape), per-branch dim-walk fan-out (a supplier rename must not touch
docs only referencing it through parts and vice versa), nested-branch
walk (brand → part → item → doc), and replay suppression across the
branched states."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.ivm_flagship import doc_tree_states
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink, _row_to_plain
from sinker_spark.views import (
    ChildArraySpec,
    DimLookup,
    DocTreeViewSpec,
    ViewDef,
    edim_nodes,
)

O_SCHEMA = "okey bigint, ostat string"
I_SCHEMA = "iord bigint, line bigint, pk bigint, sk bigint"
P_SCHEMA = "pkey bigint, pname string, bk bigint"
B_SCHEMA = "bkey bigint, bname string"
S_SCHEMA = "skey bigint, sname string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _tables(spark, ords, items, parts, brands, supps):
    spark.createDataFrame(ords or [], O_SCHEMA).createOrReplaceTempView("bx_ord")
    spark.createDataFrame(items or [], I_SCHEMA).createOrReplaceTempView("bx_it")
    spark.createDataFrame(parts or [], P_SCHEMA).createOrReplaceTempView("bx_part")
    spark.createDataFrame(brands or [], B_SCHEMA).createOrReplaceTempView("bx_brand")
    spark.createDataFrame(supps or [], S_SCHEMA).createOrReplaceTempView("bx_supp")


def _spec() -> DocTreeViewSpec:
    return DocTreeViewSpec(
        parent_table="bx_ord", key="okey", row_schema_parent=O_SCHEMA,
        children=[
            ChildArraySpec(
                table="bx_it", fk="iord", row_schema=I_SCHEMA,
                alias="items", order=["line", "pk", "sk"],
                dims=[
                    DimLookup("bx_part", fk="pk", key="pkey", row_schema=P_SCHEMA,
                              children=[DimLookup("bx_brand", fk="bk", key="bkey",
                                                  row_schema=B_SCHEMA)]),
                    DimLookup("bx_supp", fk="sk", key="skey", row_schema=S_SCHEMA),
                ],
            )
        ],
    )


def _view():
    def recompute(spark):
        o = spark.table("bx_ord")
        it = spark.table("bx_it")
        p = spark.table("bx_part")
        b = spark.table("bx_brand")
        s = spark.table("bx_supp")
        elem = (
            it.join(p, it["pk"] == p["pkey"], "left").drop("pkey")
            .join(b, F.col("bk") == b["bkey"], "left").drop("bkey")
            .join(s, it["sk"] == s["skey"], "left").drop("skey")
        )
        pair = F.struct(
            F.col("line").alias("__o0"), F.col("pk").alias("__o1"),
            F.col("sk").alias("__o2"),
            F.struct("line", "pk", "sk", "pname", "bk", "bname", "sname").alias("__c"),
        )
        items = elem.groupBy("iord").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("items")
        )
        cur = o.join(items, F.col("okey") == F.col("iord"), "left").drop("iord")
        t = cur.schema["items"].dataType
        cur = cur.withColumn("items", F.coalesce(F.col("items"), F.array().cast(t)))
        return cur.select(
            F.col("okey").cast("string").alias("k"),
            F.struct("okey", "ostat", "items").alias("doc"),
        )

    return ViewDef(
        name="bx_view", fn=recompute, key="k",
        deps={"bx_ord", "bx_it", "bx_part", "bx_brand", "bx_supp"},
        doctree=_spec(),
    )


def _cdc(spark, records):
    rows = [
        (lsn, "public", table, op, "x",
         json.dumps(after) if after else None,
         json.dumps(before) if before else None)
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


ORDS = [(1, "O"), (2, "F"), (3, "P")]
# order 1 references part 7 (brand 70) + supp 100; order 2 references
# part 8 via items only (supp 101); order 3 item-less
ITEMS = [(1, 1, 7, 100), (1, 2, 8, 101), (2, 1, 8, 101)]
PARTS = [(7, "bolt", 70), (8, "nut", 71)]
BRANDS = [(70, "acme"), (71, "apex")]
SUPPS = [(100, "s-a"), (101, "s-b")]


def _truth(spark):
    return {r["k"]: _row_to_plain(r["doc"]) for r in _view().fn(spark).collect()}


def _check(spark, sink):
    assert sink.indices.get("bx_view", {}) == _truth(spark)


def test_states_and_numbering():
    spec = _spec()
    nodes = edim_nodes(spec.children[0])
    assert [(nd.idx, nd.dim.table, nd.parent) for nd in nodes] == [
        (0, "bx_part", None), (1, "bx_brand", 0), (2, "bx_supp", None)
    ]
    sfx = {s.suffix: (s.table, s.cols, s.source) for s in doc_tree_states(spec)}
    assert sfx["c0d0"][0] == "bx_part"
    assert sfx["c0d1"][0] == "bx_brand"
    assert sfx["c0d2"][0] == "bx_supp"
    # per-branch reverse indexes: brand ascends THROUGH part's state
    assert sfx["rc00"] == ("bx_it", ("pk", "iord"), "c0")
    assert sfx["rc01"] == ("bx_part", ("bk", "pkey"), "c0d0")
    assert sfx["rc02"] == ("bx_it", ("sk", "iord"), "c0")


@pytest.fixture()
def engine(spark, tmp_path):
    _tables(spark, list(ORDS), list(ITEMS), list(PARTS), list(BRANDS), list(SUPPS))
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    _check(spark, sink)
    return eng, sink


def test_branch_fanout_exact_and_parity(spark, engine):
    eng, sink = engine

    # supplier 100 rename: referenced ONLY by order 1 — exact fan-out
    _tables(spark, list(ORDS), list(ITEMS), list(PARTS), list(BRANDS),
            [(100, "s-a2"), (101, "s-b")])
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "bx_supp", "UPDATE", {"skey": 100, "sname": "s-a2"},
         {"skey": 100, "sname": "s-a"}),
    ]), epoch_id=1)
    assert eng.last_stats["bx_view"].get("doc_tree") == 1
    assert {k for (_, _op, k) in sink.action_log[n0:]} == {"1"}
    _check(spark, sink)

    # brand 71 rename: brand→part(8)→items in orders 1 AND 2 — the
    # nested branch walks rc01 then rc00, never touching order 3
    _tables(spark, list(ORDS), list(ITEMS), list(PARTS),
            [(70, "acme"), (71, "apex2")], [(100, "s-a2"), (101, "s-b")])
    n1 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "bx_brand", "UPDATE", {"bkey": 71, "bname": "apex2"},
         {"bkey": 71, "bname": "apex"}),
    ]), epoch_id=2)
    assert eng.last_stats["bx_view"].get("doc_tree") == 1
    assert {k for (_, _op, k) in sink.action_log[n1:]} == {"1", "2"}
    _check(spark, sink)

    # item re-points its SUPPLIER branch only: both images fold, one doc
    items2 = [(1, 1, 7, 101), (1, 2, 8, 101), (2, 1, 8, 101)]
    _tables(spark, list(ORDS), items2, list(PARTS),
            [(70, "acme"), (71, "apex2")], [(100, "s-a2"), (101, "s-b")])
    eng.process_cdc_batch(_cdc(spark, [
        (3, "bx_it", "UPDATE", {"iord": 1, "line": 1, "pk": 7, "sk": 101},
         {"iord": 1, "line": 1, "pk": 7, "sk": 100}),
    ]), epoch_id=3)
    assert eng.last_stats["bx_view"].get("doc_tree") == 1
    _check(spark, sink)

    # replay: redelivered batch must be a no-op across branched states
    eng.process_cdc_batch(_cdc(spark, [
        (3, "bx_it", "UPDATE", {"iord": 1, "line": 1, "pk": 7, "sk": 101},
         {"iord": 1, "line": 1, "pk": 7, "sk": 100}),
    ]), epoch_id=3)
    _check(spark, sink)
