"""To-many arrays ANCHORED AT DIM NODES (DimLookup.arrays): a supplier
doc whose nation object carries the nation's customers[] array — the
remaining to-many placement in the doc-tree shape lattice (arrays hang
off the parent, off array elements, and now off to-one dims).

The fold reuses the dim's existing machinery: the array's delta values
are dim keys, which ascend to parent docs through the dim's ``rp``
reverse-index walk; its element dims get the usual per-hop indexes; a
nested sub-array under a dim-anchored array ascends its ``rk`` chain
first, then the rp walk (covered by the algebra test below).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec, ViewDef

S_SCHEMA = "skey bigint, sname string, snat bigint"
N_SCHEMA = "nkey bigint, nname string"
C_SCHEMA = "ckey bigint, cnat bigint, cgrp bigint"
G_SCHEMA = "gkey bigint, gname string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _tables(spark, supps, nations, custs, grps):
    spark.createDataFrame(supps or [], S_SCHEMA).createOrReplaceTempView("da_supp")
    spark.createDataFrame(nations or [], N_SCHEMA).createOrReplaceTempView("da_nation")
    spark.createDataFrame(custs or [], C_SCHEMA).createOrReplaceTempView("da_cust")
    spark.createDataFrame(grps or [], G_SCHEMA).createOrReplaceTempView("da_grp")


def _spec() -> DocTreeViewSpec:
    return DocTreeViewSpec(
        parent_table="da_supp", key="skey", row_schema_parent=S_SCHEMA,
        dims=[DimLookup(
            "da_nation", fk="snat", key="nkey", row_schema=N_SCHEMA,
            arrays=[ChildArraySpec(
                table="da_cust", fk="cnat", row_schema=C_SCHEMA,
                alias="ncusts", order=["ckey"],
                dims=[DimLookup("da_grp", fk="cgrp", key="gkey",
                                row_schema=G_SCHEMA)],
            )],
        )],
    )


def _view():
    def recompute(spark):
        s = spark.table("da_supp")
        n = spark.table("da_nation")
        c = spark.table("da_cust")
        g = spark.table("da_grp")
        elem = c.join(g, c["cgrp"] == g["gkey"], "left").drop("gkey")
        pair = F.struct(
            F.col("ckey").alias("__o0"),
            F.struct("ckey", "cgrp", "gname").alias("__c"),
        )
        arrays = elem.groupBy("cnat").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("ncusts")
        )
        cur = (
            s.join(n, s["snat"] == n["nkey"], "inner").drop("nkey")
            .join(arrays, F.col("snat") == F.col("cnat"), "left").drop("cnat")
        )
        at = cur.schema["ncusts"].dataType
        cur = cur.withColumn("ncusts", F.coalesce(F.col("ncusts"), F.array().cast(at)))
        return cur.select(
            F.col("skey").cast("string").alias("k"),
            F.struct("skey", "sname", "snat", "nname", "ncusts").alias("doc"),
        )

    return ViewDef(
        name="da_view", fn=recompute, key="k",
        deps={"da_supp", "da_nation", "da_cust", "da_grp"},
        doctree=_spec(),
    )


def _cdc(spark, records):
    rows = [
        (lsn, "public", table, op, "?",
         json.dumps(after) if after else None,
         json.dumps(before) if before else None)
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


SUPPS = [(1, "acme", 100), (2, "bolt", 100), (3, "carb", 200), (4, "dyn", 300)]
NATIONS = [(100, "de"), (200, "jp"), (300, "us")]
CUSTS = [(10, 100, 7), (11, 100, 8), (12, 200, 7)]
GRPS = [(7, "gold"), (8, "iron")]


def _truth(spark):
    from sinker_spark.sinks.memory import _row_to_plain

    return {r["k"]: _row_to_plain(r["doc"]) for r in _view().fn(spark).collect()}


def _check(spark, sink):
    assert sink.indices.get("da_view", {}) == _truth(spark)


@pytest.fixture()
def engine(spark, tmp_path):
    _tables(spark, list(SUPPS), list(NATIONS), list(CUSTS), list(GRPS))
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    _check(spark, sink)
    return eng, sink


def test_state_naming():
    from sinker_spark.ivm_flagship import doc_tree_states

    assert [s.suffix for s in doc_tree_states(_spec())] == [
        "p", "d0", "rp0", "d0a0", "d0a0d0", "rd0a00",
    ]


def test_array_churn_touches_only_that_nations_suppliers(spark, engine):
    eng, sink = engine
    # customer 12 (nation 200) re-grouped: ONLY supplier 3 re-serves
    custs = [(10, 100, 7), (11, 100, 8), (12, 200, 8)]
    _tables(spark, list(SUPPS), list(NATIONS), custs, list(GRPS))
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "da_cust", "UPDATE", {"ckey": 12, "cnat": 200, "cgrp": 8},
         {"ckey": 12, "cnat": 200, "cgrp": 7}),
    ]), epoch_id=1)
    assert eng.last_stats["da_view"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"3"}
    _check(spark, sink)

    # customer 10 moves nation 100 → 300: suppliers of BOTH nations
    # re-serve (1, 2 lose the element; 4 gains it)
    custs2 = [(10, 300, 7), (11, 100, 8), (12, 200, 8)]
    _tables(spark, list(SUPPS), list(NATIONS), custs2, list(GRPS))
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "da_cust", "UPDATE", {"ckey": 10, "cnat": 300, "cgrp": 7},
         {"ckey": 10, "cnat": 100, "cgrp": 7}),
    ]), epoch_id=2)
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"1", "2", "4"}
    assert [c["ckey"] for c in sink.indices["da_view"]["4"]["ncusts"]] == [10]
    _check(spark, sink)


def test_element_dim_fanout_through_anchor(spark, engine):
    eng, sink = engine
    # grp 8 rename: only customer 11 (nation 100) carries it → suppliers
    # 1, 2 re-serve; supplier 3 (jp) and 4 (us) must not
    grps = [(7, "gold"), (8, "iron2")]
    _tables(spark, list(SUPPS), list(NATIONS), list(CUSTS), grps)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (10, "da_grp", "UPDATE", {"gkey": 8, "gname": "iron2"},
         {"gkey": 8, "gname": "iron"}),
    ]), epoch_id=1)
    assert eng.last_stats["da_view"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"1", "2"}
    _check(spark, sink)


def test_dim_rename_and_chain_retraction(spark, engine):
    eng, sink = engine
    nations = [(100, "de!"), (200, "jp"), (300, "us")]
    _tables(spark, list(SUPPS), nations, list(CUSTS), list(GRPS))
    eng.process_cdc_batch(_cdc(spark, [
        (20, "da_nation", "UPDATE", {"nkey": 100, "nname": "de!"},
         {"nkey": 100, "nname": "de"}),
    ]), epoch_id=1)
    _check(spark, sink)

    # nation delete breaks the chain: suppliers 3 retract (INNER dim)
    nations2 = [(100, "de!"), (300, "us")]
    _tables(spark, list(SUPPS), nations2, list(CUSTS), list(GRPS))
    eng.process_cdc_batch(_cdc(spark, [
        (21, "da_nation", "DELETE", None, {"nkey": 200, "nname": "jp"}),
    ]), epoch_id=2)
    assert "3" not in sink.indices["da_view"]
    _check(spark, sink)


def test_replay_and_parent_churn(spark, engine):
    eng, sink = engine
    supps = SUPPS + [(5, "ems", 200)]
    _tables(spark, supps, list(NATIONS), list(CUSTS), list(GRPS))
    batch = _cdc(spark, [
        (30, "da_supp", "INSERT", {"skey": 5, "sname": "ems", "snat": 200}, None),
    ])
    eng.process_cdc_batch(batch, epoch_id=1)
    assert [c["ckey"] for c in sink.indices["da_view"]["5"]["ncusts"]] == [12]
    _check(spark, sink)
    eng.process_cdc_batch(batch, epoch_id=1)  # verbatim redelivery
    _check(spark, sink)


def test_nested_under_dim_anchor_algebra(spark):
    """A sub-array NESTED under a dim-anchored array: its delta ascends
    the rk chain to the dim-anchored array's fk values (dim keys), then
    the dim's rp walk to the parents."""
    from sinker_spark.ivm_delta import (
        apply_join_state, changes_to_mult, relation_state,
    )
    from sinker_spark.ivm_flagship import (
        doc_tree_states, relation_rows_for, serve_docs, touched_parent_keys,
    )

    spec = DocTreeViewSpec(
        parent_table="x_supp", key="skey", row_schema_parent="skey bigint, snat bigint",
        dims=[DimLookup(
            "x_nation", fk="snat", key="nkey", row_schema="nkey bigint, nname string",
            arrays=[ChildArraySpec(
                table="x_cust", fk="cnat", row_schema="ckey bigint, cnat bigint",
                alias="custs", order=["ckey"], key="ckey",
                children=[ChildArraySpec(
                    table="x_ord", fk="ocust", row_schema="okey bigint, ocust bigint",
                    alias="ords", order=["okey"],
                )],
            )],
        )],
    )
    assert [s.suffix for s in doc_tree_states(spec)] == [
        "p", "d0", "rp0", "d0a0", "rkd0a0", "d0a0x0",
    ]
    supp = spark.createDataFrame([(1, 100), (2, 200)], "skey bigint, snat bigint")
    nation = spark.createDataFrame([(100, "de"), (200, "jp")], "nkey bigint, nname string")
    cust = spark.createDataFrame([(10, 100), (12, 200)], "ckey bigint, cnat bigint")
    ords = spark.createDataFrame([(7, 10), (8, 12)], "okey bigint, ocust bigint")
    o_ch = spark.createDataFrame([(9, 12)], "okey bigint, ocust bigint").withColumn(
        "__op", F.lit("insert")
    )
    posts = {
        "p": relation_state(supp),
        "d0": relation_state(nation),
        "d0a0": relation_state(cust),
        "d0a0x0": apply_join_state(relation_state(ords), changes_to_mult(o_ch)),
    }
    rows_for = relation_rows_for(posts)
    touched = touched_parent_keys(spec, {"d0a0x0": o_ch.select("ocust")}, rows_for)
    # order insert under cust 12 (nation 200) → supplier 2 only
    assert [r["skey"] for r in touched.collect()] == [2]
    docs = serve_docs(spec, touched, rows_for)
    d = docs.collect()[0]
    assert d["skey"] == 2 and d["nname"] == "jp"
    assert [o["okey"] for c in d["custs"] for o in c["ords"]] == [8, 9]


def test_identity_hop_walk_dedups_and_drops_nulls(spark):
    """A dim joined on the parent's OWN key (fk == spec.key) is an
    identity hop in walk_up: duplicate/null change keys must be
    deduped there like the indexed path does, so a high-churn dim
    batch doesn't multiply fan-out through the rest of the walk."""
    from sinker_spark.ivm_delta import relation_state
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    spec = DocTreeViewSpec(
        parent_table="ih_supp", key="skey",
        row_schema_parent="skey bigint, sname string",
        dims=[DimLookup(
            "ih_ext", fk="skey", key="ekey",
            row_schema="ekey bigint, enote string",
        )],
    )
    supp = spark.createDataFrame([(1, "a"), (2, "b")], "skey bigint, sname string")
    rows_for = relation_rows_for({"p": relation_state(supp)})
    dim_change = spark.createDataFrame(
        [(2,), (2,), (2,), (None,)], "ekey bigint"
    )
    touched = touched_parent_keys(spec, {"d0": dim_change}, rows_for)
    assert [r["skey"] for r in touched.collect()] == [2]
