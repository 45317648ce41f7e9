"""SyncEngine nested-document lane (NestedDocViewSpec): the reference's
flagship shape — parent row + sorted child array — maintained from
stored multiplicity states. Child inserts/deletes/updates rebuild ONLY
the touched parents' arrays; parent deletes retract the doc; childless
parents serve an empty array; the usual lane contracts hold
(before-images required, replay suppressed, fallback authoritative)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import NestedDocViewSpec, ViewDef

ORDERS_SCHEMA = "okey string, cust string"
LINES_SCHEMA = "okey string, line bigint, qty double"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _tables(spark, orders, lines):
    spark.createDataFrame(orders, ORDERS_SCHEMA).createOrReplaceTempView("nd_orders")
    spark.createDataFrame(lines, LINES_SCHEMA).createOrReplaceTempView("nd_lines")


def _view():
    def recompute(spark):
        c = spark.table("nd_lines")
        pair = F.struct(
            F.col("line").alias("__o0"),
            F.col("qty").alias("__o1"),
            F.struct("line", "qty").alias("__c"),
        )
        arrays = c.groupBy("okey").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("lines")
        )
        out = spark.table("nd_orders").join(arrays, "okey", "left")
        arr_type = out.schema["lines"].dataType
        out = out.withColumn("lines", F.coalesce(F.col("lines"), F.array().cast(arr_type)))
        return out.select(
            F.col("okey").alias("k"),
            F.struct("okey", "cust", "lines").alias("doc"),
        )

    return ViewDef(
        name="nd_view",
        fn=recompute,
        deps={"nd_orders", "nd_lines"},
        nesteddoc=NestedDocViewSpec(
            parent_table="nd_orders",
            child_table="nd_lines",
            on=["okey"],
            row_schema_parent=ORDERS_SCHEMA,
            row_schema_child=LINES_SCHEMA,
            child_alias="lines",
        ),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("okey", "?"),
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


BASE_ORDERS = [("o1", "alice"), ("o2", "bob")]
BASE_LINES = [("o1", 2, 5.0), ("o1", 1, 3.0), ("o2", 1, 7.0)]


def test_child_changes_rebuild_only_touched_arrays(spark, engine):
    eng, sink = engine
    _tables(spark, BASE_ORDERS, BASE_LINES)
    eng.backfill()
    assert sink.get("nd_view", "o1") == {
        "okey": "o1", "cust": "alice",
        "lines": [{"line": 1, "qty": 3.0}, {"line": 2, "qty": 5.0}],
    }
    # child insert lands sorted in the touched parent's array only
    _tables(spark, BASE_ORDERS, BASE_LINES + [("o2", 2, 1.5)])
    log_before = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nd_lines", "INSERT", {"okey": "o2", "line": 2, "qty": 1.5}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o2")["lines"] == [
        {"line": 1, "qty": 7.0}, {"line": 2, "qty": 1.5},
    ]
    touched = {k for (_, op, k) in sink.action_log[log_before:]}
    assert touched == {"o2"}  # o1 untouched — no rescan, no re-upsert
    # child update = delete(old)+insert(new) in one row pair
    _tables(spark, BASE_ORDERS, [("o1", 2, 5.0), ("o1", 1, 9.0), ("o2", 1, 7.0), ("o2", 2, 1.5)])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "nd_lines", "UPDATE", {"okey": "o1", "line": 1, "qty": 9.0},
         {"okey": "o1", "line": 1, "qty": 3.0}),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o1")["lines"] == [
        {"line": 1, "qty": 9.0}, {"line": 2, "qty": 5.0},
    ]
    # deleting every child leaves an EMPTY array, not a deleted doc
    _tables(spark, BASE_ORDERS, [("o1", 2, 5.0), ("o1", 1, 9.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (3, "nd_lines", "DELETE", None, {"okey": "o2", "line": 1, "qty": 7.0}),
        (4, "nd_lines", "DELETE", None, {"okey": "o2", "line": 2, "qty": 1.5}),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o2") == {"okey": "o2", "cust": "bob", "lines": []}


def test_parent_lifecycle(spark, engine):
    eng, sink = engine
    _tables(spark, BASE_ORDERS, BASE_LINES)
    eng.backfill()
    # parent insert with pre-existing orphan children picks them up
    _tables(spark, BASE_ORDERS + [("o3", "carol")], BASE_LINES + [("o3", 1, 2.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nd_lines", "INSERT", {"okey": "o3", "line": 1, "qty": 2.0}, None),
        (2, "nd_orders", "INSERT", {"okey": "o3", "cust": "carol"}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o3") == {
        "okey": "o3", "cust": "carol", "lines": [{"line": 1, "qty": 2.0}],
    }
    # parent delete retracts the doc even while children remain
    _tables(spark, [("o2", "bob"), ("o3", "carol")], BASE_LINES + [("o3", 1, 2.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (3, "nd_orders", "DELETE", None, {"okey": "o1", "cust": "alice"}),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o1") is None
    assert ("nd_view", "delete", "o1") in sink.action_log
    # orphan-child-only change for a nonexistent parent emits a no-op
    # delete, never a doc
    _tables(spark, [("o2", "bob"), ("o3", "carol")],
            BASE_LINES + [("o3", 1, 2.0), ("o9", 1, 4.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (4, "nd_lines", "INSERT", {"okey": "o9", "line": 1, "qty": 4.0}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o9") is None


def test_replay_suppressed_and_fallback(spark, engine):
    eng, sink = engine
    _tables(spark, BASE_ORDERS, BASE_LINES)
    eng.backfill()
    batch = _cdc(spark, [
        (1, "nd_lines", "INSERT", {"okey": "o1", "line": 3, "qty": 1.0}, None),
    ])
    _tables(spark, BASE_ORDERS, BASE_LINES + [("o1", 3, 1.0)])
    eng.process_cdc_batch(batch)
    assert [x["line"] for x in sink.get("nd_view", "o1")["lines"]] == [1, 2, 3]
    eng.process_cdc_batch(batch)  # verbatim redelivery
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert [x["line"] for x in sink.get("nd_view", "o1")["lines"]] == [1, 2, 3]
    # missing before-image → authoritative fallback, then folds again
    _tables(spark, BASE_ORDERS, BASE_LINES + [("o1", 3, 1.0)])
    eng.process_cdc_batch(_cdc(spark, [(2, "nd_lines", "DELETE", None, None)]))
    stats = eng.last_stats["nd_view"]
    assert stats.get("lane_fallback") == 1 and "nested_doc" not in stats
    _tables(spark, BASE_ORDERS, BASE_LINES + [("o1", 3, 1.0), ("o2", 9, 9.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (3, "nd_lines", "INSERT", {"okey": "o2", "line": 9, "qty": 9.0}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert [x["line"] for x in sink.get("nd_view", "o2")["lines"]] == [1, 9]


def test_no_base_table_access_after_init(spark, engine):
    """The lane's claim is 'no base-table rescan': after backfill seeds
    the states, DROP the base views entirely — folding a batch must
    still work, because it touches only the stored states."""
    eng, sink = engine
    _tables(spark, BASE_ORDERS, BASE_LINES)
    eng.backfill()
    spark.catalog.dropTempView("nd_orders")
    spark.catalog.dropTempView("nd_lines")
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nd_lines", "INSERT", {"okey": "o1", "line": 5, "qty": 2.0}, None),
        (2, "nd_orders", "DELETE", None, {"okey": "o2", "cust": "bob"}),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert [x["line"] for x in sink.get("nd_view", "o1")["lines"]] == [1, 2, 5]
    assert sink.get("nd_view", "o2") is None


def test_fold_rewrites_only_touched_state_buckets(spark, tmp_path, monkeypatch):
    """The lane's state I/O claim: a fold touches only the batch keys'
    buckets of the key-local state store — untouched bucket files of
    BOTH states keep their mtimes.

    Pinned to the pruning-engaged regime: below _PRUNE_MIN_BYTES the
    store deliberately rewrites a tiny state's whole (tiny) grid —
    cheaper than the bucket-id job — so the O(touched-buckets) contract
    this test asserts is the at-scale behavior, forced here by zeroing
    the threshold before the engine builds its store."""
    import glob
    import os
    import time

    from sinker_spark.state_keyed import KeyedStateStore

    monkeypatch.setattr(KeyedStateStore, "_PRUNE_MIN_BYTES", 0)
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    many_orders = [(f"o{i}", f"c{i}") for i in range(60)]
    many_lines = [(f"o{i}", 1, float(i)) for i in range(60)]
    _tables(spark, many_orders, many_lines)
    eng.backfill()

    def mtimes(name):
        base = os.path.join(str(tmp_path / "snap"), "__keyed_lane_state", name)
        return {
            d: max(
                (os.path.getmtime(f) for f in glob.glob(os.path.join(base, d, "*.parquet"))),
                default=0,
            )
            for d in os.listdir(base)
            if d.startswith("__bucket=")
        }

    before_p, before_c = mtimes("nd_view__nd_p_state"), mtimes("nd_view__nd_c_state")
    assert len(before_p) > 1 and len(before_c) > 1
    keys = spark.createDataFrame([("o7",)], "okey string")
    bucket = keys.select(
        eng.keyed._bucket(["okey"], eng.keyed._nb("nd_view__nd_p_state")).alias("b")
    ).collect()[0]["b"]
    time.sleep(1.1)
    _tables(spark, many_orders, many_lines + [("o7", 2, 1.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nd_lines", "INSERT", {"okey": "o7", "line": 2, "qty": 1.0}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    after_p, after_c = mtimes("nd_view__nd_p_state"), mtimes("nd_view__nd_c_state")
    for before, after in ((before_p, after_p), (before_c, after_c)):
        for d in before:
            if d == f"__bucket={bucket}":
                assert after[d] > before[d]
            else:
                assert after[d] == before[d], f"untouched state bucket {d} rewritten"


def test_duplicate_child_rows_preserved(spark, engine):
    eng, sink = engine
    dup = [("o1", 1, 3.0), ("o1", 1, 3.0), ("o2", 1, 7.0)]
    _tables(spark, BASE_ORDERS, dup)
    eng.backfill()
    assert sink.get("nd_view", "o1")["lines"] == [
        {"line": 1, "qty": 3.0}, {"line": 1, "qty": 3.0},
    ]
    # deleting ONE duplicate keeps the other (multiplicity, not set)
    _tables(spark, BASE_ORDERS, [("o1", 1, 3.0), ("o2", 1, 7.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nd_lines", "DELETE", None, {"okey": "o1", "line": 1, "qty": 3.0}),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
    assert sink.get("nd_view", "o1")["lines"] == [{"line": 1, "qty": 3.0}]


def test_crash_mid_merge_reads_as_torn_and_fallback_heals(spark, engine, monkeypatch):
    """Tear detection ordering: the keyed store bumps its version BEFORE
    the destructive bucket rewrite, so a crash inside the rmtree→append
    window leaves the stored version AHEAD of the replay marker and the
    lane guard declines the next fold (torn) — the authoritative
    fallback then rebuilds. With the old bump-after-success order this
    exact crash produced torn state the guard could not see."""
    import shutil as _shutil

    eng, sink = engine
    _tables(spark, BASE_ORDERS, BASE_LINES)
    eng.backfill()
    eng.process_cdc_batch(_cdc(spark, [
        (1, "nd_lines", "INSERT", {"okey": "o2", "line": 2, "qty": 1.5}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1

    # crash the NEXT fold inside the destructive merge step
    real_rmtree = _shutil.rmtree
    calls = {"n": 0}

    def exploding_rmtree(path, *a, **kw):
        # the merge clears its TEMP dir (".__rebuild") before writing
        # and before the version bump — crashing there destroys nothing
        # and a redelivered fold is the CORRECT outcome; the window
        # under test is the post-bump swap of LIVE bucket dirs
        if "__bucket=" not in str(path) or ".__rebuild" in str(path):
            return real_rmtree(path, *a, **kw)
        calls["n"] += 1
        real_rmtree(path, *a, **kw)   # the LIVE bucket dir IS destroyed…
        raise RuntimeError("simulated crash mid-merge")  # …then we die

    _tables(spark, BASE_ORDERS, BASE_LINES + [("o2", 2, 1.5), ("o2", 3, 4.0)])
    monkeypatch.setattr("shutil.rmtree", exploding_rmtree)
    batch = _cdc(spark, [
        (2, "nd_lines", "INSERT", {"okey": "o2", "line": 3, "qty": 4.0}, None),
    ])
    with pytest.raises(Exception, match="simulated crash"):
        eng.process_cdc_batch(batch)
    assert calls["n"] >= 1
    monkeypatch.setattr("shutil.rmtree", real_rmtree)

    # restart: redeliver the same batch — the guard must see torn state,
    # decline the fold, and the fallback must rebuild to the right doc
    eng.process_cdc_batch(batch)
    stats = eng.last_stats["nd_view"]
    assert "nested_doc" not in stats and stats.get("lane_fallback") == 1
    assert sink.get("nd_view", "o2")["lines"] == [
        {"line": 1, "qty": 7.0}, {"line": 2, "qty": 1.5}, {"line": 3, "qty": 4.0},
    ]
    # and the lane folds again on the batch after that
    _tables(spark, BASE_ORDERS, BASE_LINES + [("o2", 2, 1.5), ("o2", 3, 4.0), ("o1", 3, 2.0)])
    eng.process_cdc_batch(_cdc(spark, [
        (3, "nd_lines", "INSERT", {"okey": "o1", "line": 3, "qty": 2.0}, None),
    ]))
    assert eng.last_stats["nd_view"].get("nested_doc") == 1
