"""Parallel per-view refresh (reference thread-pool parity, runner.py:
44-50/91-99), per-batch metrics, and snapshot retention vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx


def _engine(spark, tmp_path, **kw):
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    eng = SyncEngine(
        spark,
        [
            ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
            ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses"),
        ],
        sink,
        SnapshotStore(spark, str(tmp_path / "snap")),
        **kw,
    )
    return eng, sink


def test_parallel_backfill_matches_serial(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path, max_parallel_views=4)
    eng.backfill()
    assert sink.ids("people") == {"p-1", "p-2", "p-3", "p-4"}
    assert sink.get("courses", "c-1") == fx.GOLDEN_C1
    assert eng.last_stats["person_mv"] == {"upserts": 4, "deletes": 0}
    assert eng.last_stats["course_mv"] == {"upserts": 3, "deletes": 0}


def test_parallel_exception_propagates(spark, tmp_path):
    """Reference parity (test_e2e.py:49-57): a failure inside the worker
    pool must re-raise, not be swallowed."""
    fx.register(spark, str(tmp_path / "t"))
    eng = SyncEngine(
        spark,
        [
            ViewDef("ok_mv", sql=fx.PERSON_MV_SQL, index="people"),
            ViewDef("broken_mv", sql="select id, json_build_object('x', x) as d from missing_tbl"),
        ],
        InMemorySink(),
        SnapshotStore(spark, str(tmp_path / "s")),
        max_parallel_views=4,
    )
    with pytest.raises(AnalysisException):
        eng.backfill()


def test_batch_metrics_and_vacuum(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    eng.backfill()

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-4", "Prof M") if r[0] == "p-4" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    batch = spark.createDataFrame(
        [(1, "public", "person", "UPDATE", "p-4", None)],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )
    eng.process_cdc_batch(batch)
    # diff suppression shows in the metrics: one person doc + one course doc
    # (BOTH views auto-derive targeted refresh — person_mv via the
    # single-table id convention, course_mv via the correlation-tree
    # walk, compiler/correlate.py)
    assert eng.last_stats["person_mv"] == {"upserts": 1, "deletes": 0, "targeted": 1}
    assert eng.last_stats["course_mv"] == {"upserts": 1, "deletes": 0, "targeted": 1}

    store = eng.store
    assert store.current_version("person_mv") == 2
    removed = store.vacuum("person_mv", keep_last=1)
    assert removed == [1]
    # current snapshot still readable after vacuum
    assert store.read("person_mv").count() == 4
    # idempotent
    assert store.vacuum("person_mv", keep_last=1) == []


def test_shared_scan_one_read_for_sibling_views(spark, tmp_path):
    """Two views over the SAME base table in one epoch must not scan it
    twice: _cache_shared_deps caches `person` before the fan-out, so
    both recompute plans read InMemoryRelation (the parquet scan runs
    once, materializing the cache), and the cache is dropped after."""
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    views = [
        ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
        ViewDef(
            "person_upper_mv",
            sql='select id, json_build_object(\'loud\', upper("name")) as d from "person"',
            index="people_upper",
        ),
    ]
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng = SyncEngine(spark, views, sink, store, max_parallel_views=2)

    plans = {}
    orig = SnapshotStore.refresh

    def spy(self, view, new_df, key="id"):
        plans[view] = new_df._jdf.queryExecution().executedPlan().toString()
        return orig(self, view, new_df, key=key)

    SnapshotStore.refresh = spy
    try:
        eng.backfill()
    finally:
        SnapshotStore.refresh = orig

    assert sink.ids("people") == {"p-1", "p-2", "p-3", "p-4"}
    assert sink.get("people_upper", "p-2")["loud"] == "LOREN"
    for name, plan in plans.items():
        assert "InMemory" in plan, f"{name} did not read the shared cached scan:\n{plan}"
    assert not spark.catalog.isCached("person")  # dropped after the epoch


def test_shared_scan_skips_tables_over_budget(spark, tmp_path):
    """Above shared_scan_max_bytes the views re-scan instead of caching
    (materializing a fact-table cache is the 100 TB anti-pattern)."""
    fx.register(spark, str(tmp_path / "tables"))
    eng = SyncEngine(
        spark,
        [
            ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
            ViewDef(
                "person_upper_mv",
                sql='select id, json_build_object(\'loud\', upper("name")) as d from "person"',
                index="people_upper",
            ),
        ],
        InMemorySink(),
        SnapshotStore(spark, str(tmp_path / "snap")),
    )
    eng.shared_scan_max_bytes = 0
    cached = eng._cache_shared_deps(list(eng.views.values()))
    assert cached == []
    assert not spark.catalog.isCached("person")
