"""Reference-faithful end-to-end: the scenarios of test_e2e.py:60-171
replayed through the Spark engine — backfill golden docs, update
propagation person→student→enrollment→course, delete with FK-cascade —
using ViewDef compile → SnapshotStore refresh (snapshot-diff IVM) →
InMemorySink, driven by CDC batches through SyncEngine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx


def _cdc_batch(spark, records):
    """records: list of (lsn, table, op, id)."""
    return spark.createDataFrame(
        [(lsn, "public", t, op, i, None) for lsn, t, op, i in records],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )


@pytest.fixture()
def engine(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    views = [
        ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
        ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses"),
    ]
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snapshots"))
    eng = SyncEngine(spark, views, sink, store)
    return eng, sink, spark, tmp_path


def test_view_lineage_extraction(engine):
    eng, *_ = engine
    assert eng.views["person_mv"].deps == {"person"}
    assert eng.views["person_mv"].parent_table == "person"
    assert eng.views["course_mv"].deps == {"course", "teacher", "person", "enrollment", "student"}
    assert eng.views["course_mv"].parent_table == "course"


def test_backfill_golden_docs(engine):
    eng, sink, *_ = engine
    eng.backfill()
    assert sink.get("people", "p-1") == {"name": "John"}
    assert sink.ids("people") == {"p-1", "p-2", "p-3", "p-4"}
    assert sink.get("courses", "c-1") == fx.GOLDEN_C1
    assert sink.ids("courses") == {"c-1", "c-2", "c-3"}


def test_update_propagates_through_nesting(engine):
    """test_e2e.py:99-139: renaming person p-1 must update people/p-1 AND
    courses/c-1 through person→student→enrollment→course."""
    eng, sink, spark, tmp_path = engine
    eng.backfill()

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-1", "Jane") if r[0] == "p-1" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)

    eng.process_cdc_batch(_cdc_batch(spark, [(1, "person", "UPDATE", "p-1")]))

    assert sink.get("people", "p-1") == {"name": "Jane"}
    c1 = sink.get("courses", "c-1")
    names = [e["student"]["person"]["name"] for e in c1["enrollments"]]
    assert names == ["Loren", "Jane"]
    post = [a for a in sink.action_log[7:]]
    assert ("people", "upsert", "p-1") in post
    assert ("courses", "upsert", "c-1") in post


def test_diff_suppresses_unchanged_docs(engine):
    """Snapshot-diff parity with REFRESH CONCURRENTLY: renaming p-4 (the
    teacher of c-3 only) must re-push only people/p-4 and courses/c-3 —
    c-1 and c-2 recompute to identical docs and diff out."""
    eng, sink, spark, tmp_path = engine
    eng.backfill()
    n0 = len(sink.action_log)

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-4", "Prof Matthew") if r[0] == "p-4" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)

    eng.process_cdc_batch(_cdc_batch(spark, [(1, "person", "UPDATE", "p-4")]))
    post = sink.action_log[n0:]
    assert sorted(post) == [("courses", "upsert", "c-3"), ("people", "upsert", "p-4")]


def test_delete_cascades_and_deletes_doc(engine):
    """test_e2e.py:141-171: deleting person p-1 removes people/p-1 and
    shrinks courses/c-1 enrollments to Loren only (FK cascade observed
    through recompute)."""
    eng, sink, spark, tmp_path = engine
    eng.backfill()

    rows = fx.cascade_delete_person(fx.SEED, "p-1")
    fx.register(spark, str(tmp_path / "tables"), rows)

    eng.process_cdc_batch(
        _cdc_batch(
            spark,
            [
                (10, "person", "DELETE", "p-1"),
                # cascaded deletes as a CDC source would emit them
                (11, "student", "DELETE", "s-1"),
                (12, "enrollment", "DELETE", "e-1"),
                (13, "enrollment", "DELETE", "e-3"),
                (14, "enrollment", "DELETE", "e-5"),
            ],
        )
    )

    assert sink.get("people", "p-1") is None
    assert sink.ids("people") == {"p-2", "p-3", "p-4"}
    c1 = sink.get("courses", "c-1")
    assert [e["student"]["person"]["name"] for e in c1["enrollments"]] == ["Loren"]
    assert ("people", "delete", "p-1") in sink.action_log


def test_dirty_set_skips_untouched_views(engine):
    """A5-A7 parity: a change on a table no view depends on refreshes
    nothing; a change on enrollment dirties only course_mv."""
    eng, sink, spark, _ = engine
    eng.backfill()
    n_actions = len(sink.action_log)

    eng.process_cdc_batch(_cdc_batch(spark, [(20, "unrelated_table", "INSERT", "x-1")]))
    assert len(sink.action_log) == n_actions

    assert [v.name for v in eng.dirty_views({"enrollment"})] == ["course_mv"]
    assert {v.name for v in eng.dirty_views({"person"})} == {"person_mv", "course_mv"}
