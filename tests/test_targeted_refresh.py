"""Targeted incremental refresh: only affected documents recompute.

The reference's REFRESH CONCURRENTLY always re-runs the full view query;
the engine's targeted lane restricts the recompute to affected keys (the
IN-filter pushes to the parent scan) and merges the partial result into
the snapshot. These tests assert correctness (same end state as a full
refresh) and targeting (only scoped docs emitted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx


def _course_affected_keys(spark, changed_ids):
    """Reverse lineage for course_mv: map changed source-table id FRAMES
    to affected course ids via the same join graph the view uses — pure
    semi-joins, nothing collected to the driver (the hook contract that
    keeps targeted refresh alive on backfill-sized batches).

    Parent-table (course) ids ARE view keys — taken verbatim, never
    looked up (a deleted row can't be found in post-delete state). Child
    rows are resolved through the current tables; deleted child rows
    would need the CDC before-image (Debezium ``before``) in production —
    here the cascading parent id covers them."""
    known = {"course", "teacher", "person", "student", "enrollment"}
    if not set(changed_ids) <= known:
        return None  # unknown table → fall back to full refresh
    course = spark.table("course")
    teacher = spark.table("teacher")
    student = spark.table("student")
    enrollment = spark.table("enrollment")

    def semi(df, col, ids):
        return df.join(ids.select(F.col("id").alias(col)), col, "left_semi")

    parts = []
    if "course" in changed_ids:
        parts.append(changed_ids["course"].select("id"))
    if "teacher" in changed_ids:
        parts.append(semi(course, "teacher_id", changed_ids["teacher"]).select("id"))
    if "person" in changed_ids:
        pids = changed_ids["person"]
        t = semi(teacher, "person_id", pids).select(F.col("id").alias("teacher_id"))
        parts.append(course.join(t, "teacher_id", "left_semi").select("id"))
        s = semi(student, "person_id", pids).select(F.col("id").alias("student_id"))
        parts.append(enrollment.join(s, "student_id", "left_semi").select(F.col("course_id").alias("id")))
    if "student" in changed_ids:
        parts.append(
            semi(enrollment, "student_id", changed_ids["student"]).select(F.col("course_id").alias("id"))
        )
    if "enrollment" in changed_ids:
        parts.append(semi(enrollment, "id", changed_ids["enrollment"]).select(F.col("course_id").alias("id")))
    if not parts:
        return spark.createDataFrame([], "id string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _cdc(spark, records):
    return spark.createDataFrame(
        [(lsn, "public", t, op, i, None) for lsn, t, op, i in records],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )


def test_targeted_refresh_touches_only_affected_docs(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses",
                   affected_keys=_course_affected_keys)
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    n0 = len(sink.action_log)

    # rename the teacher of c-3 only (p-4 → teacher t-2 → course c-3)
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-4", "Prof Matthew") if r[0] == "p-4" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", "p-4")]))

    assert sink.action_log[n0:] == [("courses", "upsert", "c-3")]
    assert eng.last_stats["course_mv"]["targeted"] == 1
    assert sink.get("courses", "c-3")["teacher"]["person"]["name"] == "Prof Matthew"
    # untouched docs remain correct in both sink and snapshot
    assert sink.get("courses", "c-1") == fx.GOLDEN_C1
    snap = {r["id"] for r in eng.store.read("course_mv").collect()}
    assert snap == {"c-1", "c-2", "c-3"}


def test_targeted_delete_falls_out_of_scope_recompute(spark, tmp_path):
    """Deleting course c-2 via targeted refresh: the scoped recompute
    returns no row for c-2 → delete action; snapshot merge drops it."""
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses",
                   affected_keys=_course_affected_keys)
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["course"] = [r for r in rows["course"] if r[0] != "c-2"]
    rows["enrollment"] = [r for r in rows["enrollment"] if r[2] != "c-2"]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "course", "DELETE", "c-2"),
        (2, "enrollment", "DELETE", "e-3"),
        (3, "enrollment", "DELETE", "e-4"),
    ]))

    assert sink.get("courses", "c-2") is None
    assert sink.ids("courses") == {"c-1", "c-3"}
    assert {r["id"] for r in eng.store.read("course_mv").collect()} == {"c-1", "c-3"}
    assert eng.last_stats["course_mv"]["deletes"] == 1


def test_unknown_table_falls_back_to_full_refresh(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    calls = []

    def hook(spark_, changed):
        calls.append(set(changed))
        return _course_affected_keys(spark_, changed)

    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses", affected_keys=hook)
    # force the dep set to include a table the hook doesn't understand
    view.deps = view.deps | {"mystery"}
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()

    eng.process_cdc_batch(_cdc(spark, [(1, "mystery", "UPDATE", "zzz")]))
    # hook returned None → full refresh ran; state unchanged → no actions
    assert calls and {"mystery"} in calls
    assert eng.last_stats["course_mv"] == {"upserts": 0, "deletes": 0}


def test_hooks_receive_dataframes_not_collected_sets(spark, tmp_path):
    """The engine hands hooks per-table id FRAMES; changed ids are never
    funneled through the driver by the lane itself (the only collect in
    process_cdc_batch is the distinct table names)."""
    from pyspark.sql import DataFrame

    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    seen = []

    def hook(spark_, changed):
        seen.append({t: isinstance(df, DataFrame) for t, df in changed.items()})
        return _course_affected_keys(spark_, changed)

    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses", affected_keys=hook)
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", "p-4")]))
    assert seen and all(ok for call in seen for ok in call.values())


def test_large_scope_takes_semi_join_path(spark, tmp_path, monkeypatch):
    """Scope larger than SCOPE_LITERAL_MAX: compile_scoped abandons the
    literal IN for a left-semi join — bounded driver memory at any scope
    size — and the targeted refresh still converges to full-refresh
    state."""
    monkeypatch.setattr(ViewDef, "SCOPE_LITERAL_MAX", 1)
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses",
                   affected_keys=_course_affected_keys)
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()

    scope = spark.createDataFrame([("c-1",), ("c-2",), ("c-3",)], "id string")
    plan = view.compile_scoped(spark, scope)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan  # 3 keys > max(1) → semi-join, not IN-literal

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-4", "Prof Matthew") if r[0] == "p-4" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "person", "UPDATE", "p-4"),
        (2, "course", "UPDATE", "c-1"),
        (3, "course", "UPDATE", "c-2"),
    ]))
    assert eng.last_stats["course_mv"]["targeted"] == 1
    assert sink.get("courses", "c-3")["teacher"]["person"]["name"] == "Prof Matthew"
    assert sink.get("courses", "c-1") == fx.GOLDEN_C1


def test_aggregate_view_never_auto_targets(spark, tmp_path):
    """A single-table view keyed by something OTHER than the parent row
    id (here: a per-person-name-initial aggregate) must NOT auto-derive
    the id-from-parent targeted-refresh convention — CDC names changed
    ROW ids, which are not this view's keys, and scoping the recompute to
    them would silently miss the change (stale sink found by
    tools/fuzz_view_engine.py phase 3). The guard forces full
    recompute+diff, which converges."""
    fx.register(spark, str(tmp_path / "tables"))
    agg_sql = (
        "select substr(\"name\", 1, 1) as id, "
        "json_build_object('n', count(*)) as doc "
        'from person group by substr("name", 1, 1)'
    )
    view = ViewDef("initial_counts", sql=agg_sql)
    assert view.affected_keys is None  # the unsound convention is OFF
    # …while the person_mv shape (key IS the parent id) still derives it
    assert ViewDef("person_mv", sql=fx.PERSON_MV_SQL).affected_keys is not None

    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    eng.backfill()
    golden = {i: dict(d) for i, d in sink.indices["initial_counts"].items()}

    # mutate one person's name so their initial moves to 'Z'
    rows = {k: list(v) for k, v in fx.SEED.items()}
    victim = rows["person"][0][0]
    rows["person"] = [(r[0], "Zed") if r[0] == victim else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", victim)]))

    docs = sink.indices["initial_counts"]
    assert docs != golden, "sink did not converge after mutation"
    assert docs.get("Z") == {"n": 1}
    assert eng.last_stats["initial_counts"].get("targeted", 0) == 0


def test_cte_view_key_detection_uses_main_select(spark, tmp_path):
    """_selects_parent_id must inspect the MAIN query's select list, not
    a CTE body's: a CTE that selects `id` first must not re-enable the
    targeted convention for an outer query keyed by something else."""
    from sinker_spark.views import _selects_parent_id

    assert not _selects_parent_id(
        "WITH b AS (SELECT id, name FROM person) "
        "SELECT upper(name) AS id, name FROM b"
    )
    assert _selects_parent_id(
        "WITH b AS (SELECT upper(name) AS k FROM person) "
        "SELECT id, name FROM person"
    )


def test_selects_parent_id_doubled_quote_escapes():
    """ADVICE r4 (low): a literal with a doubled-quote escape ('it''s')
    BEFORE the main SELECT must not desynchronize the literal scan —
    the naive find() terminated at the inner quote, leaving the scanner
    mid-literal and able to mis-identify the first select item (wrongly
    enabling the id-from-parent targeted-refresh convention)."""
    from sinker_spark.views import _selects_parent_id

    # doubled-escape literal inside a CTE body; outer key is NOT id —
    # convention must stay OFF
    assert not _selects_parent_id(
        "WITH b AS (SELECT 'it''s, id fake' AS t, id FROM person) "
        "SELECT upper(name) AS k, t FROM b"
    )
    # and ON when the outer key IS id despite the tricky literal
    assert _selects_parent_id(
        "WITH b AS (SELECT 'it''s' AS t FROM person) "
        "SELECT id, name FROM person"
    )
    # escape in the select list itself: first item is a literal, not id
    assert not _selects_parent_id(
        "SELECT 'don''t', id FROM person"
    )
