"""SQL-declared doc-tree lane (ivm_doc_sql): the reference's own
course_mv.sql, opted in with ``ViewDef(sql=…, sql_doctree=True)``, is
maintained by the ENGINE as a pure delta fold on all five tables —
golden-doc backfill parity, per-batch fold parity against the transpiled
recompute, dim fan-out through the stored reverse indexes, replay
idempotence, and the decline→repair path for before-image-less batches."""

from __future__ import annotations

import json
from decimal import Decimal

from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.ivm_doc_sql import derive_sql_doctree
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink, _row_to_plain
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx

import pathlib

_TOOLS_DIR = pathlib.Path(__file__).resolve().parent.parent / "tools"

CDC_FULL = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)
COLS = {t: [c.split()[0] for c in fx.SCHEMAS[t].split(",")] for t in fx.SCHEMAS}


def _payload(t, r):
    return {c: (str(v) if isinstance(v, Decimal) else v) for c, v in zip(COLS[t], r)}


def _cdc(spark, records):
    """records: (lsn, table, op, id, payload_dict|None, before_dict|None)."""
    rows = [
        (lsn, "public", t, op, i,
         json.dumps(p) if p else None, json.dumps(b) if b else None)
        for lsn, t, op, i, p, b in records
    ]
    return spark.createDataFrame(rows, CDC_FULL)


def _engine(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_mv"].doctree is not None  # lane derived
    return eng, sink


def _check(spark, eng, sink):
    want = {
        r[0]: _row_to_plain(r[1])
        for r in eng.views["course_mv"].compile(spark).collect()
    }
    assert sink.indices.get("courses", {}) == want


def test_derivation_shape():
    import tempfile

    from sinker_spark.session import get_spark

    spark = get_spark("t")
    fx.register(spark, tempfile.mkdtemp())
    from sinker_spark.views import dim_nodes

    sd = derive_sql_doctree(spark, fx.COURSE_MV_SQL)
    assert sd is not None
    assert sd.spec.parent_table == "course"
    # linear chain → same normalized numbering (d0=teacher, d1=person)
    nodes = dim_nodes(sd.spec)
    assert [(nd.idx, nd.dim.table, nd.parent) for nd in nodes] == [
        (0, "teacher", None), (1, "person", 0)
    ]
    assert [(c.table, c.fk, c.alias) for c in sd.spec.children] == [
        ("enrollment", "course_id", "enrollments")
    ]
    # element dims are a forest of roots now (tree-capable); the linear
    # chain nests person under student with the historical numbering
    from sinker_spark.views import edim_nodes
    assert [(nd.idx, nd.dim.table, nd.parent)
            for nd in edim_nodes(sd.spec.children[0])] == [
        (0, "student", None), (1, "person", 0)
    ]
    # out-of-grammar SQL refuses derivation
    assert derive_sql_doctree(spark, fx.PERSON_MV_SQL) is None


def test_backfill_golden_then_fold_all_tables(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    assert sink.get("courses", "c-1") == fx.GOLDEN_C1
    _check(spark, eng, sink)

    # ONE batch mutating every constituent table, with before-images
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["person"][0][1] = "Johnny"                       # p-1 rename
    rows["teacher"][0][2] = Decimal("111111.00")          # t-1 salary
    rows["course"][2][1] = "Bizchain 2"                   # c-3 rename
    rows["student"][1][3] = Decimal("2.22")               # s-2 gpa
    e_new = ["e-9", "s-1", "c-3", Decimal("1.00")]
    rows["enrollment"].append(e_new)                      # insert
    e_del = ["e-4", "s-2", "c-2", Decimal("3.14")]
    rows["enrollment"] = [r for r in rows["enrollment"] if r[0] != "e-4"]
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    batch = _cdc(spark, [
        (1, "person", "UPDATE", "p-1", _payload("person", rows["person"][0]),
         _payload("person", ("p-1", "John"))),
        (2, "teacher", "UPDATE", "t-1", _payload("teacher", rows["teacher"][0]),
         _payload("teacher", ("t-1", "p-3", "100000.00"))),
        (3, "course", "UPDATE", "c-3", _payload("course", rows["course"][2]),
         _payload("course", ("c-3", "Bizchain", "How to build a business on-chain", "t-2"))),
        (4, "student", "UPDATE", "s-2", _payload("student", rows["student"][1]),
         _payload("student", ("s-2", "p-2", True, "3.99"))),
        (5, "enrollment", "INSERT", "e-9", _payload("enrollment", e_new), None),
        (6, "enrollment", "DELETE", "e-4", None, _payload("enrollment", e_del)),
    ])
    eng.process_cdc_batch(batch, epoch_id=1)
    assert eng.last_stats["course_mv"].get("doc_tree") == 1
    _check(spark, eng, sink)
    # verbatim redelivery: signed fold must not double-apply
    eng.process_cdc_batch(batch, epoch_id=1)
    _check(spark, eng, sink)


def test_dim_rename_folds_exact_fanout(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    n0 = len(sink.action_log)
    # p-3 → teacher t-1 → courses c-1, c-2 only (reverse-index walk)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["person"][2][1] = "Prof G2"
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (1, "person", "UPDATE", "p-3", _payload("person", rows["person"][2]),
         _payload("person", ("p-3", "Prof Georgios"))),
    ]), epoch_id=1)
    assert eng.last_stats["course_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"c-1", "c-2"}
    assert sink.get("courses", "c-1")["teacher"]["person"]["name"] == "Prof G2"
    _check(spark, eng, sink)


def test_teacher_delete_serves_null_not_retraction(spark, tmp_path):
    """SQL semantics diverge from the flat DocTreeViewSpec lane: a
    broken chain serves teacher=NULL, the doc SURVIVES (scalar-subquery
    semantics of the transpiled compile)."""
    eng, sink = _engine(spark, tmp_path)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["teacher"] = [r for r in rows["teacher"] if r[0] != "t-1"]
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (1, "teacher", "DELETE", "t-1", None,
         _payload("teacher", ("t-1", "p-3", "100000.00"))),
    ]), epoch_id=1)
    assert eng.last_stats["course_mv"].get("doc_tree") == 1
    assert sink.get("courses", "c-1") is not None
    assert sink.get("courses", "c-1")["teacher"] is None
    _check(spark, eng, sink)


def test_parent_delete_retracts_and_childless_serves_empty_array(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["course"] = [r for r in rows["course"] if r[0] != "c-2"]
    rows["enrollment"] = [r for r in rows["enrollment"] if r[2] != "c-2"]
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (1, "course", "DELETE", "c-2", None,
         _payload("course", ("c-2", "ZK Proofs", "Sometimes zero knowledge is more than enough", "t-1"))),
        (2, "enrollment", "DELETE", "e-3", None,
         _payload("enrollment", ("e-3", "s-1", "c-2", "3.50"))),
        (3, "enrollment", "DELETE", "e-4", None,
         _payload("enrollment", ("e-4", "s-2", "c-2", "3.14"))),
    ]), epoch_id=1)
    assert eng.last_stats["course_mv"].get("doc_tree") == 1
    assert sink.get("courses", "c-2") is None
    _check(spark, eng, sink)

    # remove c-3's only enrollment: doc serves [] (Spark aggregate
    # semantics of the transpiled compile), not NULL
    rows["enrollment"] = [r for r in rows["enrollment"] if r[0] != "e-5"]
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (4, "enrollment", "DELETE", "e-5", None,
         _payload("enrollment", ("e-5", "s-1", "c-3", "3.50"))),
    ]), epoch_id=2)
    assert sink.get("courses", "c-3")["enrollments"] == []
    _check(spark, eng, sink)


def test_missing_before_image_routes_to_repair(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["enrollment"] = [r for r in rows["enrollment"] if r[0] != "e-5"]
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "DELETE", "e-5", None, None),
    ]), epoch_id=1)
    assert "lane_fallback" in eng.last_stats["course_mv"]
    _check(spark, eng, sink)
    # next foldable batch folds again (repair restored the states)
    e_new = ["e-9", "s-2", "c-3", Decimal("2.00")]
    rows["enrollment"].append(e_new)
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (2, "enrollment", "INSERT", "e-9", _payload("enrollment", e_new), None),
    ]), epoch_id=2)
    assert eng.last_stats["course_mv"].get("doc_tree") == 1
    _check(spark, eng, sink)


def test_randomized_fold_soak(spark, tmp_path):
    """Seeded multi-batch churn on all five tables with before-images:
    fold parity against the transpiled recompute after every batch.
    Every 4th batch drops one before-image, forcing a decline→repair
    mid-soak — the NEXT batch must fold again off the repaired states
    (fold→repair→fold transitions under churn)."""
    import random

    rng = random.Random(517001)
    eng, sink = _engine(spark, tmp_path)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    lsn, next_e = 100, 20
    for b in range(10):
        drop_image = b % 4 == 3
        records = []
        for _ in range(rng.randrange(1, 4)):
            roll = rng.random()
            if roll < 0.2:
                r = rng.choice(rows["person"])
                old = list(r)
                r[1] = f"{r[1]}~{b}"
                records.append((lsn, "person", "UPDATE", r[0],
                                _payload("person", r), _payload("person", old)))
            elif roll < 0.35:
                r = rng.choice(rows["teacher"])
                old = list(r)
                r[2] = Decimal(f"{rng.randrange(50000, 150000)}.00")
                records.append((lsn, "teacher", "UPDATE", r[0],
                                _payload("teacher", r), _payload("teacher", old)))
            elif roll < 0.5:
                r = rng.choice(rows["course"])
                old = list(r)
                r[3] = rng.choice(["t-1", "t-2", "t-404"])  # incl. dangling
                records.append((lsn, "course", "UPDATE", r[0],
                                _payload("course", r), _payload("course", old)))
            elif roll < 0.65 and rows["enrollment"]:
                r = rng.choice(rows["enrollment"])
                old = list(r)
                r[2] = rng.choice([c[0] for c in rows["course"]])
                records.append((lsn, "enrollment", "UPDATE", r[0],
                                _payload("enrollment", r), _payload("enrollment", old)))
            elif roll < 0.8:
                r = [f"e-n{next_e}", rng.choice(["s-1", "s-2"]),
                     rng.choice([c[0] for c in rows["course"]]), Decimal("3.00")]
                next_e += 1
                rows["enrollment"].append(r)
                records.append((lsn, "enrollment", "INSERT", r[0],
                                _payload("enrollment", r), None))
            elif roll < 0.9 and len(rows["enrollment"]) > 1:
                i = rng.randrange(len(rows["enrollment"]))
                old = rows["enrollment"].pop(i)
                records.append((lsn, "enrollment", "DELETE", old[0],
                                None, _payload("enrollment", old)))
            else:
                r = rng.choice(rows["student"])
                old = list(r)
                r[3] = Decimal(f"{rng.randrange(200, 400) / 100:.2f}")
                records.append((lsn, "student", "UPDATE", r[0],
                                _payload("student", r), _payload("student", old)))
            lsn += 1
        if drop_image:
            for i, rec in enumerate(records):
                if rec[2] in ("UPDATE", "DELETE") and rec[5] is not None:
                    records[i] = rec[:5] + (None,)
                    break
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})
        eng.process_cdc_batch(_cdc(spark, records), epoch_id=b)
        stats = eng.last_stats["course_mv"]
        assert stats.get("doc_tree") == 1 or "lane_fallback" in stats, (b, stats)
        if not drop_image:
            assert stats.get("doc_tree") == 1, (b, stats)
        _check(spark, eng, sink)


def _gen_filtered_sql(rng):
    """Random round-6 grammar composition: per-block filters (to-one /
    to-many / element-dim), scalar-aggregate fields, declared json_agg
    ORDER BY — thresholds chosen inside the soak's mutation ranges so
    rows cross them under churn."""
    t_f = " and salary >= 100000.00" if rng.random() < 0.7 else ""
    # branched element tree: a SECOND independent element lookup next
    # to the student chain (composes with filters/order/aggs)
    c2 = (",\n        'course2', (select json_build_object('cname', c2.name) "
          "from course c2 where c2.id = course_id)"
          if rng.random() < 0.5 else "")
    e_f = " and grade > 3.00" if rng.random() < 0.7 else ""
    s_f = " and student.is_active" if rng.random() < 0.5 else ""
    # NB: order/element refs to the child's `id` are QUALIFIED — the
    # compiled path inlines the nested student lookup as a join, and a
    # bare `id` would be ambiguous there (documented loud-error edge)
    order = rng.choice(["", " order by grade desc, enrollment.id",
                        " order by enrollment.id desc"])
    aggs = ""
    if rng.random() < 0.7:
        aggs += (",\n    'n_e', (select count(*) from enrollment e9 "
                 f"where e9.course_id = course.id{e_f})")
    if rng.random() < 0.5:
        aggs += (",\n    'avg_g', (select avg(grade) from enrollment e8 "
                 "where course.id = e8.course_id)")
    return f"""select id, json_build_object('name', name,
    'teacher', (select json_build_object('salary', salary) from teacher
                where teacher.id = teacher_id{t_f}),
    'enrollments', (select json_agg(json_build_object('grade', grade, 'eid', enrollment.id,
        'student', (select json_build_object('gpa', gpa) from student
                    where student.id = student_id{s_f}){c2}){order})
      from enrollment where enrollment.course_id = course.id{e_f}){aggs}
  ) from course"""


def test_randomized_filtered_agg_soak(spark, tmp_path):
    """Seeded churn against RANDOMIZED round-6 grammar (filters, scalar
    aggregates, declared order): fold parity vs the transpiled
    recompute after every batch, with mutations crossing every filter
    threshold (salary, grade, is_active)."""
    import random

    for seed in (61801, 61802, 61803):
        rng = random.Random(seed)
        sql = _gen_filtered_sql(rng)
        base = tmp_path / f"s{seed}"
        fx.register(spark, str(base / "tables"))
        sink = InMemorySink()
        view = ViewDef("course_r_mv", sql=sql, index="courses_r",
                       sql_doctree=True)
        eng = SyncEngine(spark, [view], sink,
                         SnapshotStore(spark, str(base / "snap")))
        eng.backfill()
        assert eng.views["course_r_mv"].doctree is not None, (seed, sql)

        rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
        lsn, next_e = 100, 40
        for b in range(6):
            records = []
            for _ in range(rng.randrange(1, 4)):
                roll = rng.random()
                if roll < 0.22:   # salary across the 100000 threshold
                    r = rng.choice(rows["teacher"])
                    old = list(r)
                    r[2] = Decimal(f"{rng.randrange(80000, 120000)}.00")
                    records.append((lsn, "teacher", "UPDATE", r[0],
                                    _payload("teacher", r), _payload("teacher", old)))
                elif roll < 0.44 and rows["enrollment"]:  # grade across 3.00
                    r = rng.choice(rows["enrollment"])
                    old = list(r)
                    r[3] = Decimal(f"{rng.randrange(250, 350) / 100:.2f}")
                    records.append((lsn, "enrollment", "UPDATE", r[0],
                                    _payload("enrollment", r), _payload("enrollment", old)))
                elif roll < 0.6:  # is_active toggle
                    r = rng.choice(rows["student"])
                    old = list(r)
                    r[2] = not r[2]
                    records.append((lsn, "student", "UPDATE", r[0],
                                    _payload("student", r), _payload("student", old)))
                elif roll < 0.8:  # enrollment churn
                    r = [f"e-r{next_e}", rng.choice(["s-1", "s-2"]),
                         rng.choice([c[0] for c in rows["course"]]),
                         Decimal(f"{rng.randrange(250, 350) / 100:.2f}")]
                    next_e += 1
                    rows["enrollment"].append(r)
                    records.append((lsn, "enrollment", "INSERT", r[0],
                                    _payload("enrollment", r), None))
                elif roll < 0.9 and len(rows["enrollment"]) > 1:
                    i = rng.randrange(len(rows["enrollment"]))
                    old = rows["enrollment"].pop(i)
                    records.append((lsn, "enrollment", "DELETE", old[0],
                                    None, _payload("enrollment", old)))
                else:             # course re-point (incl. dangling)
                    r = rng.choice(rows["course"])
                    old = list(r)
                    r[3] = rng.choice(["t-1", "t-2", "t-404"])
                    records.append((lsn, "course", "UPDATE", r[0],
                                    _payload("course", r), _payload("course", old)))
                lsn += 1
            fx.register(spark, str(base / "tables"),
                        {k: [tuple(r) for r in v] for k, v in rows.items()})
            eng.process_cdc_batch(_cdc(spark, records), epoch_id=b)
            assert eng.last_stats["course_r_mv"].get("doc_tree") == 1, (seed, b)
            want = {
                r[0]: _row_to_plain(r[1])
                for r in eng.views["course_r_mv"].compile(spark).collect()
            }
            assert sink.indices.get("courses_r", {}) == want, (seed, b, sql)


# ------------------------------------------------------ root WHERE (r5 ADVICE)

COURSE_MV_WHERE_SQL = fx.COURSE_MV_SQL + "\nwhere name not like 'Hidden%'"


def test_root_where_serves_filter_and_retracts(spark, tmp_path):
    """A root-block WHERE is part of the view: the fold lane must serve
    only rows passing it and RETRACT a doc whose parent row crosses the
    predicate (previously the predicate was dropped and filtered-out
    rows were upserted — r5 ADVICE high)."""
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_w_mv", sql=COURSE_MV_WHERE_SQL, index="courses_w",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_w_mv"].doctree is not None  # lane still derives
    assert sink.get("courses_w", "c-1") is not None

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_w_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_w", {}) == want

    # rename c-1 INTO the filter → the FOLD lane must delete the doc
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    old_c1 = tuple(rows["course"][0])
    rows["course"][0][1] = "Hidden Reth"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", old_c1)),
    ]), epoch_id=1)
    assert eng.last_stats["course_w_mv"].get("doc_tree") == 1
    assert sink.get("courses_w", "c-1") is None
    _parity()

    # …and back OUT of the filter → upsert again, doc complete
    prev = tuple(rows["course"][0])
    rows["course"][0][1] = "Reth 2"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", prev)),
    ]), epoch_id=2)
    assert eng.last_stats["course_w_mv"].get("doc_tree") == 1
    assert sink.get("courses_w", "c-1") is not None
    assert sink.get("courses_w", "c-1")["name"] == "Reth 2"
    _parity()

    # a dim change must not resurrect a filtered-out doc: hide c-2,
    # then rename its teacher's person — only c-1 refreshes
    prev2 = tuple(rows["course"][1])
    rows["course"][1][1] = "Hidden ZK"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", prev2)),
    ]), epoch_id=3)
    assert sink.get("courses_w", "c-2") is None
    oldp = tuple(rows["person"][2])
    rows["person"][2][1] = "Prof G3"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (4, "person", "UPDATE", "p-3", _payload("person", rows["person"][2]),
         _payload("person", oldp)),
    ]), epoch_id=4)
    assert eng.last_stats["course_w_mv"].get("doc_tree") == 1
    assert sink.get("courses_w", "c-2") is None
    assert sink.get("courses_w", "c-1")["teacher"]["person"]["name"] == "Prof G3"
    _parity()


def test_root_where_out_of_reach_predicates_bail(spark, tmp_path):
    """Predicates the state-serve cannot apply refuse derivation (the
    targeted/full lanes stay on): unknown columns, foreign qualifiers."""
    import tempfile

    fx.register(spark, tempfile.mkdtemp())
    assert derive_sql_doctree(spark, fx.COURSE_MV_SQL + " where zz > 1") is None
    assert derive_sql_doctree(
        spark, fx.COURSE_MV_SQL + " where t9.name = 'x'"
    ) is None
    # …but a plain parent predicate derives
    assert derive_sql_doctree(spark, COURSE_MV_WHERE_SQL) is not None


COURSE_MV_FILTERED_SQL = """select id,
  json_build_object('name', name,
    'teacher', (select json_build_object('salary', salary) from teacher
                where salary >= 150000.00 and teacher.id = teacher_id),
    'enrollments', (select json_agg(json_build_object('grade', grade,
                      'student', (select json_build_object('gpa', gpa) from student
                                  where student.id = student_id and student.is_active)))
                    from enrollment where course.id = enrollment.course_id
                      and grade > 3.20))
from course"""


def test_filtered_blocks_fold_and_serve(spark, tmp_path):
    """Per-block FILTER conjuncts (``AND e.active``) are part of the
    view: a to-one row failing its filter serves NULL, a to-many row is
    excluded from its array, and filter-column-only deltas reach the
    affected docs through the same dim walk. Also exercises the
    REVERSED correlation spelling (``course.id = enrollment.course_id``)
    and conjunct-order independence (filter before the correlation)."""
    # filter columns land in the derived state schemas even when the
    # template doesn't project them (is_active is filter-only)
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_FILTERED_SQL)
    assert sd is not None
    assert "is_active" in sd.spec.children[0].dims[0].row_schema

    sink = InMemorySink()
    view = ViewDef("course_f_mv", sql=COURSE_MV_FILTERED_SQL, index="courses_f",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_f_mv"].doctree is not None

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_f_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_f", {}) == want

    # seeds: every teacher fails the salary filter → NULL teacher field;
    # only grade>3.2 enrollments appear
    _parity()
    c1 = sink.get("courses_f", "c-1")
    assert c1["teacher"] is None
    assert [e["grade"] for e in c1["enrollments"]] == [3.5]

    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}

    # 1. teacher crosses INTO the filter → object appears on c-1 and c-2
    old_t1 = tuple(rows["teacher"][0])
    rows["teacher"][0][2] = Decimal("160000.00")
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "teacher", "UPDATE", "t-1", _payload("teacher", rows["teacher"][0]),
         _payload("teacher", old_t1)),
    ]), epoch_id=1)
    assert eng.last_stats["course_f_mv"].get("doc_tree") == 1
    assert sink.get("courses_f", "c-1")["teacher"] == {"salary": 160000.0}
    _parity()

    # 2. enrollment grade crosses INTO the array filter
    old_e2 = tuple(rows["enrollment"][1])
    rows["enrollment"][1][3] = Decimal("3.60")
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "enrollment", "UPDATE", "e-2",
         _payload("enrollment", rows["enrollment"][1]),
         _payload("enrollment", old_e2)),
    ]), epoch_id=2)
    assert [e["grade"] for e in sink.get("courses_f", "c-1")["enrollments"]] \
        == [3.5, 3.6]
    _parity()

    # 3. filter-column-only dim delta: s-1 goes inactive → its student
    # object serves NULL members everywhere it appears
    old_s1 = tuple(rows["student"][0])
    rows["student"][0][2] = False
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "student", "UPDATE", "s-1", _payload("student", rows["student"][0]),
         _payload("student", old_s1)),
    ]), epoch_id=3)
    assert eng.last_stats["course_f_mv"].get("doc_tree") == 1
    got = {e["grade"]: e["student"] for e in sink.get("courses_f", "c-1")["enrollments"]}
    assert got[3.5] == {"gpa": None}          # s-1 filtered: NULL members
    assert got[3.6] == {"gpa": 3.99}          # s-2 untouched
    _parity()

    # 4. …and back out of the array: grade drops below the threshold
    prev_e2 = tuple(rows["enrollment"][1])
    rows["enrollment"][1][3] = Decimal("2.00")
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (4, "enrollment", "UPDATE", "e-2",
         _payload("enrollment", rows["enrollment"][1]),
         _payload("enrollment", prev_e2)),
    ]), epoch_id=4)
    assert [e["grade"] for e in sink.get("courses_f", "c-1")["enrollments"]] == [3.5]
    _parity()

    # correlated filters (an outer ref in a non-correlation conjunct)
    # DERIVE since r7 — the element predicate carries the anchor's
    # column as an __af_ probe slot (dedicated engine test below)
    corr = COURSE_MV_FILTERED_SQL.replace(
        "and grade > 3.20", "and grade > 3.20 and enrollment.id != course.name"
    )
    sd_corr = derive_sql_doctree(spark, corr)
    assert sd_corr is not None and sd_corr.corr_elem_pred
    assert list(sd_corr.corr_probe_cols.values()) == [[("__af_name", "name")]]
    # …but a ref OUTSIDE (own, anchor) scopes still bails: an unknown
    # alias, and a grandparent ref from a to-one hop inside the array
    # (its anchor is the element, not the root)
    assert derive_sql_doctree(spark, COURSE_MV_FILTERED_SQL.replace(
        "and grade > 3.20", "and grade > 3.20 and enrollment.id != zz.name"
    )) is None
    assert derive_sql_doctree(spark, COURSE_MV_FILTERED_SQL.replace(
        "and student.is_active", "and student.is_active and course.name != 'x'"
    )) is None
    # nondeterministic block filters refuse derivation like template
    # expressions do — a rand() filter re-drawn per serve would diverge
    # from the compiled recompute
    assert derive_sql_doctree(spark, COURSE_MV_FILTERED_SQL.replace(
        "and grade > 3.20", "and random() < 0.5"
    )) is None
    assert derive_sql_doctree(
        spark, fx.COURSE_MV_SQL + "\nwhere random() < 0.5"
    ) is None


# ------------------------------------ correlated block filters (r7)

COURSE_MV_CORR_SQL = """select id,
  json_build_object('name', name,
    'teacher', (select json_build_object('salary', salary) from teacher
                where teacher.id = teacher_id and course.name not like 'Hidden%'),
    'enrollments', (select json_agg(json_build_object('grade', grade))
                    from enrollment where enrollment.course_id = course.id
                      and (grade > 3.20 or course.name = 'ZK Proofs')))
from course"""


def test_correlated_block_filters_fold_and_serve(spark, tmp_path):
    """CORRELATED block filters (non-correlation conjuncts referencing
    the anchor — r6 bailed to targeted refresh): a to-one block's anchor
    ref folds into the serve JOIN condition (failing row serves NULL,
    like the compiled subquery matching nothing); a to-many block's
    anchor ref becomes an element predicate over __af_ probe slots.
    Anchor-column deltas flip both through the normal parent walk —
    compiled-view parity after every batch."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_CORR_SQL)
    assert sd is not None
    assert len(sd.corr_join_pred) == 1    # teacher block
    assert len(sd.corr_elem_pred) == 1    # enrollments block
    assert list(sd.corr_probe_cols.values()) == [[("__af_name", "name")]]

    sink = InMemorySink()
    view = ViewDef("course_c_mv", sql=COURSE_MV_CORR_SQL, index="courses_c",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_c_mv"].doctree is not None

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_c_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_c", {}) == want

    # seeds: the OR-branch keeps every enrollment on 'ZK Proofs' (c-2),
    # only grade>3.2 elsewhere; every teacher passes the name filter
    _parity()
    assert [e["grade"] for e in sink.get("courses_c", "c-1")["enrollments"]] == [3.5]
    assert [e["grade"] for e in sink.get("courses_c", "c-2")["enrollments"]] \
        == [3.14, 3.5]
    assert sink.get("courses_c", "c-1")["teacher"] == {"salary": 100000.0}

    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}

    # 1. rename c-1 → Hidden%: its TEACHER block's correlated join
    # filter flips → serves NULL; the array filter is unaffected
    old_c1 = tuple(rows["course"][0])
    rows["course"][0][1] = "Hidden Reth"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", old_c1)),
    ]), epoch_id=1)
    assert eng.last_stats["course_c_mv"].get("doc_tree") == 1
    assert sink.get("courses_c", "c-1")["teacher"] is None
    assert [e["grade"] for e in sink.get("courses_c", "c-1")["enrollments"]] == [3.5]
    _parity()

    # 2. rename c-2 away from 'ZK Proofs': the ELEMENT predicate's
    # anchor branch flips → 3.14 drops out of the array
    old_c2 = tuple(rows["course"][1])
    rows["course"][1][1] = "Deep ZK"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", old_c2)),
    ]), epoch_id=2)
    assert [e["grade"] for e in sink.get("courses_c", "c-2")["enrollments"]] == [3.5]
    _parity()

    # 3. child-side flip: e-5's grade drops below 3.2 on c-3 (name
    # branch false there) → leaves the array via the child delta walk
    old_e5 = tuple(rows["enrollment"][4])
    rows["enrollment"][4][3] = Decimal("3.00")
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "enrollment", "UPDATE", "e-5",
         _payload("enrollment", rows["enrollment"][4]),
         _payload("enrollment", old_e5)),
    ]), epoch_id=3)
    # root-level arrays coalesce to [] over empty (compiled scalar
    # subquery parity — see serve_docs_sql.array_frame docstring)
    assert sink.get("courses_c", "c-3")["enrollments"] == []
    _parity()

    # 4. …and the rename BACK re-admits c-1's teacher object
    rows["course"][0][1] = "Reth"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (4, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", ("c-1", "Hidden Reth", old_c1[2], old_c1[3]))),
    ]), epoch_id=4)
    assert sink.get("courses_c", "c-1")["teacher"] == {"salary": 100000.0}
    _parity()


COURSE_MV_AGG_ORDERED_SQL = """select id,
  json_build_object('name', name,
    'n_enroll', (select count(*) from enrollment
                 where enrollment.course_id = course.id),
    'avg_grade', (select avg(grade) from enrollment e2
                  where e2.course_id = course.id),
    'n_students', (select count(distinct student_id) from enrollment e5
                   where e5.course_id = course.id),
    'grades', (select json_agg(json_build_object('g', grade, 'eid', id)
                               order by grade desc, id)
               from enrollment e3 where e3.course_id = course.id))
from course"""


def test_scalar_agg_and_ordered_array_fold(spark, tmp_path):
    """Correlated SCALAR AGGREGATES (count/avg over children) and a
    DECLARED json_agg ORDER BY are doc-tree lane shapes: the fold serves
    count→0 / avg→NULL over empty (compiled-view parity) and the array
    in the declared key order, not element order."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_AGG_ORDERED_SQL)
    assert sd is not None
    aggs = {sc.node.alias: sc.agg for sc in sd.sql_children}
    assert aggs["enrollment"] == ("count", None)
    assert aggs["e2"] == ("avg", "grade")
    assert aggs["e5"] == ("count_distinct", "student_id")
    assert [sc.order_keys for sc in sd.sql_children if sc.node.alias == "e3"] \
        == [[("grade", True, True), ("id", False, False)]]

    sink = InMemorySink()
    view = ViewDef("course_a_mv", sql=COURSE_MV_AGG_ORDERED_SQL, index="courses_a",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_a_mv"].doctree is not None

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_a_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_a", {}) == want

    _parity()
    c1 = sink.get("courses_a", "c-1")
    assert c1["n_enroll"] == 2
    assert c1["n_students"] == 2
    # declared order: grade DESC then id — not ascending element order
    assert [e["g"] for e in c1["grades"]] == [3.5, 3.14]

    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}

    # churn: insert a tie (same grade as e-1, later id → sorts after),
    # delete e-2, and empty out c-3 entirely
    e9 = ["e-9", "s-2", "c-1", Decimal("3.50")]
    rows["enrollment"].append(e9)
    e2 = next(r for r in rows["enrollment"] if r[0] == "e-2")
    rows["enrollment"] = [r for r in rows["enrollment"] if r[0] != "e-2"]
    e5 = next(r for r in rows["enrollment"] if r[0] == "e-5")
    rows["enrollment"] = [r for r in rows["enrollment"] if r[0] != "e-5"]
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "INSERT", "e-9", _payload("enrollment", e9), None),
        (2, "enrollment", "DELETE", "e-2", None, _payload("enrollment", e2)),
        (3, "enrollment", "DELETE", "e-5", None, _payload("enrollment", e5)),
    ]), epoch_id=1)
    assert eng.last_stats["course_a_mv"].get("doc_tree") == 1
    c1 = sink.get("courses_a", "c-1")
    assert c1["n_enroll"] == 2
    assert [e["eid"] for e in c1["grades"]] == ["e-1", "e-9"]  # tie → id ASC
    c3 = sink.get("courses_a", "c-3")
    assert c3["n_enroll"] == 0            # count over empty → 0
    assert c3["n_students"] == 0          # count(distinct) over empty → 0
    assert c3["avg_grade"] is None        # avg over empty → NULL
    assert c3["grades"] == []             # root array over empty → []
    _parity()

    # redelivery: signed fold must not double-count
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "INSERT", "e-9", _payload("enrollment", e9), None),
        (2, "enrollment", "DELETE", "e-2", None, _payload("enrollment", e2)),
        (3, "enrollment", "DELETE", "e-5", None, _payload("enrollment", e5)),
    ]), epoch_id=1)
    assert sink.get("courses_a", "c-1")["n_enroll"] == 2
    _parity()


COURSE_MV_EXPR_SQL = """select id,
  json_build_object('uname', upper(name),
    'teacher', (select json_build_object('sal2', salary * 2,
                  'band', case when salary >= 100000.00 then 'hi' else 'lo' end)
                from teacher where teacher.id = teacher_id),
    'es', (select json_agg(json_build_object('gid',
                  enrollment.id || '@' || (grade * 10)::int))
           from enrollment where enrollment.course_id = course.id))
from course"""


def test_expression_template_values(spark, tmp_path):
    """Template values beyond bare columns — function calls, arithmetic,
    CASE, ``||`` chains with PG casts — compile against the block's own
    schema and are computed on the state rows; fold parity vs the
    transpiled recompute under churn on every block."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_EXPR_SQL)
    assert sd is not None
    # expression-referenced columns land in the state schemas
    assert "salary" in sd.spec.dim_forest[0].row_schema
    assert "grade" in sd.spec.children[0].row_schema

    sink = InMemorySink()
    view = ViewDef("course_e_mv", sql=COURSE_MV_EXPR_SQL, index="courses_e",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_e_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_e_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_e", {}) == want

    _parity()
    c1 = sink.get("courses_e", "c-1")
    assert c1["uname"] == "RETH"
    assert c1["teacher"] == {"sal2": 200000.0, "band": "hi"}
    assert sorted(e["gid"] for e in c1["es"]) == ["e-1@35", "e-2@31"]

    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    old_t1 = tuple(rows["teacher"][0])
    rows["teacher"][0][2] = Decimal("90000.00")   # band flips hi→lo
    old_e1 = tuple(rows["enrollment"][0])
    rows["enrollment"][0][3] = Decimal("2.75")    # gid recomputes
    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    eng.process_cdc_batch(_cdc(spark, [
        (1, "teacher", "UPDATE", "t-1", _payload("teacher", rows["teacher"][0]),
         _payload("teacher", old_t1)),
        (2, "enrollment", "UPDATE", "e-1",
         _payload("enrollment", rows["enrollment"][0]),
         _payload("enrollment", old_e1)),
    ]), epoch_id=1)
    assert eng.last_stats["course_e_mv"].get("doc_tree") == 1
    c1 = sink.get("courses_e", "c-1")
    assert c1["teacher"]["band"] == "lo"
    assert sorted(e["gid"] for e in c1["es"]) == ["e-1@27", "e-2@31"]
    _parity()

    # out-of-reach expressions refuse derivation: outer refs, rand()
    assert derive_sql_doctree(
        spark, COURSE_MV_EXPR_SQL.replace("salary * 2", "salary * rand()")
    ) is None
    assert derive_sql_doctree(
        spark, COURSE_MV_EXPR_SQL.replace("salary * 2", "salary + course.id")
    ) is None


COURSE_MV_ETREE_SQL = """select id,
  json_build_object('name', name,
    'enrollments', (select json_agg(json_build_object('grade', grade,
        'student', (select json_build_object('gpa', gpa,
                      'person', (select json_build_object('name', person.name)
                                 from person where person.id = person_id))
                    from student where student.id = student_id),
        'course2', (select json_build_object('cname', c2.name) from course c2
                    where c2.id = course_id)))
      from enrollment where enrollment.course_id = course.id))
from course"""


def test_branched_element_dim_tree(spark, tmp_path):
    """An element with TWO independent to-one lookups (student — itself
    chaining to person — AND a second course lookup) derives an element
    dim TREE: per-branch states/reverse indexes, deltas on either
    branch walk to exactly the affected docs, serve joins per branch."""
    from sinker_spark.views import edim_nodes

    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_ETREE_SQL)
    assert sd is not None
    nodes = edim_nodes(sd.spec.children[0])
    assert [(nd.idx, nd.dim.table, nd.parent) for nd in nodes] == [
        (0, "student", None), (1, "person", 0), (2, "course", None)
    ]

    sink = InMemorySink()
    view = ViewDef("course_t_mv", sql=COURSE_MV_ETREE_SQL, index="courses_t",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_t_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_t_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_t", {}) == want

    _parity()
    c1 = sink.get("courses_t", "c-1")
    assert {e["course2"]["cname"] for e in c1["enrollments"]} == {"Reth"}
    assert {e["student"]["person"]["name"] for e in c1["enrollments"]} \
        == {"John", "Loren"}

    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}

    def _sync():
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    # branch 1: person rename walks student→enrollment→course docs
    oldp = tuple(rows["person"][0])
    rows["person"][0][1] = "Johnny"
    _sync()
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "person", "UPDATE", "p-1", _payload("person", rows["person"][0]),
         _payload("person", oldp)),
    ]), epoch_id=1)
    assert eng.last_stats["course_t_mv"].get("doc_tree") == 1
    # p-1 → s-1 → enrollments in c-1, c-2, c-3 (exact fan-out)
    assert {k for (_, _op, k) in sink.action_log[n0:]} == {"c-1", "c-2", "c-3"}
    _parity()

    # branch 2: course rename reaches its own doc AND the course2
    # elements referencing it (both roles of the same table)
    oldc = tuple(rows["course"][0])
    rows["course"][0][1] = "Reth 2"
    _sync()
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", oldc)),
    ]), epoch_id=2)
    assert eng.last_stats["course_t_mv"].get("doc_tree") == 1
    c1 = sink.get("courses_t", "c-1")
    assert c1["name"] == "Reth 2"
    assert {e["course2"]["cname"] for e in c1["enrollments"]} == {"Reth 2"}
    _parity()

    # redelivery idempotence across the branched states
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", oldc)),
    ]), epoch_id=2)
    _parity()


def test_unqualified_outer_ambiguity_bails(spark):
    """An unqualified outer ref whose column also exists on the
    subquery's own table binds innermost-scope in PG — the doc-tree
    derivation must bail like the targeted hook does (r5 ADVICE med)."""
    spark.createDataFrame([("t1", "b1", "n")],
                          "id string, buddy_id string, name string") \
        .createOrReplaceTempView("dq_thing")
    # dq_buddy carries ITS OWN buddy_id column → ambiguous binding
    spark.createDataFrame([("b1", "x", "b9")],
                          "id string, name string, buddy_id string") \
        .createOrReplaceTempView("dq_buddy")
    amb = ("select id, json_build_object('n', name, "
           "'b', (select json_build_object('bn', name) from dq_buddy "
           "where dq_buddy.id = buddy_id)) as doc from dq_thing")
    assert derive_sql_doctree(spark, amb) is None
    # control: same shape, no clashing column → derives
    spark.createDataFrame([("b1", "x")], "id string, name string") \
        .createOrReplaceTempView("dq_buddy2")
    assert derive_sql_doctree(spark, amb.replace("dq_buddy", "dq_buddy2")) is not None


# ------------------------------------- main-FROM joins + branches (r6)

COURSE_MV_JOINED_SQL = """select course.id,
  json_build_object('name', course.name, 'description', course.description,
    'teacher_salary', t.salary,
    'teacher_person', (select json_build_object('name', name)
                       from person where person.id = t.person_id),
    'enrollments', (select json_agg(json_build_object('grade', "grade",
                      'student', (select json_build_object('gpa', "gpa")
                                  from student where student.id = student_id)))
                    from enrollment where enrollment.course_id = course.id))
from course join teacher t on course.teacher_id = t.id"""

ENROLL_MV_BRANCHED_SQL = """select id,
  json_build_object('grade', grade,
    'student', (select json_build_object('gpa', gpa,
                  'person', (select json_build_object('name', name)
                             from person where person.id = person_id))
                from student where student.id = student_id),
    'course', (select json_build_object('name', name)
               from course where course.id = course_id))
from enrollment"""


def test_joined_derivation_shape(spark):
    """Main-FROM join spelling: the join dim becomes root-dim d0 with
    the correlated person block as its child d1; jcol serves flat."""
    import tempfile

    fx.register(spark, tempfile.mkdtemp())
    sd = derive_sql_doctree(spark, COURSE_MV_JOINED_SQL)
    assert sd is not None
    assert [(rd.idx, rd.corr.table, rd.parent, rd.corr.join_how)
            for rd in sd.root_dims] == [
        (0, "teacher", None, "inner"), (1, "person", 0, None)
    ]
    assert [c.table for c in sd.spec.children] == ["enrollment"]
    # INNER-join grammar guards: fan-out join (dim side not its id) bails
    assert derive_sql_doctree(
        spark,
        "select id, json_build_object('n', course.name) "
        "from course join teacher t on course.teacher_id = t.person_id",
    ) is None
    # unqualified root template value with joins in scope is ambiguous
    assert derive_sql_doctree(
        spark,
        "select id, json_build_object('n', name) "
        "from course join teacher t on course.teacher_id = t.id",
    ) is None


def test_joined_engine_fold_inner_semantics(spark, tmp_path):
    """Engine e2e on the JOIN spelling: jcol refresh fans out through
    the join dim's reverse index; an INNER-joined dim's delete RETRACTS
    the docs (unlike the scalar-subquery NULL); parity with the
    transpiled compile after every batch."""
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_j_mv", sql=COURSE_MV_JOINED_SQL, index="courses_j",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_j_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_j_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_j", {}) == want

    _parity()
    assert sink.get("courses_j", "c-1")["teacher_salary"] == 100000.0
    assert sink.get("courses_j", "c-1")["teacher_person"] == {"name": "Prof Georgios"}

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    # salary change (jcol) fans out to t-1's courses only
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["teacher"][0][2] = Decimal("123456.00")
    _sync(rows)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "teacher", "UPDATE", "t-1", _payload("teacher", rows["teacher"][0]),
         _payload("teacher", ("t-1", "p-3", "100000.00"))),
    ]), epoch_id=1)
    assert eng.last_stats["course_j_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"c-1", "c-2"}
    assert sink.get("courses_j", "c-1")["teacher_salary"] == 123456.0
    _parity()

    # person rename reaches the docs through join-dim d0's child d1
    oldp = tuple(rows["person"][2])
    rows["person"][2][1] = "Prof GJ"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "person", "UPDATE", "p-3", _payload("person", rows["person"][2]),
         _payload("person", oldp)),
    ]), epoch_id=2)
    assert eng.last_stats["course_j_mv"].get("doc_tree") == 1
    assert sink.get("courses_j", "c-1")["teacher_person"] == {"name": "Prof GJ"}
    _parity()

    # INNER join: deleting teacher t-2 retracts c-3's doc entirely
    rows["teacher"] = [r for r in rows["teacher"] if r[0] != "t-2"]
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "teacher", "DELETE", "t-2", None,
         _payload("teacher", ("t-2", "p-4", "100000.00"))),
    ]), epoch_id=3)
    assert eng.last_stats["course_j_mv"].get("doc_tree") == 1
    assert sink.get("courses_j", "c-3") is None
    _parity()

    # enrollment churn still folds (child array unaffected by the joins)
    e_new = ["e-9", "s-2", "c-1", Decimal("2.50")]
    rows["enrollment"].append(e_new)
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (4, "enrollment", "INSERT", "e-9", _payload("enrollment", e_new), None),
    ]), epoch_id=4)
    assert eng.last_stats["course_j_mv"].get("doc_tree") == 1
    _parity()


def test_branched_sql_engine_fold(spark, tmp_path):
    """Two independent root lookups (enrollment→student→person AND
    enrollment→course): the derived forest branches at the parent and
    each branch's dim changes walk back through their own indexes."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, ENROLL_MV_BRANCHED_SQL)
    assert sd is not None
    assert [(rd.idx, rd.corr.table, rd.parent) for rd in sd.root_dims] == [
        (0, "student", None), (1, "person", 0), (2, "course", None)
    ]

    sink = InMemorySink()
    view = ViewDef("enroll_mv", sql=ENROLL_MV_BRANCHED_SQL, index="enrolls",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["enroll_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["enroll_mv"].compile(spark).collect()
        }
        assert sink.indices.get("enrolls", {}) == want

    _parity()
    assert sink.get("enrolls", "e-1")["student"]["person"] == {"name": "John"}
    assert sink.get("enrolls", "e-1")["course"] == {"name": "Reth"}

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    # person rename: branch-1 two-hop walk → s-1's enrollments only
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["person"][0][1] = "John B"
    _sync(rows)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "person", "UPDATE", "p-1", _payload("person", rows["person"][0]),
         _payload("person", ("p-1", "John"))),
    ]), epoch_id=1)
    assert eng.last_stats["enroll_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"e-1", "e-3", "e-5"}
    _parity()

    # course rename: branch-2 one-hop walk → c-1's enrollments only
    oldc = tuple(rows["course"][0])
    rows["course"][0][1] = "Reth II"
    _sync(rows)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "UPDATE", "c-1", _payload("course", rows["course"][0]),
         _payload("course", oldc)),
    ]), epoch_id=2)
    assert eng.last_stats["enroll_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"e-1", "e-2"}
    assert sink.get("enrolls", "e-1")["course"] == {"name": "Reth II"}
    _parity()

    # course delete: branch dims are scalar subqueries → field NULLs,
    # docs survive (transpiled semantics, unlike an INNER join)
    rows["course"] = [r for r in rows["course"] if r[0] != "c-3"]
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "course", "DELETE", "c-3", None,
         _payload("course", ("c-3", "Bizchain", "How to build a business on-chain", "t-2"))),
    ]), epoch_id=3)
    assert eng.last_stats["enroll_mv"].get("doc_tree") == 1
    assert sink.get("enrolls", "e-5") is not None
    assert sink.get("enrolls", "e-5")["course"] is None
    _parity()


TEACHER_MV_NESTED_SQL = """select id,
  json_build_object('salary', "salary",
    'courses', (select json_agg(json_build_object('cid', c.id, 'cname', c.name,
                  'enrollments', (select json_agg(json_build_object('grade', e.grade,
                        'student', (select json_build_object('gpa', "gpa")
                                    from student where student.id = e.student_id)))
                      from enrollment e where e.course_id = c.id)))
                from course c where c.teacher_id = teacher.id)) as "doc"
from teacher """


def test_nested_sql_derivation_shape(spark):
    """NESTED to-many spelling: a json_agg inside the child's element
    template derives ChildArraySpec.children — the whole two-level
    teacher→courses[]→enrollments[] doc is fold-lane maintained."""
    import tempfile

    from sinker_spark.ivm_flagship import doc_tree_states

    fx.register(spark, tempfile.mkdtemp())
    sd = derive_sql_doctree(spark, TEACHER_MV_NESTED_SQL)
    assert sd is not None
    assert sd.spec.parent_table == "teacher"
    (ch,) = sd.spec.children
    assert (ch.table, ch.fk, ch.key, ch.alias) == ("course", "teacher_id", "id", "courses")
    (gc,) = ch.children
    assert (gc.table, gc.fk, gc.alias) == ("enrollment", "course_id", "enrollments")
    assert [d.table for d in gc.dims] == ["student"]
    assert [s.suffix for s in doc_tree_states(sd.spec)] == [
        "p", "c0", "rkc0", "c0x0", "c0x0d0", "rc0x00",
    ]
    # a nested array NOT keyed on its container's id bails
    assert derive_sql_doctree(spark, """select id,
      json_build_object('courses', (select json_agg(json_build_object('n', c.name,
          'x', (select json_agg(json_build_object('g', e.grade))
                from enrollment e where e.student_id = c.teacher_id)))
        from course c where c.teacher_id = teacher.id)) as "doc"
      from teacher """) is None


def test_nested_sql_engine_fold(spark, tmp_path):
    """Engine e2e on the nested spelling: a student gpa change (a
    grandchild ELEMENT-DIM delta) walks student→enrollment→course→
    teacher through the reverse indexes + the rk ascent and re-serves
    exactly the affected teacher docs; grandchild churn and re-pointing
    fold; parity with the transpiled compile after every batch."""
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("teacher_mv", sql=TEACHER_MV_NESTED_SQL, index="teachers",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["teacher_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["teacher_mv"].compile(spark).collect()
        }
        assert sink.indices.get("teachers", {}) == want

    _parity()
    t1 = sink.get("teachers", "t-1")
    assert [c["cid"] for c in t1["courses"]] == ["c-1", "c-2"]
    assert {e["grade"] for c in t1["courses"] for e in c["enrollments"]} == {3.5, 3.14}

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    # student s-2 gpa change: s-2 is enrolled in c-1, c-2 (both t-1) —
    # the fold must re-serve t-1 ONLY (grandchild-dim walk + rk ascent)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    old_s2 = tuple(rows["student"][1])
    rows["student"][1][3] = Decimal("2.22")
    _sync(rows)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "student", "UPDATE", "s-2", _payload("student", rows["student"][1]),
         _payload("student", old_s2)),
    ]), epoch_id=1)
    assert eng.last_stats["teacher_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"t-1"}
    _parity()

    # grandchild re-point: e-5 (s-1, c-3/t-2) moves to c-2 (t-1) —
    # BOTH teachers' docs re-serve
    old_e5 = tuple(rows["enrollment"][4])
    rows["enrollment"][4][2] = "c-2"
    _sync(rows)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "enrollment", "UPDATE", "e-5", _payload("enrollment", rows["enrollment"][4]),
         _payload("enrollment", old_e5)),
    ]), epoch_id=2)
    assert eng.last_stats["teacher_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"t-1", "t-2"}
    assert sink.get("teachers", "t-2")["courses"][0]["enrollments"] is None
    _parity()

    # child re-point: course c-2 (with its enrollments) moves t-1 → t-2
    old_c2 = tuple(rows["course"][1])
    rows["course"][1][3] = "t-2"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", old_c2)),
    ]), epoch_id=3)
    assert eng.last_stats["teacher_mv"].get("doc_tree") == 1
    assert [c["cid"] for c in sink.get("teachers", "t-2")["courses"]] == ["c-2", "c-3"]
    _parity()

    # replay idempotence: the verbatim batch folds to a no-op
    eng.process_cdc_batch(_cdc(spark, [
        (3, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", old_c2)),
    ]), epoch_id=3)
    _parity()

    # parent delete retracts the doc
    rows["teacher"] = [r for r in rows["teacher"] if r[0] != "t-1"]
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (4, "teacher", "DELETE", "t-1", None,
         _payload("teacher", ("t-1", "p-3", "100000.00"))),
    ]), epoch_id=4)
    assert eng.last_stats["teacher_mv"].get("doc_tree") == 1
    assert sink.get("teachers", "t-1") is None
    _parity()


COURSE_MV_DIM_ARRAY_SQL = """select id,
  json_build_object('name', "name",
    'teacher', (select json_build_object('salary', "salary",
                  'courses', (select json_agg(json_build_object('cname', c2.name))
                              from course c2 where c2.teacher_id = teacher.id))
                from teacher where teacher.id = teacher_id)) as "doc"
from course """


def test_dim_anchored_sql_derivation_and_engine(spark, tmp_path):
    """DIM-ANCHORED array from SQL: a json_agg inside a to-one block's
    template keyed on that block (the teacher object carries the
    teacher's courses[] — siblings included). A sibling-course rename
    fans out through the dim's rp walk to every course of that teacher;
    parity with the transpiled compile after every batch."""
    from sinker_spark.ivm_flagship import doc_tree_states

    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_DIM_ARRAY_SQL)
    assert sd is not None
    assert [s.suffix for s in doc_tree_states(sd.spec)] == [
        "p", "d0", "rp0", "d0a0",
    ]
    (dim,) = sd.spec.dim_forest or sd.spec.dims
    assert [(a.table, a.fk, a.alias) for a in dim.arrays] == [
        ("course", "teacher_id", "courses")
    ]

    sink = InMemorySink()
    view = ViewDef("course_da_mv", sql=COURSE_MV_DIM_ARRAY_SQL, index="courses_da",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_da_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_da_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_da", {}) == want

    _parity()
    c1 = sink.get("courses_da", "c-1")
    assert [x["cname"] for x in c1["teacher"]["courses"]] == ["Reth", "ZK Proofs"]

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    # sibling rename: course c-2 (t-1) renamed — the t-1 docs (c-1, c-2)
    # re-serve (c-2 via its own delta, c-1 via the dim-anchored ascent);
    # c-3 (t-2) must NOT
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    old_c2 = tuple(rows["course"][1])
    rows["course"][1][1] = "ZK2"
    _sync(rows)
    n0 = len(sink.action_log)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", old_c2)),
    ]), epoch_id=1)
    assert eng.last_stats["course_da_mv"].get("doc_tree") == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"c-1", "c-2"}
    assert [x["cname"] for x in sink.get("courses_da", "c-1")["teacher"]["courses"]] \
        == ["Reth", "ZK2"]
    _parity()

    # course re-pointed to the other teacher: arrays on BOTH teachers'
    # docs change (it leaves t-1's list, joins t-2's)
    old_c2b = tuple(rows["course"][1])
    rows["course"][1][3] = "t-2"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", old_c2b)),
    ]), epoch_id=2)
    assert eng.last_stats["course_da_mv"].get("doc_tree") == 1
    assert [x["cname"] for x in sink.get("courses_da", "c-1")["teacher"]["courses"]] \
        == ["Reth"]
    assert [x["cname"] for x in sink.get("courses_da", "c-3")["teacher"]["courses"]] \
        == ["Bizchain", "ZK2"]
    _parity()

    # teacher delete: t-2's docs serve teacher=NULL (scalar-subquery
    # semantics), arrays under the missing dim vanish with the struct
    rows["teacher"] = [r for r in rows["teacher"] if r[0] != "t-2"]
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "teacher", "DELETE", "t-2", None,
         _payload("teacher", ("t-2", "p-4", "100000.00"))),
    ]), epoch_id=3)
    assert eng.last_stats["course_da_mv"].get("doc_tree") == 1
    assert sink.get("courses_da", "c-3")["teacher"] is None
    _parity()


# --------------------------------------- dim-column root WHERE (r7)

COURSE_MV_DIM_WHERE_SQL = """select course.id,
  json_build_object('name', course.name, 'salary', t.salary,
    'enrollments', (select json_agg(json_build_object('grade', grade))
                    from enrollment where enrollment.course_id = course.id))
from course join teacher t on course.teacher_id = t.id
where t.salary >= 100000.00 and course.name not like 'Hidden%'"""


def test_dim_where_derivation_and_fold(spark, tmp_path):
    """Root WHERE over a JOIN-DIM column (``where t.salary >= …``):
    derives (r6 bailed), the predicate's dim column lands in the dim
    state schema, a dim delta flipping it RETRACTS the doc through the
    reverse-index walk, and flipping back re-upserts — compiled-view
    parity after every batch."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_DIM_WHERE_SQL)
    assert sd is not None
    assert sd.where_expr is None and sd.where_join_expr is not None
    assert "salary" in sd.spec.dim_forest[0].row_schema

    sink = InMemorySink()
    view = ViewDef("course_w_mv", sql=COURSE_MV_DIM_WHERE_SQL, index="courses_w",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_w_mv"].doctree is not None

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_w_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_w", {}) == want

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    _parity()
    assert set(sink.indices["courses_w"]) == {"c-1", "c-2", "c-3"}

    # t-1's salary drops below the threshold: c-1 and c-2 RETRACT
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["teacher"][0][2] = Decimal("99999.00")
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "teacher", "UPDATE", "t-1", _payload("teacher", rows["teacher"][0]),
         _payload("teacher", ("t-1", "p-3", "100000.00"))),
    ]), epoch_id=1)
    assert eng.last_stats["course_w_mv"].get("doc_tree") == 1
    assert set(sink.indices["courses_w"]) == {"c-3"}
    _parity()

    # …and back above: both re-upsert through the same walk
    old = tuple(rows["teacher"][0])
    rows["teacher"][0][2] = Decimal("150000.00")
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "teacher", "UPDATE", "t-1", _payload("teacher", rows["teacher"][0]),
         _payload("teacher", old)),
    ]), epoch_id=2)
    assert set(sink.indices["courses_w"]) == {"c-1", "c-2", "c-3"}
    assert sink.get("courses_w", "c-1")["salary"] == 150000.0
    _parity()

    # the PARENT conjunct still applies: renaming c-2 to Hidden% retracts it
    oldc = tuple(rows["course"][1])
    rows["course"][1][1] = "Hidden gem"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", oldc)),
    ]), epoch_id=3)
    assert set(sink.indices["courses_w"]) == {"c-1", "c-3"}
    _parity()

    # out-of-reach root WHERE still bails: a correlated-block alias is
    # not in the root WHERE's scope
    assert derive_sql_doctree(spark, fx.COURSE_MV_SQL + "\nwhere zz.name = 'x'") is None


# --------------------------------- fuzz-maker grammar coverage (r7)

def test_fuzz_sql_doctree_maker_always_derives(spark, tmp_path):
    """Every shape tools/fuzz_engine.make_sql_doctree_view draws —
    join-spelled vs correlated to-one, plain/correlated block filters,
    parent and JOIN-DIM root WHERE, ordered json_agg — must derive the
    fold lane (a silent fall-back would mean the fuzzer stopped
    exercising it), and the r7 options must appear across seeds."""
    import random
    import sys

    sys.path.insert(0, str(_TOOLS_DIR))
    import fuzz_engine as fe

    fe.register_truth(
        spark, {"s1": ("eu", "a", 5.0)}, {"eu": ("m1", "c1")}, {"m1": "d1"},
        {"a": "L0"}, {"d1": "f1"}, {}, {"c1": "g1"}, {},
    )
    saw_dim_where = saw_corr = 0
    for seed in range(40):
        v = fe.make_sql_doctree_view(random.Random(seed), f"v{seed}")
        sd = derive_sql_doctree(spark, v.sql)
        assert sd is not None, f"seed {seed} fell out of the grammar: {v.sql}"
        saw_dim_where += sd.where_join_expr is not None
        saw_corr += bool(sd.corr_join_pred or sd.corr_elem_pred)
    assert saw_dim_where >= 5 and saw_corr >= 10


def test_fuzz_sql_doctree_one_engine_run(spark, tmp_path):
    """One short differential fuzz run of the SQL-declared doc-tree
    lane: two generated views (seed 5), three random CDC batches, sink
    docs == transpiled compile after every batch (the same parity the
    dedicated tests assert, over shapes nobody hand-wrote)."""
    import sys

    sys.path.insert(0, str(_TOOLS_DIR))
    import fuzz_engine as fe

    old_makers = fe.MAKERS
    fe.MAKERS = [fe.make_sql_doctree_view]
    try:
        errs = fe.one_run(spark, 5, 3)
    finally:
        fe.MAKERS = old_makers
    assert errs == [], errs


# ----------------------------------- json_agg(DISTINCT …) fold (r7)

COURSE_MV_DISTINCT_SQL = """select id,
  json_build_object('name', name,
    'grades', (select json_agg(distinct json_build_object('g', grade))
               from enrollment where enrollment.course_id = course.id))
from course"""


def test_distinct_agg_fold_and_serve(spark, tmp_path):
    """``json_agg(DISTINCT json_build_object(…))`` (PG MVs use it to
    dedup join fan-out — r6 bailed the whole derivation): the serve
    dedups element VALUES (sort_array∘array_distinct∘collect_list),
    matching the transpiled compile's collect_list(DISTINCT …). A
    duplicate-valued child INSERT leaves the array unchanged; deleting
    ONE of two identical-valued rows keeps the element; deleting the
    last occurrence retracts it. DISTINCT + declared ORDER BY still
    bails (PG restricts it to the element; not worth proving here)."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_DISTINCT_SQL)
    assert sd is not None and sd.sql_children[0].distinct
    assert derive_sql_doctree(spark, COURSE_MV_DISTINCT_SQL.replace(
        "json_build_object('g', grade))",
        "json_build_object('g', grade) order by grade)",
    )) is None

    sink = InMemorySink()
    view = ViewDef("course_d_mv", sql=COURSE_MV_DISTINCT_SQL, index="courses_d",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_d_mv"].doctree is not None

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_d_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_d", {}) == want

    _parity()
    assert [g["g"] for g in sink.get("courses_d", "c-1")["grades"]] == [3.14, 3.5]

    # 1. duplicate-VALUED insert (e-9 repeats c-1's 3.50): array unchanged
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    rows["enrollment"].append(["e-9", "s-2", "c-1", Decimal("3.50")])
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "INSERT", "e-9",
         _payload("enrollment", rows["enrollment"][-1]), None),
    ]), epoch_id=1)
    assert eng.last_stats["course_d_mv"].get("doc_tree") == 1
    assert [g["g"] for g in sink.get("courses_d", "c-1")["grades"]] == [3.14, 3.5]
    _parity()

    # 2. delete ONE of the two 3.50 rows: the element survives
    gone = rows["enrollment"].pop(0)          # e-1 (c-1, 3.50)
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "enrollment", "DELETE", "e-1", None, _payload("enrollment", gone)),
    ]), epoch_id=2)
    assert [g["g"] for g in sink.get("courses_d", "c-1")["grades"]] == [3.14, 3.5]
    _parity()

    # 3. delete the LAST 3.50 row: the element finally retracts
    gone9 = rows["enrollment"].pop()          # e-9
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "enrollment", "DELETE", "e-9", None, _payload("enrollment", gone9)),
    ]), epoch_id=3)
    assert [g["g"] for g in sink.get("courses_d", "c-1")["grades"]] == [3.14]
    _parity()


# ---------------------------------- non-key parent anchors (r7)

COURSE_MV_ALT_ANCHOR_SQL = """select id,
  json_build_object('name', name,
    'peers', (select json_agg(json_build_object('cid', c2.id))
              from course c2 where c2.teacher_id = course.teacher_id),
    'n_peers', (select count(*) from course c3
                where c3.teacher_id = course.teacher_id))
from course"""


def test_alt_anchor_array_fold_and_serve(spark, tmp_path):
    """A to-many block keyed on a NON-KEY parent column (r6's last
    shape restriction bailed it): each course doc lists the courses
    sharing its teacher. The fold maintains an anchor→parent-key
    reverse index (ra state) so a child delta walks to EVERY doc
    sharing the anchor value — a teacher re-point updates the moved
    course's own doc AND both peer groups it left/joined — with
    compiled-view parity after every batch."""
    fx.register(spark, str(tmp_path / "tables"))
    sd = derive_sql_doctree(spark, COURSE_MV_ALT_ANCHOR_SQL)
    assert sd is not None
    assert sd.sql_children[0].anchor == "teacher_id"
    assert sd.spec.children[0].anchor_col == "teacher_id"
    from sinker_spark.ivm_flagship import doc_tree_states
    assert any(s.suffix == "rac0" for s in doc_tree_states(sd.spec))

    sink = InMemorySink()
    view = ViewDef("course_a_mv", sql=COURSE_MV_ALT_ANCHOR_SQL, index="courses_a",
                   sql_doctree=True)
    eng = SyncEngine(spark, [view], sink,
                     SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert eng.views["course_a_mv"].doctree is not None

    def _sync(rows):
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})

    def _parity():
        want = {
            r[0]: _row_to_plain(r[1])
            for r in eng.views["course_a_mv"].compile(spark).collect()
        }
        assert sink.indices.get("courses_a", {}) == want

    def _peers(cid):
        return [p["cid"] for p in sink.get("courses_a", cid)["peers"]]

    _parity()
    assert _peers("c-1") == ["c-1", "c-2"] and _peers("c-3") == ["c-3"]
    assert sink.get("courses_a", "c-1")["n_peers"] == 2   # scalar agg, alt anchor

    # 1. re-point c-2's teacher t-1 → t-2: c-2's own doc changes AND
    # both peer groups it left (c-1's) and joined (c-3's) re-serve
    # through the ra walk — no full refresh
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    old_c2 = tuple(rows["course"][1])
    rows["course"][1][3] = "t-2"
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "course", "UPDATE", "c-2", _payload("course", rows["course"][1]),
         _payload("course", old_c2)),
    ]), epoch_id=1)
    assert eng.last_stats["course_a_mv"].get("doc_tree") == 1
    assert _peers("c-1") == ["c-1"]
    assert _peers("c-2") == ["c-2", "c-3"] and _peers("c-3") == ["c-2", "c-3"]
    _parity()

    # 2. a new course under t-1 joins c-1's peer group via the same walk
    rows["course"].append(["c-4", "Rollups", "Scaling reads", "t-1"])
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "course", "INSERT", "c-4", _payload("course", rows["course"][-1]), None),
    ]), epoch_id=2)
    assert _peers("c-1") == ["c-1", "c-4"] and _peers("c-4") == ["c-1", "c-4"]
    assert sink.get("courses_a", "c-1")["n_peers"] == 2
    _parity()

    # 3. delete c-4: c-1's peer array shrinks back
    gone = rows["course"].pop()
    _sync(rows)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "course", "DELETE", "c-4", None, _payload("course", tuple(gone))),
    ]), epoch_id=3)
    assert _peers("c-1") == ["c-1"]
    _parity()

    # an anchor that names NO parent column still bails
    assert derive_sql_doctree(spark, COURSE_MV_ALT_ANCHOR_SQL.replace(
        "course.teacher_id)", "course.zz)"
    )) is None
