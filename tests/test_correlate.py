"""Auto-derived targeted refresh from the view SQL's correlation tree
(compiler/correlate.py): a reference user who drops course_mv.sql into
the definitions dir gets O(affected-docs) refresh on changes to EVERY
table in the tree — teacher/person renames, enrollment churn — with
zero Python, and the hook declines (None → full recompute+diff) exactly
where targeting would be unsound (mutated to-many rows without
before-image fks, out-of-tree tables, schema ambiguity)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sinker_spark.compiler.correlate import (
    derive_affected_rows_keys,
    parse_correlation_tree,
)
from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx

CDC_FULL = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


# --------------------------------------------------------------- parser

def test_parses_reference_course_mv_shape():
    t = parse_correlation_tree(fx.COURSE_MV_SQL)
    assert t is not None
    assert t.parent_table == "course"
    assert t.tables() == {"course", "teacher", "person", "student", "enrollment"}
    edges = {(n.table, n.sub_col,
              n.outer.table if n.outer else "course", n.outer_col)
             for n in t.nodes}
    assert edges == {
        ("teacher", "id", "course", "teacher_id"),
        ("person", "id", "teacher", "person_id"),
        ("enrollment", "course_id", "course", "id"),
        ("student", "id", "enrollment", "student_id"),
        ("person", "id", "student", "person_id"),
    }
    # to-one vs to-many classification
    kinds = {(n.table, n.outer.table if n.outer else "course"): n.to_one("id")
             for n in t.nodes}
    assert kinds[("enrollment", "course")] is False
    assert kinds[("teacher", "course")] is True


def test_out_of_grammar_shapes_bail():
    for bad in [
        fx.PERSON_MV_SQL,  # single-table: the simpler id convention applies
        # fan-out join (dim side is a fk, not the dim's id) — a to-one
        # join on b.id would parse under the main-FROM join grammar
        "select id, x from a join b on a.fk = b.other",
        "with c as (select 1) select id, (select v from d where d.id = did) from t",
        "select id, (select v from d, e where d.id = did) from t",
        # TWO cross-scope equalities: ambiguous correlation edge
        "select id, (select v from d where d.id = did and d.x = t.y) from t",
        # a subquery inside the block's WHERE is blanked text → bail
        "select id, (select v from d where d.id = did and d.x in (select z from w)) from t",
        # ORDER BY/LIMIT tails in the block's WHERE region
        "select id, (select v from d where d.id = did limit 1) from t",
        "select id, (select v from d where d.id = did) from t where exists (select 1 from z)",
        "select id, (select v from d where d.id = did) from t union all select id, 1 from u",
        # function-form FROM must not be mistaken for a table source
        "select id, extract(epoch from ts) from t",
    ]:
        assert parse_correlation_tree(bad) is None, bad


def test_block_tail_keywords_inside_literals_do_not_bail():
    """The ORDER BY/LIMIT tail bail is literal-aware: a block filter
    whose STRING literal happens to contain 'limit'/'order by' must not
    drop the view out of the correlation grammar (it's a plain filter,
    and losing it silently costs the targeted/fold lanes)."""
    t = parse_correlation_tree(
        "select id, json_build_object('es', (select json_agg("
        "json_build_object('g', grade)) from enrollment e "
        "where e.course_id = course.id and note like '%limit%' "
        "and tag <> 'order by')) from course"
    )
    assert t is not None
    e = {n.table: n for n in t.nodes}["enrollment"]
    assert e.filters == ["note like '%limit%'", "tag <> 'order by'"]
    # …while a REAL tail keyword in code position still bails
    assert parse_correlation_tree(
        "select id, json_build_object('es', (select json_agg("
        "json_build_object('g', grade)) from enrollment e "
        "where e.course_id = course.id limit 5)) from course"
    ) is None


def test_filter_conjuncts_parse_onto_nodes():
    """Non-correlation WHERE conjuncts (``AND e.active``) are grammar:
    recorded raw on CorrNode.filters in any conjunct order, with either
    equality side order, and never mistaken for the correlation edge."""
    t = parse_correlation_tree(
        "select id, json_build_object("
        "'tt', (select json_build_object('s', salary) from teacher "
        "       where salary >= 100000 and teacher.id = teacher_id),"
        "'es', (select json_agg(json_build_object('g', grade)) from enrollment e "
        "       where course.id = e.course_id and grade > 3.2 and e.flag = true)"
        ") from course"
    )
    assert t is not None
    by_table = {n.table: n for n in t.nodes}
    assert by_table["teacher"].filters == ["salary >= 100000"]
    assert by_table["teacher"].sub_col == "id"
    # reversed equality order still resolves the edge correctly
    e = by_table["enrollment"]
    assert (e.sub_col, e.outer_col) == ("course_id", "id")
    # keyword-literal equality is a filter, not a correlation edge
    assert e.filters == ["grade > 3.2", "e.flag = true"]
    # the filtered shape still derives a targeted hook (filters only
    # widen the walked set → sound over-approximation)
    assert derive_affected_rows_keys(
        "select id, json_build_object('es', (select json_agg("
        "json_build_object('g', grade)) from enrollment e "
        "where e.course_id = course.id and grade > 3.2)) from course"
    ) is not None


def test_viewdef_autoinstalls_rows_hook():
    v = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses")
    assert v.affected_keys is None          # the id-convention stays OFF
    assert v.affected_rows_keys is not None
    assert v.affected_rows_keys.correlation_tree.parent_table == "course"
    # single-table person_mv keeps the simpler id-from-parent convention
    p = ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people")
    assert p.affected_keys is not None and p.affected_rows_keys is None
    # an explicit hook wins over derivation
    sentinel = lambda s, c: None  # noqa: E731
    w = ViewDef("course_mv2", sql=fx.COURSE_MV_SQL, index="x", affected_keys=sentinel)
    assert w.affected_keys is sentinel and w.affected_rows_keys is None


# ------------------------------------------------------------ hook logic

def _cdc(spark, records):
    """records: (lsn, table, op, id, payload|None, payload_before|None)."""
    rows = [
        (lsn, "public", t, op, i,
         json.dumps(p) if p else None, json.dumps(b) if b else None)
        for lsn, t, op, i, p, b in records
    ]
    return spark.createDataFrame(rows, CDC_FULL)


def _engine(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses")
    assert view.affected_rows_keys is not None
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    return eng, sink


def _truth_ids(spark):
    return {r[0] for r in spark.table("course").select("id").collect()}


def _assert_full_parity(spark, eng, sink):
    """End state equals a from-scratch recompute of the view."""
    from sinker_spark.sinks.memory import _row_to_plain

    want = {
        r[0]: _row_to_plain(r[1])
        for r in eng.views["course_mv"].compile(spark).collect()
    }
    got = sink.indices.get("courses", {})
    assert got == want


def test_dim_rename_targets_exact_fanout(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    n0 = len(sink.action_log)
    # p-3 → teacher t-1 → courses c-1, c-2 (c-3 untouched)
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-3", "Prof G!") if r[0] == "p-3" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", "p-3", None, None)]))
    assert eng.last_stats["course_mv"]["targeted"] == 1
    touched = {k for (_, op, k) in sink.action_log[n0:]}
    assert touched == {"c-1", "c-2"}
    assert sink.get("courses", "c-1")["teacher"]["person"]["name"] == "Prof G!"
    _assert_full_parity(spark, eng, sink)


def test_student_person_rename_walks_enrollment_path(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    n0 = len(sink.action_log)
    # p-2 → student s-2 → enrollments e-2 (c-1), e-4 (c-2); c-3 untouched
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-2", "Lor") if r[0] == "p-2" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", "p-2", None, None)]))
    touched = {k for (_, op, k) in sink.action_log[n0:]}
    assert touched == {"c-1", "c-2"}
    _assert_full_parity(spark, eng, sink)


def test_child_insert_with_payload_targets_one_doc(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    n0 = len(sink.action_log)
    from decimal import Decimal

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["enrollment"].append(("e-6", "s-2", "c-3", Decimal("2.50")))
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "INSERT", "e-6",
         {"id": "e-6", "student_id": "s-2", "course_id": "c-3", "grade": "2.50"}, None),
    ]))
    assert eng.last_stats["course_mv"]["targeted"] == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"c-3"}
    _assert_full_parity(spark, eng, sink)


def test_child_repoint_with_before_image_targets_both_docs(spark, tmp_path):
    eng, sink = _engine(spark, tmp_path)
    n0 = len(sink.action_log)
    from decimal import Decimal

    # move e-5 (s-1) from c-3 to c-1: BOTH docs must refresh
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["enrollment"] = [
        ("e-5", "s-1", "c-1", Decimal("3.50")) if r[0] == "e-5" else r
        for r in rows["enrollment"]
    ]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "UPDATE", "e-5",
         {"id": "e-5", "student_id": "s-1", "course_id": "c-1", "grade": "3.50"},
         {"id": "e-5", "student_id": "s-1", "course_id": "c-3", "grade": "3.50"}),
    ]))
    assert eng.last_stats["course_mv"]["targeted"] == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"c-1", "c-3"}
    assert len(sink.get("courses", "c-3")["enrollments"] or []) == 0
    _assert_full_parity(spark, eng, sink)


def test_child_mutation_without_before_image_full_refreshes(spark, tmp_path):
    """The unsoundness gate: an UPDATE/DELETE of a to-many row without
    its before-image fk may have LEFT a document we cannot identify —
    the hook must answer None and the engine must take the full path
    (stale-sink class; same contract the hand-written hook documents)."""
    eng, sink = _engine(spark, tmp_path)
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["enrollment"] = [r for r in rows["enrollment"] if r[0] != "e-5"]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "DELETE", "e-5", None, None),
    ]))
    assert "targeted" not in eng.last_stats["course_mv"]
    assert len(sink.get("courses", "c-3")["enrollments"] or []) == 0
    _assert_full_parity(spark, eng, sink)


def test_unresolvable_child_insert_full_refreshes(spark, tmp_path):
    """A payload-less child id that is also absent from the live table
    cannot be mapped to any parent → None → full refresh (still
    correct end state)."""
    eng, sink = _engine(spark, tmp_path)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "enrollment", "INSERT", "e-ghost", None, None),
    ]))
    assert "targeted" not in eng.last_stats["course_mv"]
    _assert_full_parity(spark, eng, sink)


def test_schema_ambiguity_disables_hook(spark):
    """If the unqualified outer ref also names a column of the subquery's
    own table, PG would have bound it THERE — the parse is wrong and the
    hook must answer None (validated against the live catalog)."""
    spark.createDataFrame([("a1", "b1", "x")], "id string, bref string, v string") \
        .createOrReplaceTempView("amb_a")
    # amb_b carries ITS OWN column named bref → ambiguity
    spark.createDataFrame([("b1", "b1", "y")], "id string, bref string, w string") \
        .createOrReplaceTempView("amb_b")
    hook = derive_affected_rows_keys(
        "select id, (select w from amb_b where amb_b.id = bref) as d from amb_a"
    )
    assert hook is not None  # parses…
    rows = spark.createDataFrame(
        [(1, "public", "amb_b", "UPDATE", "b1", None, None)], CDC_FULL
    )
    assert hook(spark, rows) is None  # …but declines at runtime


def test_out_of_tree_table_answers_none(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    hook = derive_affected_rows_keys(fx.COURSE_MV_SQL)
    rows = spark.createDataFrame(
        [(1, "public", "sometable", "INSERT", "x", None, None)], CDC_FULL
    )
    assert hook(spark, rows) is None


def test_empty_batch_yields_empty_scope(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    hook = derive_affected_rows_keys(fx.COURSE_MV_SQL)
    rows = spark.createDataFrame([], CDC_FULL)
    out = hook(spark, rows)
    assert out is not None and out.count() == 0


def test_randomized_soak_converges_every_batch(spark, tmp_path):
    """Seeded CDC soak over the school schema with PROPER per-row CDC
    records (payload + before-image): random renames, re-points,
    inserts and deletes on all five tables, engine refresh after every
    batch, sink compared against a full recompute every time. Mixes
    targetable batches with ones that must decline (missing
    before-images), and asserts the targeted path actually ran."""
    import random
    from decimal import Decimal

    rng = random.Random(416001)
    rows = {k: [list(r) for r in v] for k, v in fx.SEED.items()}
    cols = {t: [c.split()[0] for c in fx.SCHEMAS[t].split(",")] for t in fx.SCHEMAS}

    def payload(t, r):
        return {c: (str(v) if isinstance(v, Decimal) else v)
                for c, v in zip(cols[t], r)}

    fx.register(spark, str(tmp_path / "tables"),
                {k: [tuple(r) for r in v] for k, v in rows.items()})
    sink = InMemorySink()
    view = ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses")
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    targeted_batches = 0
    lsn = 100
    next_e = 10

    for b in range(12):
        records = []
        for _ in range(rng.randrange(1, 4)):
            roll = rng.random()
            if roll < 0.25:  # person rename (to-one fan-out, both hops)
                r = rng.choice(rows["person"])
                old = list(r)
                r[1] = f"{r[1]}~{b}"
                records.append((lsn, "person", "UPDATE", r[0],
                                payload("person", r), payload("person", old)))
            elif roll < 0.40:  # course re-point teacher / rename
                r = rng.choice(rows["course"])
                old = list(r)
                if rng.random() < 0.5:
                    r[3] = rng.choice(["t-1", "t-2"])
                else:
                    r[1] = f"{r[1]}!"
                records.append((lsn, "course", "UPDATE", r[0],
                                payload("course", r), payload("course", old)))
            elif roll < 0.60 and rows["enrollment"]:  # enrollment re-point
                r = rng.choice(rows["enrollment"])
                old = list(r)
                r[2] = rng.choice([c[0] for c in rows["course"]])
                drop_before = rng.random() < 0.25
                records.append((lsn, "enrollment", "UPDATE", r[0],
                                payload("enrollment", r),
                                None if drop_before else payload("enrollment", old)))
            elif roll < 0.75:  # enrollment insert
                r = [f"e-n{next_e}", rng.choice(["s-1", "s-2"]),
                     rng.choice([c[0] for c in rows["course"]]), Decimal("3.00")]
                next_e += 1
                rows["enrollment"].append(r)
                records.append((lsn, "enrollment", "INSERT", r[0],
                                payload("enrollment", r), None))
            elif roll < 0.90 and len(rows["enrollment"]) > 1:  # enrollment delete
                i = rng.randrange(len(rows["enrollment"]))
                old = rows["enrollment"].pop(i)
                records.append((lsn, "enrollment", "DELETE", old[0],
                                None, payload("enrollment", old)))
            else:  # student re-point person
                r = rng.choice(rows["student"])
                old = list(r)
                r[1] = rng.choice(["p-1", "p-2"])
                records.append((lsn, "student", "UPDATE", r[0],
                                payload("student", r), payload("student", old)))
            lsn += 1
        fx.register(spark, str(tmp_path / "tables"),
                    {k: [tuple(r) for r in v] for k, v in rows.items()})
        eng.process_cdc_batch(_cdc(spark, records), epoch_id=b)
        if eng.last_stats["course_mv"].get("targeted"):
            targeted_batches += 1
        _assert_full_parity(spark, eng, sink)

    assert targeted_batches >= 6, f"only {targeted_batches} targeted batches"


# ------------------------------------------------- main-FROM join chains

JOIN_MV_SQL = """select course.id,
  json_build_object('name', course.name, 'salary', teacher.salary,
    'tname', (select name from person where person.id = teacher.person_id)) as doc
from course join teacher on course.teacher_id = teacher.id"""


def test_parses_main_from_join_chain():
    t = parse_correlation_tree(JOIN_MV_SQL)
    assert t is not None and t.parent_table == "course"
    assert t.tables() == {"course", "teacher", "person"}
    edges = {(n.table, n.sub_col,
              n.outer.table if n.outer else "course", n.outer_col)
             for n in t.nodes}
    assert edges == {
        ("teacher", "id", "course", "teacher_id"),
        ("person", "id", "teacher", "person_id"),
    }


def test_join_chain_shapes_bail():
    for bad in [
        # fan-out main join: dim-side column is not the dim's id
        "select o.id, 1 from orders o join line l on l.order_id = o.id",
        # unqualified subquery outer ref with several root relations
        "select o.id, (select v from d where d.id = did) from orders o "
        "join customer c on o.cust_id = c.id",
        # duplicate root-level name
        "select o.id, 1 from orders o join customer o on o.cust_id = o.id",
        # non-to-one join kinds
        "select o.id, 1 from orders o right join customer c on o.cust_id = c.id",
        "select o.id, 1 from orders o cross join customer c",
    ]:
        assert parse_correlation_tree(bad) is None, bad


def test_join_chain_engine_targets_through_dim(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    view = ViewDef("course_join_mv", sql=JOIN_MV_SQL, index="cj")
    assert view.affected_rows_keys is not None
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert sink.get("cj", "c-1")["tname"] == "Prof Georgios"

    n0 = len(sink.action_log)
    # p-3 → teacher t-1 → courses c-1, c-2 (through the JOINED dim)
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-3", "Prof Geo") if r[0] == "p-3" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", "p-3", None, None)]))
    assert eng.last_stats["course_join_mv"]["targeted"] == 1
    assert {k for (_, op, k) in sink.action_log[n0:]} == {"c-1", "c-2"}
    assert sink.get("cj", "c-1")["tname"] == "Prof Geo"

    # teacher change targets its courses
    n1 = len(sink.action_log)
    from decimal import Decimal
    rows["teacher"] = [("t-2", "p-4", Decimal("120000.00")) if r[0] == "t-2" else r
                       for r in rows["teacher"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(2, "teacher", "UPDATE", "t-2", None, None)]))
    assert {k for (_, op, k) in sink.action_log[n1:]} == {"c-3"}
    assert sink.get("cj", "c-3")["salary"] == 120000.0


def test_update_missing_after_image_fk_resolves_live(spark, tmp_path):
    """An UPDATE whose CDC payload omits the fk column (fk_new null —
    payloads often omit unchanged columns) while the before-image
    carries it must still reach the row's CURRENT parent via the live
    table, not just the parent it left (r5 ADVICE)."""
    fx.register(spark, str(tmp_path / "tables"))
    hook = derive_affected_rows_keys(fx.COURSE_MV_SQL)
    # live e-5 points at c-3; the (fabricated) before-image says c-2
    rows = _cdc(spark, [
        (1, "enrollment", "UPDATE", "e-5",
         {"id": "e-5", "grade": "2.00"},
         {"id": "e-5", "student_id": "s-1", "course_id": "c-2", "grade": "3.50"}),
    ])
    out = hook(spark, rows)
    assert out is not None
    got = {r[0] for r in out.collect()}
    assert {"c-2", "c-3"} <= got


def test_valid_retries_after_catalog_registration(spark):
    """A transient catalog failure (first CDC batch arriving before the
    tables are registered) must not permanently disable targeted
    refresh: only the True verdict is cached (r5 ADVICE)."""
    hook = derive_affected_rows_keys(
        "select id, (select w from vr_b where vr_b.id = bref) as d from vr_a"
    )
    rows = spark.createDataFrame(
        [(1, "public", "vr_b", "UPDATE", "b1", None, None)], CDC_FULL
    )
    assert hook(spark, rows) is None  # tables not registered yet
    spark.createDataFrame([("a1", "b1", "x")], "id string, bref string, v string") \
        .createOrReplaceTempView("vr_a")
    spark.createDataFrame([("b1", "y")], "id string, w string") \
        .createOrReplaceTempView("vr_b")
    out = hook(spark, rows)
    assert out is not None and {r[0] for r in out.collect()} == {"a1"}
