"""School-schema fixtures mirroring the reference's e2e corpus
(/root/reference/tests/fixtures/schema.sql seed rows, FIXTURES.md §1) and
the two view definitions (person_mv.sql:1-4, course_mv.sql:1-26 shapes).

Tables are written to parquet and registered as temp views; mutation
helpers re-register mutated versions, emulating source-table DML with
FK ON DELETE CASCADE semantics computed here (Spark enforces nothing —
the e2e asserts the cascade is *observed through recompute*, SURVEY §2 B24).
"""

from __future__ import annotations

from decimal import Decimal

SCHEMAS = {
    "person": "id string, name string",
    "student": "id string, person_id string, is_active boolean, gpa decimal(3,2)",
    "teacher": "id string, person_id string, salary decimal(10,2)",
    "course": "id string, name string, description string, teacher_id string",
    "enrollment": "id string, student_id string, course_id string, grade decimal(3,2)",
}

SEED = {
    "person": [("p-1", "John"), ("p-2", "Loren"), ("p-3", "Prof Georgios"), ("p-4", "Prof Matt")],
    "student": [("s-1", "p-1", True, Decimal("3.01")), ("s-2", "p-2", True, Decimal("3.99"))],
    "teacher": [("t-1", "p-3", Decimal("100000.00")), ("t-2", "p-4", Decimal("100000.00"))],
    "course": [
        ("c-1", "Reth", "How to build a modern Ethereum node", "t-1"),
        ("c-2", "ZK Proofs", "Sometimes zero knowledge is more than enough", "t-1"),
        ("c-3", "Bizchain", "How to build a business on-chain", "t-2"),
    ],
    "enrollment": [
        ("e-1", "s-1", "c-1", Decimal("3.50")),
        ("e-2", "s-2", "c-1", Decimal("3.14")),
        ("e-3", "s-1", "c-2", Decimal("3.50")),
        ("e-4", "s-2", "c-2", Decimal("3.14")),
        ("e-5", "s-1", "c-3", Decimal("3.50")),
    ],
}

PERSON_MV_SQL = 'select id, json_build_object(\'name\', "name") as "person" from "person"'

COURSE_MV_SQL = """select id,
  json_build_object('name', "name", 'description', "description",
    'teacher', (select json_build_object('salary', "salary",
                  'person', (select json_build_object('name', "name") from person where person.id = person_id))
                from teacher where teacher.id = teacher_id),
    'enrollments', (select json_agg(json_build_object('grade', "grade",
                      'student', (select json_build_object('gpa', "gpa",
                                    'person', (select json_build_object('name', "name") from person where person.id = person_id))
                                  from student where student.id = student_id)))
                    from enrollment where enrollment.course_id = course.id)) as "course"
from "course" """


def register(spark, tmpdir: str, rows: dict | None = None) -> None:
    rows = rows or SEED
    for name, schema in SCHEMAS.items():
        df = spark.createDataFrame(rows[name], schema)
        df.write.mode("overwrite").parquet(f"{tmpdir}/{name}")
        spark.read.parquet(f"{tmpdir}/{name}").createOrReplaceTempView(name)


def cascade_delete_person(rows: dict, person_id: str) -> dict:
    """FK ON DELETE CASCADE closure for deleting a person
    (schema.sql:28-29,44-45,61-62,80-83)."""
    out = {k: list(v) for k, v in rows.items()}
    out["person"] = [r for r in out["person"] if r[0] != person_id]
    dead_students = {r[0] for r in out["student"] if r[1] == person_id}
    dead_teachers = {r[0] for r in out["teacher"] if r[1] == person_id}
    out["student"] = [r for r in out["student"] if r[1] != person_id]
    out["teacher"] = [r for r in out["teacher"] if r[1] != person_id]
    dead_courses = {r[0] for r in out["course"] if r[3] in dead_teachers}
    out["course"] = [r for r in out["course"] if r[3] not in dead_teachers]
    out["enrollment"] = [
        r for r in out["enrollment"] if r[1] not in dead_students and r[2] not in dead_courses
    ]
    return out


GOLDEN_C1 = {
    "name": "Reth",
    "description": "How to build a modern Ethereum node",
    "teacher": {"salary": 100000.0, "person": {"name": "Prof Georgios"}},
    # NOTE: enrollment array order — the reference's own artifacts disagree
    # (test_e2e.py:77-95 insertion order vs README.md:39-58 the reverse; PG
    # scan order is unspecified). Our engine DEFINES array order as
    # ascending element order (sort_array), hence 3.14 before 3.5.
    "enrollments": [
        {"grade": 3.14, "student": {"gpa": 3.99, "person": {"name": "Loren"}}},
        {"grade": 3.5, "student": {"gpa": 3.01, "person": {"name": "John"}}},
    ],
}
