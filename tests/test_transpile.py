"""Unit tests for the Postgres→Spark transpiler (compiler/transpile.py)."""

from __future__ import annotations

from sinker_spark.compiler.transpile import transpile


def test_quoted_identifiers_and_strings():
    out = transpile("""select "name", 'it''s' as s from "Person";""")
    assert "`name`" in out and "`Person`" in out
    assert "'it''s'" in out  # string literals untouched
    assert not out.endswith(";")


def test_json_build_object_and_aggs():
    out = transpile("select json_build_object('a', x), json_agg(y), array_agg(z) from t")
    assert "named_struct('a', x)" in out
    assert "sort_array(collect_list(y))" in out
    assert "sort_array(collect_list(z))" in out


def test_pg_cast_and_now():
    out = transpile("select x::int, now() from t")
    assert "CAST(x AS int)" in out
    assert "current_timestamp()" in out


def test_pg_type_names_mapped():
    out = transpile("select a::text, b::int8, c::float8, d::jsonb, e::timestamptz from t")
    assert "CAST(a AS STRING)" in out
    assert "CAST(b AS BIGINT)" in out
    assert "CAST(c AS DOUBLE)" in out
    assert "CAST(d AS STRING)" in out
    assert "CAST(e AS TIMESTAMP)" in out


def test_unnest_in_from():
    out = transpile("select email from unnest(emails) as email")
    assert "explode(emails) AS email" in out.replace("  ", " ")


def test_jsonb_each_text_lateral():
    out = transpile('select id, key, value from "googleEvents", jsonb_each_text(attendees) as kv(key, value)')
    assert "LATERAL VIEW explode(from_json(attendees, 'map<string,string>')) AS key, value" in out


def test_distinct_on_rewrite():
    out = transpile("SELECT DISTINCT ON (a) a, b FROM t ORDER BY a, b DESC")
    low = out.lower()
    assert "row_number() over (partition by a order by a, b desc" in low
    assert "__rn = 1" in out


def test_nested_correlated_subquery_decorrelation():
    sql = """select id, json_build_object('x',
        (select json_build_object('s', salary,
            'p', (select json_build_object('n', name) from person where person.id = person_id))
         from teacher where teacher.id = teacher_id)) as doc
    from course"""
    out = transpile(sql)
    # the inner person lookup became a LEFT JOIN inside the teacher subquery
    assert "LEFT JOIN person ON person.id = person_id" in out
    assert out.count("(select") + out.count("(SELECT") == 1  # one level remains
