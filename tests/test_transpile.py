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


def test_paren_expression_cast():
    out = transpile("select (a || b)::text from t")
    assert "CAST((a || b) AS STRING)" in out


def test_function_call_cast():
    out = transpile("select sum(x)::float8 from t")
    assert "CAST(sum(x) AS DOUBLE)" in out


def test_json_arrow_operators(spark):
    out = transpile("select doc->>'name' as n, doc->'a'->>'b' as ab, doc->0 as first from t")
    assert "get_json_object(doc, '$.name') as n" in out
    assert "get_json_object(get_json_object(doc, '$.a'), '$.b') as ab" in out
    assert "get_json_object(doc, '$[0]') as first" in out
    # semantics: execute the transpiled projection on a real JSON doc
    spark.createDataFrame(
        [('{"name": "x", "a": {"b": "deep"}}',)], "doc string"
    ).createOrReplaceTempView("t")
    row = spark.sql(transpile("select doc->>'name' as n, doc->'a'->>'b' as ab from t")).first()
    assert row["n"] == "x" and row["ab"] == "deep"


def test_regex_match_operators(spark):
    out = transpile("select * from t where name ~ '^ab' and name !~* 'zz$'")
    assert "name RLIKE '^ab'" in out
    assert "NOT name RLIKE '(?i)zz$'" in out
    spark.createDataFrame([("abc",), ("xyz",)], "name string").createOrReplaceTempView("t")
    got = {r["name"] for r in spark.sql(transpile("select name from t where name ~ '^ab'")).collect()}
    assert got == {"abc"}


def test_string_agg_with_order(spark):
    out = transpile("select string_agg(n, ',' order by n desc) as s from t")
    assert "listagg(n, ',') WITHIN GROUP (ORDER BY n desc)" in out
    spark.createDataFrame([("a",), ("c",), ("b",)], "n string").createOrReplaceTempView("t")
    assert spark.sql(transpile("select string_agg(n, ',' order by n) as s from t")).first()["s"] == "a,b,c"


def test_extract_epoch(spark):
    out = transpile("select extract(epoch from ts) as e from t")
    assert "unix_timestamp(ts) as e" in out
    # calendar fields pass through untouched
    assert "extract(year from ts)" in transpile("select extract(year from ts) from t")


def test_jsonb_array_elements_text(spark):
    out = transpile("select id, e from t, jsonb_array_elements_text(tags) as e")
    assert "LATERAL VIEW explode(from_json(tags, 'array<string>')) AS e" in out
    spark.createDataFrame([(1, '["x", "y"]')], "id long, tags string").createOrReplaceTempView("t")
    got = sorted(r["e"] for r in spark.sql(transpile("select id, e from t, jsonb_array_elements_text(tags) as e")).collect())
    assert got == ["x", "y"]
