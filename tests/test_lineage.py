"""Behavior parity with the reference's parse_schema_tables
(tests/test_parse_schema_tables.py:1-98) — same four query shapes, same
expected lineage, without sqlglot."""

from __future__ import annotations

import pytest

from sinker_spark.compiler.lineage import parse_schema_tables


def test_arrays_unnest_and_correlated_subqueries():
    q = """select id,
       json_build_object(
               'name', "name",
               'otherEmailDomains',(select array_agg(split_part(email, '@', 2)) FROM unnest(emails) as email),
               'emailDomains', (select array_agg(split_part(value, '@', 2))
                    from "EmailAddress" EA where "personId"="Person".id),
               'emailAddresses', (select array_agg(value) from "EmailAddress" EA where "personId"="Person".id),
               ) as "person"
        from "person"
        """
    parent, tables = parse_schema_tables(q)
    assert parent == "person"
    assert tables == {"EmailAddress", "person"}


def test_cte_join_group_by_distinct_on():
    q = """
        WITH
        attendees AS (
            SELECT DISTINCT ON (a."personId", a."hostedEventId")
                a."hostedEventId", a.status, e.value as email, p."primaryOrganizationId"
            FROM "HostedEventAttendance" a
            JOIN "Person" p ON a."personId" = p.id
            JOIN "EmailAddress" e ON p.id = e."personId"
            GROUP BY a."personId", a."hostedEventId", a.status, e.value, p."primaryOrganizationId"
        )
        SELECT id,
            json_build_object(
                'summary', "name",
                'attendees', (
                    SELECT json_agg(json_build_object('email', attendees.email, 'eventResponse', attendees.status))
                    FROM attendees WHERE attendees."hostedEventId" = "HostedEvent".id
                ),
                'organizationIds', (
                    SELECT array_agg(attendees."primaryOrganizationId")
                    FROM attendees WHERE attendees."hostedEventId" = "HostedEvent".id
                )
            ) AS "hosted_events"
        FROM "HostedEvent"
    """
    parent, tables = parse_schema_tables(q)
    assert parent == "HostedEvent"
    assert tables == {"EmailAddress", "HostedEvent", "HostedEventAttendance", "Person"}


def test_lateral_function_call_and_schema_qualified():
    q = """
        select id,
               json_build_object(
                       'summary', "summary",
                       'attendees', (select json_agg(json_build_object('email', key, 'eventResponse', value))
                                     from (select id, key, value
                                           from "googleEvents",
                                               jsonb_each_text(attendees) as kv(key, value)) as subquery
                                     where id = "googleEvents".id),
                       'organizationIds', (select array_agg("_NotesToOrganization"."B")
                                           from "_NotesToOrganization"
                                                    left join public."Notes" N on "_NotesToOrganization"."A" = N.id
                                           where "googleEventId" = "googleEvents".id)
               ) as "google_events"
        from "googleEvents";
    """
    parent, tables = parse_schema_tables(q)
    assert parent == "googleEvents"
    assert tables == {"googleEvents", "_NotesToOrganization", "Notes"}


def test_no_table_raises():
    with pytest.raises(ValueError, match="No table found in the query"):
        parse_schema_tables("select 1")


def test_simple_view():
    parent, tables = parse_schema_tables(
        'select id, json_build_object(\'name\', "name") as "person" from "person"'
    )
    assert parent == "person" and tables == {"person"}


def test_function_form_from_is_not_a_table_ref():
    """extract(year FROM ts) / substring(s FROM 2) / trim(... FROM s)
    spell FROM inside scalar function calls — their arguments must not
    become phantom deps (found by tools/fuzz_view_engine.py). A FROM
    opens a table list only in a block that has seen a SELECT."""
    from sinker_spark.compiler.lineage import parse_schema_tables

    p, t = parse_schema_tables(
        "SELECT l_linenumber FROM lineitem "
        "WHERE l_orderkey > CAST(extract(year FROM l_shipdate) AS BIGINT)"
    )
    assert (p, t) == ("lineitem", {"lineitem"})
    p, t = parse_schema_tables(
        "SELECT substring(name FROM 2), trim(both ' ' FROM name) FROM person"
    )
    assert (p, t) == ("person", {"person"})
    # genuine subqueries inside function args still count
    p, t = parse_schema_tables(
        "SELECT coalesce((SELECT max(ts) FROM events), now()) FROM person"
    )
    assert (p, t) == ("person", {"person", "events"})
