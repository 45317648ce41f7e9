"""Postgres→Spark SQL dialect fixups for view definitions.

The reference hands user SQL straight to Postgres (sinker.py:96-98, :129);
our engine hands it to Spark SQL, which shares most of the surface. This
module rewrites the Postgres-isms observed in the reference's fixtures and
tests (SURVEY.md §2 Table B) into Spark SQL:

- ``json_build_object('k', v, …)`` → ``named_struct('k', v, …)``
  (person_mv.sql:2-3, course_mv.sql:2-25)
- ``json_agg(x)``  → ``sort_array(collect_list(x))``
- ``array_agg(x)`` → ``sort_array(collect_list(x))``
  (PG emits unspecified scan order — the reference's own golden test and
  README disagree on it, SURVEY.md §5 — so we *define* array order as
  ascending element order; deterministic under any partitioning.)
- ``FROM unnest(arr) AS x``       → ``FROM (SELECT explode(arr) AS x)``
- ``jsonb_each_text(m) AS kv(k,v)`` → explode of ``from_json`` map
- ``expr::type``                  → ``CAST(expr AS type)`` (tight binding)
- ``now()``                       → ``current_timestamp()``
- ``"quoted identifiers"``        → `` `backticked` ``
- ``DISTINCT ON (keys) … ORDER BY o`` → row_number() window rewrite

This is a pragmatic text-level transpiler covering the reference corpus
(validated in tests/test_transpile.py and the school-schema golden e2e);
it is not a full PG grammar — unsupported constructs pass through to
Spark's parser, which errors loudly rather than silently misexecuting.
"""

from __future__ import annotations

import re


def _replace_quoted_idents(sql: str) -> str:
    out, i, n = [], 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literal (with '' escapes)
            j = i + 1
            while j < n:
                if sql[j] == "'" and (j + 1 >= n or sql[j + 1] != "'"):
                    break
                j += 2 if sql[j] == "'" else 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif c == '"':
            j = sql.index('"', i + 1)
            out.append(f"`{sql[i + 1 : j]}`")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


# Postgres type names → Spark SQL types (used in :: casts)
_PG_TYPES = {
    "text": "STRING", "varchar": "STRING", "char": "STRING", "bpchar": "STRING",
    "int2": "SMALLINT", "int4": "INT", "int8": "BIGINT", "serial": "INT",
    "bigserial": "BIGINT", "float4": "FLOAT", "float8": "DOUBLE",
    "real": "FLOAT", "bool": "BOOLEAN", "timestamptz": "TIMESTAMP",
    "json": "STRING", "jsonb": "STRING", "uuid": "STRING", "bytea": "BINARY",
}


def _rewrite_pg_casts(sql: str) -> str:
    # expr::type — rewrite the tight-binding cases seen in practice:
    # identifier/literal/closing-paren followed by ::type
    pat = re.compile(r"(\`[^`]+\`|\w+|\))\s*::\s*([A-Za-z_][\w ]*?)(?=[\s,()\[\]]|$)")

    def sub(m: re.Match) -> str:
        t = m.group(2).strip()
        t = _PG_TYPES.get(t.lower(), t)
        return f"CAST({m.group(1)} AS {t})"

    prev = None
    while prev != sql:
        prev = sql
        sql = pat.sub(sub, sql, count=1)
    return sql


def _find_call(sql: str, fname: str) -> tuple[int, int, str] | None:
    """Find fname( … ) returning (start, end_exclusive, args_text)."""
    m = re.search(rf"\b{fname}\s*\(", sql, re.IGNORECASE)
    if not m:
        return None
    depth, i = 0, m.end() - 1
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return m.start(), i + 1, sql[m.end() : i]
        elif sql[i] == "'":
            i = sql.index("'", i + 1)
        i += 1
    return None


def _rename_calls(sql: str, mapping: dict[str, str]) -> str:
    for src, dst in mapping.items():
        sql = re.sub(rf"\b{src}\s*\(", dst + "(", sql, flags=re.IGNORECASE)
    return sql


def _wrap_calls(sql: str, fname: str, prefix: str, suffix: str) -> str:
    """fname(args) → prefix fname(args) suffix, repeatedly."""
    out = sql
    offset = 0
    while True:
        found = _find_call(out[offset:], fname)
        if not found:
            return out
        s, e, _args = found
        s, e = s + offset, e + offset
        out = out[:s] + prefix + out[s:e] + suffix + out[e:]
        offset = e + len(prefix) + len(suffix)


def _rewrite_unnest_from(sql: str) -> str:
    # FROM unnest(x) AS alias  /  , unnest(x) AS alias
    pat = re.compile(r"\b(from|,)\s*unnest\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        call = _find_call(sql[m.start():], "unnest")
        assert call is not None
        s, e, args = call
        s, e = s + m.start(), e + m.start()
        after = sql[e:]
        am = re.match(r"\s*(?:as\s+)?(`[^`]+`|\w+)", after, re.IGNORECASE)
        alias = am.group(1) if am else "col"
        rest = after[am.end():] if am else after
        lead = sql[m.start() : m.start() + len(m.group(1))]
        sql = (
            sql[: m.start()]
            + f"{lead} (SELECT explode({args}) AS {alias}) {alias}_t"
            + rest
        )


def _rewrite_jsonb_each_text(sql: str) -> str:
    # , jsonb_each_text(m) AS kv(k, v)  →  lateral view of exploded map
    pat = re.compile(
        r",\s*jsonb_each_text\s*\(([^)]*)\)\s*(?:as\s+)?(\w+)\s*\((\w+)\s*,\s*(\w+)\)",
        re.IGNORECASE,
    )

    def sub(m: re.Match) -> str:
        src, _alias, k, v = m.groups()
        return f" LATERAL VIEW explode(from_json({src}, 'map<string,string>')) AS {k}, {v}"

    return pat.sub(sub, sql)


def _rewrite_distinct_on(sql: str) -> str:
    """SELECT DISTINCT ON (k1, k2) <select-list> FROM … [ORDER BY o] →
    row_number() OVER (PARTITION BY keys ORDER BY o-or-keys) = 1."""
    m = re.search(r"select\s+distinct\s+on\s*\(", sql, re.IGNORECASE)
    if not m:
        return sql
    call = _find_call(sql[m.start():], r"on")
    assert call is not None
    keys = call[2]
    body_start = m.start() + call[1]
    body = sql[body_start:]
    om = re.search(r"\border\s+by\s+(.*)$", body, re.IGNORECASE | re.DOTALL)
    if om:
        order = om.group(1).strip().rstrip(";")
        body = body[: om.start()]
    else:
        order = keys
    inner = f"SELECT {body.strip()} , row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS __rn "
    return sql[: m.start()] + f"SELECT * FROM ({inner}) __d WHERE __rn = 1"


# --- nested-subquery decorrelation ("decorrelation lite") -----------------
#
# Catalyst rejects a correlated scalar subquery nested inside another
# correlated subquery ("Unexpected operator ... in correlated subquery
# below filter"). Postgres executes these per-row (course_mv.sql:3-8
# nests person-of-teacher inside teacher-of-course). We rewrite bottom-up:
# an inner lookup subquery
#
#     (SELECT <expr> FROM <rel> WHERE <cond>)
#
# nested in an enclosing subquery  (SELECT P FROM F WHERE W)  becomes a
# LEFT JOIN:  (SELECT P[<expr>/subq] FROM F LEFT JOIN <rel> ON <cond>
# WHERE W). To-one semantics are preserved because the lookup key is the
# referenced table's unique id (the engine-wide key-uniqueness invariant,
# reference query_templates.py:12). After the pass, only single-level
# correlated subqueries remain — which Catalyst decorrelates natively
# into joins/aggregates. The result is also the *faster* plan: per-row
# nested lookups become hash joins.


def _subquery_spans(sql: str) -> list[tuple[int, int]]:
    """Spans of every parenthesized SELECT, outermost to innermost."""
    spans = []
    for m in re.finditer(r"\(\s*select\b", sql, re.IGNORECASE):
        depth, i = 0, m.start()
        while i < len(sql):
            c = sql[i]
            if c == "'":
                i = sql.index("'", i + 1)
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    spans.append((m.start(), i + 1))
                    break
            i += 1
    return spans


def _split_subquery(body: str) -> tuple[str, str, str] | None:
    """'select E from F [where W]' → (E, F, W) split at top paren level."""
    depth = 0
    low = body.lower()
    m = re.match(r"\s*select\s+", body, re.IGNORECASE)
    if not m:
        return None
    i = m.end()
    from_i = where_i = None
    while i < len(body):
        c = body[i]
        if c == "'":
            i = body.index("'", i + 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            if from_i is None and re.match(r"\bfrom\b", low[i:]):
                from_i = i
            elif from_i is not None and where_i is None and re.match(r"\bwhere\b", low[i:]):
                where_i = i
        i += 1
    if from_i is None:
        return None
    expr = body[m.end():from_i].strip()
    if where_i is None:
        return expr, body[from_i + 4:].strip(), ""
    return expr, body[from_i + 4 : where_i].strip(), body[where_i + 5 :].strip()


def _decorrelate_nested(sql: str) -> str:
    """Inline lookup subqueries nested inside other subqueries as joins."""
    for _ in range(20):  # bounded fixpoint
        spans = _subquery_spans(sql)
        # find an inner subquery strictly inside another subquery, itself
        # containing no further subquery
        target = None
        for (s, e) in spans:
            inside = any(ps < s and e <= pe for ps, pe in spans if (ps, pe) != (s, e))
            has_child = any(s < cs and ce <= e for cs, ce in spans if (cs, ce) != (s, e))
            if inside and not has_child:
                target = (s, e)
                break
        if target is None:
            return sql
        s, e = target
        parent = None
        for (ps, pe) in spans:
            if ps < s and e <= pe and (parent is None or ps > parent[0]):
                parent = (ps, pe)
        inner = _split_subquery(sql[s + 1 : e - 1])
        outer = _split_subquery(sql[parent[0] + 1 : parent[1] - 1])
        if inner is None or outer is None or not inner[2]:
            return sql  # not the lookup pattern; leave for Spark to judge
        i_expr, i_from, i_where = inner
        o_expr_from_where = sql[parent[0] + 1 : parent[1] - 1]
        # replace inner subquery text with its projection expression
        rel_s, rel_e = s - (parent[0] + 1), e - (parent[0] + 1)
        new_projection_body = o_expr_from_where[:rel_s] + i_expr + o_expr_from_where[rel_e:]
        o2 = _split_subquery(new_projection_body)
        if o2 is None:
            return sql
        o_expr, o_from, o_where = o2
        # split the inner FROM into base relation + its own trailing joins
        # so the correlation ON attaches to the base: A LEFT JOIN base ON
        # corr LEFT JOIN x ON ... (flat join list, no nested-join grouping)
        jm = re.search(r"\b(left|right|full|inner|cross|join)\b", i_from, re.IGNORECASE)
        if jm:
            base, trailing = i_from[: jm.start()].strip(), i_from[jm.start():].strip()
            joined_from = f"{o_from} LEFT JOIN {base} ON {i_where} {trailing}"
        else:
            joined_from = f"{o_from} LEFT JOIN {i_from} ON {i_where}"
        rebuilt = f"(SELECT {o_expr} FROM {joined_from}" + (f" WHERE {o_where}" if o_where else "") + ")"
        sql = sql[: parent[0]] + rebuilt + sql[parent[1]:]
    return sql


def transpile(sql: str) -> str:
    """Postgres view SQL → Spark SQL."""
    sql = sql.strip().rstrip(";")
    sql = _replace_quoted_idents(sql)
    sql = _rewrite_pg_casts(sql)
    sql = _rewrite_distinct_on(sql)
    sql = _rewrite_jsonb_each_text(sql)
    sql = _rewrite_unnest_from(sql)
    sql = _rename_calls(sql, {"json_build_object": "named_struct", "now": "current_timestamp"})
    for agg in ("json_agg", "array_agg"):
        sql = _wrap_calls(sql, agg, "sort_array(", ")")
    sql = _rename_calls(sql, {"json_agg": "collect_list", "array_agg": "collect_list"})
    sql = _decorrelate_nested(sql)
    return sql
