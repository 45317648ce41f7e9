"""Auto-derived targeted refresh for multi-table document views.

The reference's MV shape (tests/fixtures/course_mv.sql:1-26) is one
parent table whose document embeds CORRELATED SUBQUERIES — to-one
lookups (``(select … from teacher where teacher.id = teacher_id)``) and
to-many arrays (``(select json_agg(…) from enrollment where
enrollment.course_id = course.id)``), nested recursively. The reference
refreshes such views with a full ``REFRESH … CONCURRENTLY`` on every
change (sinker.py:60-66); the engine's targeted lane only needs the set
of AFFECTED PARENT IDS to restrict the recompute (views.compile_scoped →
SnapshotStore.refresh_partial).

This module derives that id set mechanically from the view SQL: it
parses the correlation tree (which table correlates to which through
which columns) and emits an ``affected_rows_keys`` hook that walks each
changed table's ids BACK to parent ids with semi-joins — the same
reverse-lineage walk a user would hand-write (tests/
test_targeted_refresh.py:21-66), with one soundness upgrade: to-many
child rows use the CDC payloads' fk values (new AND old images) so a
re-pointed or deleted child reaches the documents it LEFT as well. So
a reference user who drops ``course_mv.sql`` into the definitions dir
gets O(affected-docs) refresh on every table in the tree with zero
Python.

Soundness posture — the hook returns ``None`` (→ full recompute+diff,
always correct) instead of guessing whenever:

- the SQL shape is outside the recognized grammar (the parse fails and
  no hook is installed at all);
- the batch touches a table outside the correlation tree;
- a mutating (UPDATE/DELETE) row of a TO-MANY table carries no
  before-image fk — post-state lookups cannot see the parent a row was
  re-pointed away from or deleted out of (the exact stale-sink class
  the engine guards elsewhere; tests pin this gate);
- any changed to-many row yields no fk from payloads or the live table;
- the runtime schemas contradict the parse (a correlation column that
  should be outer-side also exists on the subquery table, or a parsed
  column is missing) — validated once per hook against the catalog.

Scale: every step is a semi-join of a base table against a batch-sized
id/fk frame (predicate-pushdown-friendly; nothing collected to the
driver), so the walk is O(referrers-of-changed-rows) per hop — the
live-table analog of the doc-tree lane's stored reverse indexes
(ivm_flagship), for views declared as plain SQL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sinker_spark.compiler.transpile import _literal_spans, _search_code

_IDENT = r'(?:"[^"]+"|[A-Za-z_]\w*)'
_KEYWORDS = {
    "select", "from", "where", "group", "order", "limit", "join", "on",
    "and", "or", "not", "as", "union", "intersect", "except", "having",
    "left", "right", "inner", "outer", "cross", "lateral", "natural",
}


def _norm(ident: str) -> str:
    ident = ident.strip()
    if ident.startswith('"') and ident.endswith('"'):
        return ident[1:-1]
    return ident.lower()


@dataclass
class _Rel:
    """One query block's single FROM relation."""

    table: str
    alias: str

    def names(self) -> set[str]:
        # PG scoping: an alias HIDES the table name for that relation
        # instance (``FROM course c2`` makes ``course.x`` an OUTER ref,
        # which is what lets a self-correlated block anchor on its own
        # table); unaliased relations answer to the table name
        return {self.alias} if self.alias != self.table else {self.table}


@dataclass(eq=False)
class CorrNode:
    """One correlated subquery: ``(SELECT … FROM table WHERE
    table.sub_col = <outer ref to outer.outer_col>)``. ``to_one`` iff
    sub_col is the subquery table's id column (the outer row CARRIES the
    fk); otherwise the subquery table carries the fk (to-many array).
    ``outer_qualified`` records whether the outer ref was written with a
    table qualifier — an UNQUALIFIED ref is validated against the
    runtime schema (PG binds innermost-scope first, so it must not also
    name a column of the subquery's own table)."""

    table: str
    alias: str
    sub_col: str
    outer: "CorrNode | None"  # None → correlates to the root query
    outer_col: str
    outer_qualified: bool = True
    children: list["CorrNode"] = field(default_factory=list)
    # non-correlation WHERE conjuncts of the block (raw PG text) — the
    # reference MVs filter children (``AND e.active``). They never
    # affect the reverse-lineage WALK (dropping a filter only widens
    # the affected set → sound over-approximation), but any consumer
    # SERVING rows from state must apply them or bail (ivm_doc_sql
    # validates each against the block's own schema and applies them)
    filters: list[str] = field(default_factory=list)
    # [start, end) of the block's ``(select …)`` text in the normalized
    # SQL (None for main-FROM join nodes) — lets the doc-template parser
    # (parse_doc_templates) find each block's select expression
    span: "tuple[int, int] | None" = None
    # main-FROM join nodes only: 'inner' (a missing dim row drops the
    # parent row from the view) or 'left' (NULL dim columns); None for
    # correlated-subquery nodes
    join_how: "str | None" = None

    def to_one(self, id_col: str) -> bool:
        return self.sub_col == id_col


@dataclass
class CorrelationTree:
    parent_table: str
    parent_alias: str
    id_col: str
    nodes: list[CorrNode]  # every node, any depth
    sql: str = ""          # normalized SQL the node spans index into
    n_root_joins: int = 0  # main-FROM join dims (span=None nodes)
    # root-block WHERE predicate text (no leading WHERE), or None. The
    # grammar allows it (_parse_root_from's tail); consumers that serve
    # documents from state (ivm_doc_sql) must apply it or bail — a view
    # with a root filter serves only the rows passing it.
    where_text: str | None = None

    def tables(self) -> set[str]:
        return {self.parent_table} | {n.table for n in self.nodes}


def _matching_paren(sql: str, open_idx: int) -> int:
    """Index of the ``)`` matching ``sql[open_idx] == '('`` (literal-aware);
    -1 if unbalanced."""
    spans = _literal_spans(sql)
    depth = 0
    i = open_idx
    n = len(sql)
    while i < n:
        if any(s <= i < e for s, e in spans):
            i += 1
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


_SUBQ_OPEN = re.compile(r"\(\s*select\b", re.IGNORECASE)


def _subquery_spans(sql: str) -> list[tuple[int, int]] | None:
    """[start, end) spans of every parenthesized SELECT; None if any is
    unbalanced."""
    spans: list[tuple[int, int]] = []
    pos = 0
    while True:
        m = _search_code(_SUBQ_OPEN, sql, pos)
        if not m:
            return spans
        close = _matching_paren(sql, m.start())
        if close < 0:
            return None
        spans.append((m.start(), close + 1))
        pos = m.start() + 1


def _own_text(sql: str, span: tuple[int, int], inner: list[tuple[int, int]]) -> str:
    """``sql[span]`` with every DIRECTLY nested subquery span blanked, so
    clause scans see only this query block's own tokens."""
    s, e = span
    out = list(sql[s:e])
    for cs, ce in inner:
        if s < cs and ce <= e:
            for i in range(cs - s, ce - s):
                if out[i] not in "()":
                    out[i] = " "
    return "".join(out)


_FROM_PAT = re.compile(rf"\bfrom\s+({_IDENT})(?:\s+(?:as\s+)?({_IDENT}))?", re.IGNORECASE)
_BAIL_PAT = re.compile(
    r"\bjoin\b|\bunion\b|\bintersect\b|\bexcept\b|\bgroup\s+by\b|\bwith\b",
    re.IGNORECASE,
)
# one WHERE conjunct that is a plain column equality (either side may be
# qualified) — the correlation-candidate shape
_CONJ_EQ = re.compile(
    rf"^(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*=\s*(?:({_IDENT})\s*\.\s*)?({_IDENT})$"
)
# keyword-valued "identifiers" that can appear on the right of an
# equality without being column references
_LITERAL_WORDS = {"true", "false", "null", "unknown"}
_BLOCK_TAIL_BAIL = re.compile(
    r"\border\s+by\b|\bgroup\s+by\b|\bhaving\b|\blimit\b|\boffset\b",
    re.IGNORECASE,
)


def _parse_block_where(
    body: str, rel: _Rel
) -> "tuple[str, str | None, str, bool, list[str]] | None":
    """Parse one subquery block's WHERE into (sub_col, outer_qual,
    outer_col, outer_qualified, filters): EXACTLY one conjunct must be a
    cross-scope equality between a column of ``rel`` (either side) and
    an outer reference; every other conjunct is recorded as a filter
    (raw text — consumers validate against schemas). None when no
    unambiguous correlation conjunct exists or the clause carries
    ORDER BY/LIMIT/… tails."""
    from sinker_spark.compiler.transpile import _split_conjuncts

    wm = _search_depth0(re.compile(r"\bwhere\b", re.IGNORECASE), body)
    if not wm:
        return None
    wtail = body[wm.end():]
    if _search_code(_BLOCK_TAIL_BAIL, wtail):
        return None
    corr: "tuple[str, str | None, str, bool] | None" = None
    filters: list[str] = []
    for conj in _split_conjuncts(wtail):
        m = _CONJ_EQ.match(conj)
        sides = None
        if m:
            q1, c1, q2, c2 = m.groups()
            s1 = (_norm(q1) if q1 else None, _norm(c1))
            s2 = (_norm(q2) if q2 else None, _norm(c2))
            own1 = s1[0] in rel.names() if s1[0] else False
            own2 = s2[0] in rel.names() if s2[0] else False
            if own1 != own2:
                own, other = (s1, s2) if own1 else (s2, s1)
                # a bare keyword-literal right side (``e.flag = true``)
                # is a filter, not a correlation
                if other[0] is not None or other[1] not in _LITERAL_WORDS:
                    sides = (own[1], other[0], other[1], other[0] is not None)
        if sides is None:
            filters.append(conj)
            continue
        if corr is not None:
            return None  # two cross-scope equalities: ambiguous edge
        corr = sides
    if corr is None:
        return None
    return corr[0], corr[1], corr[2], corr[3], filters


def _search_depth0(pat: re.Pattern, text: str) -> re.Match | None:
    """First match of ``pat`` at paren depth 0 of ``text`` (literal-aware)
    — so ``extract(epoch FROM ts)`` / ``substring(a FROM 1)`` inside a
    doc expression can't be mistaken for the block's table source."""
    spans = _literal_spans(text)
    depth, i, n = 0, 0, len(text)
    while i < n:
        if any(s <= i < e for s, e in spans):
            i += 1
            continue
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(text, i)
            if m:
                return m
        i += 1
    return None


def _parse_block_rel(own: str) -> _Rel | None:
    """The single FROM relation of one query block (no joins/commas).
    ``own`` must be the block's BODY (balanced inner parens, the block's
    own wrapping parens removed)."""
    m = _search_depth0(_FROM_PAT, own)
    if not m:
        return None
    alias = m.group(2)
    if alias is not None and _norm(alias) in _KEYWORDS:
        alias = None
    table = _norm(m.group(1))
    # a second FROM-position relation (comma) or any join → out of grammar
    tail = own[m.end():]
    if re.match(r"\s*,", tail):
        return None
    if _search_code(_BAIL_PAT, own):
        return None
    return _Rel(table, _norm(alias) if alias else table)


_JOIN_PAT = re.compile(
    rf"\s*(?:(left)\s+(?:outer\s+)?|inner\s+)?join\s+({_IDENT})"
    rf"(?:\s+(?:as\s+)?({_IDENT}))?\s+on\s+"
    rf"({_IDENT})\s*\.\s*({_IDENT})\s*=\s*({_IDENT})\s*\.\s*({_IDENT})",
    re.IGNORECASE,
)
_ROOT_BAIL_PAT = re.compile(
    r"\bunion\b|\bintersect\b|\bexcept\b|\bgroup\s+by\b|\bwith\b|"
    r"\b(?:right|full|cross|natural)\s+(?:outer\s+)?join\b",
    re.IGNORECASE,
)


def _parse_root_from(
    own: str, id_col: str
) -> tuple[_Rel, list[tuple[_Rel, str, str, str]]] | None:
    """Root FROM clause: one parent table followed by zero or more
    TO-ONE dim joins — ``[LEFT|INNER] JOIN dim [alias] ON a.x = b.y``
    where the dim-side column is the dim's id (a fan-out join would
    break the one-doc-per-parent-id key invariant, so anything else is
    out of grammar). Returns (parent rel, [(dim rel, prev-side
    qualifier, prev-side fk col, 'left'|'inner')] in join order)."""
    m = _search_depth0(_FROM_PAT, own)
    if not m:
        return None
    if _search_code(_ROOT_BAIL_PAT, own):
        return None
    alias = m.group(2)
    pos = m.end()
    if alias is not None and _norm(alias) in _KEYWORDS:
        # the "alias" was really the next clause keyword (`…from course
        # join…`): rewind so the join scan sees it
        pos = m.end(1)
        alias = None
    parent = _Rel(_norm(m.group(1)), _norm(alias) if alias else _norm(m.group(1)))
    joins: list[tuple[_Rel, str, str, str]] = []
    while True:
        jm = _JOIN_PAT.match(own, pos)
        if not jm:
            break
        how, tbl, jalias, q1, c1, q2, c2 = jm.groups()
        if jalias is not None and _norm(jalias) in _KEYWORDS:
            return None
        rel = _Rel(_norm(tbl), _norm(jalias) if jalias else _norm(tbl))
        sides = [(_norm(q1), _norm(c1)), (_norm(q2), _norm(c2))]
        dim_side = [s for s in sides if s[0] in rel.names()]
        prev_side = [s for s in sides if s[0] not in rel.names()]
        if len(dim_side) != 1 or len(prev_side) != 1:
            return None
        if dim_side[0][1] != id_col:
            return None  # fan-out join: not keyed one-per-parent-row
        joins.append(
            (rel, prev_side[0][0], prev_side[0][1], "left" if how else "inner")
        )
        pos = jm.end()
    tail = own[pos:]
    if re.match(r"\s*,", tail):
        return None
    if not re.match(r"\s*(where\b.*)?$", tail, re.IGNORECASE | re.DOTALL):
        return None
    return parent, joins


def parse_correlation_tree(sql: str, id_col: str = "id") -> CorrelationTree | None:
    """Parse the reference MV grammar: ``SELECT id, <doc-expr> FROM
    parent [WHERE …]`` where every subquery is a single-table correlated
    block whose WHERE holds exactly one cross-scope equality (either
    side order: ``sub.col = [outer.]col`` or ``[outer.]col = sub.col``)
    plus any number of FILTER conjuncts, recorded raw on
    ``CorrNode.filters``. Returns None (caller keeps full refresh)
    for anything else."""
    sql = sql.strip().rstrip(";")
    if re.match(r"\s*with\b", sql, re.IGNORECASE):
        return None
    spans = _subquery_spans(sql)
    if spans is None:
        return None

    def direct_inner(span: tuple[int, int]) -> list[tuple[int, int]]:
        s, e = span
        nested = [x for x in spans if s < x[0] and x[1] <= e and x != span]
        return [
            x for x in nested
            if not any(y[0] < x[0] and x[1] <= y[1] for y in nested)
        ]

    # --- root block -------------------------------------------------
    top = [x for x in spans if not any(y[0] < x[0] and x[1] <= y[1] for y in spans)]
    root_own = _own_text(sql, (0, len(sql)), top)
    parsed_root = _parse_root_from(root_own, id_col)
    if parsed_root is None:
        return None
    root_rel, root_joins = parsed_root
    # subqueries in the root WHERE clause (uncorrelated filters, EXISTS…)
    # are out of grammar: only the doc expression may carry them
    wm = _search_depth0(re.compile(r"\bwhere\b", re.IGNORECASE), root_own)
    if wm and any(s >= wm.start() for s, _ in top):
        return None
    # root WHERE predicate (positions in root_own == positions in sql:
    # _own_text is length-preserving, and the subquery-in-WHERE bail
    # above guarantees the clause text is verbatim in both)
    where_text = sql[wm.end():].strip() if wm else None
    if where_text == "":
        return None

    # main-FROM to-one join chain → one CorrNode per dim, linked to the
    # relation carrying the fk (the parent or an earlier join dim)
    nodes: list[CorrNode] = []
    root_level: dict[str, tuple[_Rel, CorrNode | None]] = {
        n: (root_rel, None) for n in root_rel.names()
    }
    for rel, prev_qual, prev_col, how in root_joins:
        if prev_qual not in root_level:
            return None
        _prev_rel, prev_node = root_level[prev_qual]
        node = CorrNode(rel.table, rel.alias, id_col, prev_node, prev_col,
                        outer_qualified=True, join_how=how)
        if prev_node is not None:
            prev_node.children.append(node)
        nodes.append(node)
        for n in rel.names():
            if n in root_level:
                return None  # duplicate alias/table name: ambiguous refs
            root_level[n] = (rel, node)

    # --- subquery blocks, outermost first ---------------------------
    by_span: dict[tuple[int, int], CorrNode] = {}
    rels: dict[tuple[int, int], _Rel] = {}
    for span in sorted(spans, key=lambda x: (x[0], -x[1])):
        inner = direct_inner(span)
        own = _own_text(sql, span, inner)
        body = own[1:-1].rstrip()  # inside the block's own parens
        rel = _parse_block_rel(body)
        if rel is None:
            return None
        # a subquery INSIDE the block's WHERE (EXISTS/IN/scalar filter)
        # is blanked in `body` — its conjunct text is unusable → bail
        bwm = _search_depth0(re.compile(r"\bwhere\b", re.IGNORECASE), body)
        if bwm and any(cs >= span[0] + 1 + bwm.start() for cs, _ce in inner):
            return None
        parsed_w = _parse_block_where(body, rel)
        if parsed_w is None:
            return None
        sub_col, outer_qual, outer_col, _oq, filters = parsed_w
        # resolve the outer side against enclosing blocks, nearest first
        enclosing = sorted(
            [x for x in spans if x[0] < span[0] and span[1] <= x[1]],
            key=lambda x: x[1] - x[0],  # smallest span first
        )
        outer_node: CorrNode | None = None
        outer_rel: _Rel | None = None
        if outer_qual is None:
            if enclosing:
                # unqualified → the IMMEDIATE enclosing block's relation
                outer_rel = rels[enclosing[0]]
                outer_node = by_span.get(enclosing[0])
            elif not root_joins:
                outer_rel, outer_node = root_rel, None
            else:
                # several root-level relations in scope: an unqualified
                # ref is ambiguous without schemas → out of grammar
                return None
        else:
            for enc in enclosing:
                if outer_qual in rels[enc].names():
                    outer_rel = rels[enc]
                    outer_node = by_span[enc]
                    break
            else:
                if outer_qual in root_level:
                    outer_rel, outer_node = root_level[outer_qual]
                else:
                    return None
        del outer_rel  # resolution only; climbing uses node identity
        node = CorrNode(
            rel.table, rel.alias, sub_col, outer_node, outer_col,
            outer_qualified=outer_qual is not None, span=span,
            filters=filters,
        )
        by_span[span] = node
        rels[span] = rel
        if outer_node is not None:
            outer_node.children.append(node)
        nodes.append(node)

    if not nodes:
        return None  # single-table views use the simpler id convention
    return CorrelationTree(
        root_rel.table, root_rel.alias, id_col, nodes,
        sql=sql, n_root_joins=len(root_joins), where_text=where_text,
    )


def derive_affected_rows_keys(sql: str, id_col: str = "id"):
    """→ an ``affected_rows_keys`` hook (spark, cdc_rows) → parent-id
    DataFrame | None, or None when the SQL is outside the grammar.

    ``cdc_rows`` is the raw CDC batch restricted to the view's deps
    (columns at least ``table``/``op``/``id``; ``payload``/
    ``payload_before`` used when present). See the module docstring for
    when the hook itself answers None."""
    tree = parse_correlation_tree(sql, id_col)
    if tree is None:
        return None

    from pyspark.sql import functions as F

    validated: dict[str, bool] = {}

    def _valid(spark) -> bool:
        """Schema sanity check: every parsed column exists on the side
        the parse assigned it to, and no to-one outer column is
        AMBIGUOUS (also a column of the subquery table — an unqualified
        ``teacher_id`` could then have bound to the wrong relation).
        Only a True verdict is cached: a transient catalog failure
        (first CDC batch arriving before table registration) must not
        permanently disable targeted refresh for the hook's lifetime."""
        if validated.get("ok"):
            return True

        def cols(t: str) -> set[str] | None:
            try:
                return {c.lower() for c in spark.table(t).columns}
            except Exception:
                return None

        ok = True
        pcols = cols(tree.parent_table)
        ok &= pcols is not None and id_col in pcols
        for n in tree.nodes:
            scols = cols(n.table)
            ocols = cols(n.outer.table if n.outer else tree.parent_table)
            if scols is None or ocols is None or id_col not in scols:
                ok = False
                break
            ok &= n.sub_col in scols and n.outer_col in ocols
            if not n.outer_qualified:
                # PG binds unqualified refs innermost-scope first: if the
                # column also exists on the subquery's own table the ref
                # bound THERE and our outer-edge parse is wrong
                ok &= n.outer_col not in scols
        if ok:
            validated["ok"] = True
        return bool(ok)

    def _sc(col: str) -> "F.Column":
        return F.col(col).cast("string")

    def _climb_rows(spark, node: CorrNode, rows):
        """``rows``: DataFrame of node.table rows → parent-id frame."""
        if node.to_one(id_col):
            ids = rows.select(_sc(id_col).alias("__cid")).distinct()
            return _climb_ids(spark, node, ids)
        vals = rows.select(_sc(node.sub_col).alias("__cv")).where(
            F.col("__cv").isNotNull()
        ).distinct()
        return _vals_to_parent(spark, node, vals)

    def _climb_ids(spark, node: CorrNode, ids):
        """``ids``: one-column ('__cid') id frame of node.table rows that
        changed or were reached — map through THIS node's correlation to
        parent ids. For to-one links the outer table is scanned by fk
        (robust to deleted sub rows); for to-many links the sub rows are
        live-looked-up (callers only pass live-reachable ids here)."""
        if node.to_one(id_col):
            outer_tbl = spark.table(node.outer.table if node.outer else tree.parent_table)
            outer_rows = outer_tbl.join(
                ids, _sc(node.outer_col) == F.col("__cid"), "left_semi"
            )
            if node.outer is None:
                return outer_rows.select(_sc(id_col).alias(id_col))
            return _climb_rows(spark, node.outer, outer_rows)
        sub_rows = spark.table(node.table).join(
            ids, _sc(id_col) == F.col("__cid"), "left_semi"
        )
        return _climb_rows(spark, node, sub_rows)

    def _vals_to_parent(spark, node: CorrNode, vals):
        """fk values of a to-many node ('__cv' frame of node.outer_col
        values) → parent ids."""
        if node.outer is None and node.outer_col == id_col:
            return vals.select(F.col("__cv").alias(id_col))
        outer_tbl = spark.table(node.outer.table if node.outer else tree.parent_table)
        outer_rows = outer_tbl.join(
            vals, _sc(node.outer_col) == F.col("__cv"), "left_semi"
        )
        if node.outer is None:
            return outer_rows.select(_sc(id_col).alias(id_col))
        return _climb_rows(spark, node.outer, outer_rows)

    def hook(spark, cdc_rows):
        tables = {r["table"] for r in cdc_rows.select("table").distinct().collect()}
        if not tables:
            return spark.createDataFrame([], f"{id_col} string")
        if not tables <= tree.tables():
            return None
        if not _valid(spark):
            return None
        has_payload = "payload" in cdc_rows.columns
        has_before = "payload_before" in cdc_rows.columns
        parts = []
        if tree.parent_table in tables:
            parts.append(
                cdc_rows.where(F.col("table") == tree.parent_table)
                .select(_sc("id").alias(id_col)).distinct()
            )
        for node in tree.nodes:
            if node.table not in tables:
                continue
            t_rows = cdc_rows.where(F.col("table") == node.table)
            if node.to_one(id_col):
                ids = t_rows.select(_sc("id").alias("__cid")).distinct()
                parts.append(_climb_ids(spark, node, ids))
                continue
            # to-many: fk values from BOTH payload images; mutating rows
            # without a before-image fk are unsound to target (the row
            # may have left a parent we cannot see) → full refresh
            fk_new = (
                F.get_json_object("payload", f"$.{node.sub_col}")
                if has_payload else F.lit(None).cast("string")
            )
            fk_old = (
                F.get_json_object("payload_before", f"$.{node.sub_col}")
                if has_before else F.lit(None).cast("string")
            )
            t_rows = t_rows.select(
                _sc("id").alias("__cid"), F.col("op"),
                fk_new.alias("__fk_new"), fk_old.alias("__fk_old"),
            )
            mutating = F.col("op").isin("UPDATE", "DELETE")
            if t_rows.where(mutating & F.col("__fk_old").isNull()).limit(1).count():
                return None
            vals = (
                t_rows.select(F.col("__fk_new").alias("__cv"))
                .unionByName(t_rows.select(F.col("__fk_old").alias("__cv")))
                .where(F.col("__cv").isNotNull()).distinct()
            )
            # Rows without an after-image fk resolve it from the live
            # table — covers payload-less INSERTs AND updates whose CDC
            # payload omits unchanged columns (the before-image alone
            # would miss the row's NEW parent when only non-fk columns
            # changed but the sink payload must still refresh). A
            # genuinely NULL live fk resolves to no parent and is
            # filtered below. Only a row visible NOWHERE (no payload fk
            # at all, no live row — an INSERT-then-gone) leaves an
            # unreachable parent → full refresh.
            uncovered = t_rows.where(
                (F.col("op") != "DELETE") & F.col("__fk_new").isNull()
            ).select("__cid").distinct()
            live = spark.table(node.table).join(
                uncovered, _sc(id_col) == F.col("__cid"), "inner"
            )
            both_null = t_rows.where(
                F.col("__fk_new").isNull() & F.col("__fk_old").isNull()
            ).select("__cid").distinct()
            if both_null.join(
                live.select(_sc(id_col).alias("__cid")), "__cid", "left_anti"
            ).limit(1).count():
                return None
            vals = vals.unionByName(
                live.select(_sc(node.sub_col).alias("__cv"))
                .where(F.col("__cv").isNotNull())
            ).distinct()
            parts.append(_vals_to_parent(spark, node, vals))
        if not parts:
            return spark.createDataFrame([], f"{id_col} string")
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        return acc.where(F.col(id_col).isNotNull()).distinct()

    hook.correlation_tree = tree  # for tests/introspection
    return hook


# ---------------------------------------------------------------------------
# Doc-template parsing — the json_build_object shape of each block, for
# deriving a fully-incremental doc-tree lane from the view SQL
# (sinker_spark/ivm_doc_sql.py builds the spec + nested serve from this).


@dataclass
class DocTemplate:
    """Ordered ``json_build_object`` entries of one query block:
    ``(json_key, ('col', column_name))`` for scalar projections of the
    block's own relation, ``(json_key, ('node', CorrNode))`` for a
    nested correlated block. To-many blocks may also carry:

    - ``order_text`` — the raw ``ORDER BY`` key list inside the block's
      ``json_agg`` (PG DECLARES element order there; consumers honor it
      or bail);
    - ``agg`` — ``(fname, col|None)`` when the block is a correlated
      SCALAR AGGREGATE (``(select count(*) from e where e.fk = id)``)
      instead of a json_agg array; entries is empty then."""

    entries: list
    order_text: "str | None" = None
    agg: "tuple[str, str | None] | None" = None
    # ``json_agg(DISTINCT json_build_object(…))`` — the serve dedups
    # identical element values exactly as the transpiled compile's
    # ``collect_list(DISTINCT …)`` does
    distinct: bool = False


def _split_ranges(sql: str, lo: int, hi: int) -> list[tuple[int, int]]:
    """Top-level comma-separated item ranges within ``sql[lo:hi]``
    (paren- and literal-aware), whitespace-stripped."""
    lits = _literal_spans(sql)
    out, depth, start = [], 0, lo
    i = lo
    while i < hi:
        if any(s <= i < e for s, e in lits):
            i += 1
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append((start, i))
            start = i + 1
        i += 1
    out.append((start, hi))

    def strip(r):
        s, e = r
        while s < e and sql[s].isspace():
            s += 1
        while e > s and sql[e - 1].isspace():
            e -= 1
        return (s, e)

    return [strip(r) for r in out]


_JBO_PAT = re.compile(r"json_build_object\s*\(", re.IGNORECASE)
_JAGG_PAT = re.compile(r"json_agg\s*\(", re.IGNORECASE)
_COL_PAT = re.compile(rf"^(?:({_IDENT})\s*\.\s*)?({_IDENT})$")


def _parse_jbo(
    sql: str, lo: int, hi: int, rel_names: set[str],
    span_nodes: dict[tuple[int, int], CorrNode],
    join_names: "dict[str, CorrNode] | None" = None,
) -> DocTemplate | None:
    """``sql[lo:hi]`` must be exactly ``json_build_object(k, v, …)``;
    values are own-relation columns, directly nested blocks, or — in
    the root block when main-FROM join dims exist (``join_names``
    alias/table → join CorrNode) — join-dim columns, which become
    ``('jcol', (node, col))`` entries. With join dims in scope an
    UNQUALIFIED column value is ambiguous without schemas → None."""
    m = _JBO_PAT.match(sql, lo)
    if not m or m.start() != lo:
        return None
    close = _matching_paren(sql, m.end() - 1)
    if close < 0 or sql[close + 1:hi].strip():
        return None
    args = _split_ranges(sql, m.end(), close)
    if len(args) % 2:
        return None
    entries = []
    for (ks, ke), (vs, ve) in zip(args[::2], args[1::2]):
        key_txt = sql[ks:ke]
        if not (key_txt.startswith("'") and key_txt.endswith("'") and len(key_txt) >= 2):
            return None
        key = key_txt[1:-1].replace("''", "'")
        node = span_nodes.get((vs, ve))
        if node is not None:
            entries.append((key, ("node", node)))
            continue
        cm = _COL_PAT.match(sql[vs:ve])
        if not cm:
            # arbitrary EXPRESSION value ('total', o.price * o.qty):
            # recorded raw; the doc-tree derivation transpiles it,
            # validates every reference against the block's OWN schema
            # and computes it over the state rows — out-of-reach
            # expressions bail THERE, not here. With main-FROM join
            # dims in scope a root-template expression is ambiguous
            # without schemas (a bare ident could be the parent's or a
            # dim's) → out of grammar.
            if join_names:
                return None
            entries.append((key, ("expr", sql[vs:ve])))
            continue
        qual = _norm(cm.group(1)) if cm.group(1) else None
        col = _norm(cm.group(2))
        if col in _KEYWORDS:
            return None
        if join_names and qual is not None and qual in join_names:
            entries.append((key, ("jcol", (join_names[qual], col))))
            continue
        if qual is not None and qual not in rel_names:
            return None
        if qual is None and join_names:
            return None  # several root relations in scope: ambiguous
        entries.append((key, ("col", col)))
    return DocTemplate(entries)


_SAGG_PAT = re.compile(r"(count|sum|min|max|avg)\s*\(", re.IGNORECASE)


def _parse_to_many_select(
    sql: str, es: int, ee: int, names: set[str],
    span_nodes: "dict[tuple[int, int], CorrNode]",
) -> DocTemplate | None:
    """One to-many block's select expression ``sql[es:ee]``:

    - ``json_agg(json_build_object(…) [ORDER BY keys])`` → entries +
      raw ``order_text`` (PG declares element order INSIDE the agg);
    - ``count(*)`` / ``count|sum|min|max|avg([qual.]col)`` → a scalar
      AGGREGATE block: empty entries, ``agg=(fname, col|None)``."""
    jm = _JAGG_PAT.match(sql, es)
    if jm:
        close = _matching_paren(sql, jm.end() - 1)
        if close < 0 or sql[close + 1:ee].strip():
            return None
        lo = jm.end()
        while lo < close and sql[lo].isspace():
            lo += 1
        distinct = False
        dm0 = re.match(r"(?is)distinct\b", sql[lo:close])
        if dm0:
            distinct = True
            lo += dm0.end()
            while lo < close and sql[lo].isspace():
                lo += 1
        jbm = _JBO_PAT.match(sql, lo)
        if not jbm:
            return None
        jclose = _matching_paren(sql, jbm.end() - 1)
        if jclose < 0 or jclose >= close:
            return None
        order_text = None
        tail = sql[jclose + 1:close].strip()
        if tail:
            om = re.match(r"(?is)^order\s+by\s+(.+)$", tail)
            if not om:
                return None
            if distinct:
                # PG restricts DISTINCT+ORDER BY to the element itself;
                # the sorted dedup below already yields that order, but
                # proving textual equivalence here isn't worth it — the
                # (rare) combination keeps the targeted/recompute lanes
                return None
            order_text = om.group(1).strip()
        tpl = _parse_jbo(sql, lo, jclose + 1, names, span_nodes)
        if tpl is None:
            return None
        return DocTemplate(list(tpl.entries), order_text=order_text,
                           distinct=distinct)
    sm = _SAGG_PAT.match(sql, es)
    if not sm:
        return None
    close = _matching_paren(sql, sm.end() - 1)
    if close < 0 or sql[close + 1:ee].strip():
        return None
    fname = sm.group(1).lower()
    arg = sql[sm.end():close].strip()
    if arg == "*":
        return DocTemplate([], agg=(fname, None)) if fname == "count" else None
    dm = re.match(r"(?is)^distinct\b(.*)$", arg)
    if dm:
        if fname != "count":
            return None  # sum/avg DISTINCT: rare, out of shape
        fname, arg = "count_distinct", dm.group(1).strip()
    cm = _COL_PAT.match(arg)
    if not cm:
        return None
    qual = _norm(cm.group(1)) if cm.group(1) else None
    col = _norm(cm.group(2))
    if (qual is not None and qual not in names) or col in _KEYWORDS:
        return None
    return DocTemplate([], agg=(fname, col))


def parse_doc_templates(tree: CorrelationTree) -> "dict[CorrNode | None, DocTemplate] | None":
    """The per-block document templates of a parsed view, or None when
    the SQL is outside the doc grammar. Keys: None → the root block,
    else the CorrNode. Requirements (all bail to None):

    - the root select list is exactly ``<parent id>, json_build_object(…)
      [AS alias]`` (the id parent-qualified or bare; with main-FROM join
      dims a bare id still binds to the parent — dim ids would be the
      join key, and a dim-qualified id is out of grammar);
    - every to-one block is ``(select json_build_object(…) from … where …)``;
    - every to-many block is ``(select json_agg(json_build_object(…))
      from … where …)``;
    - every template value is a column of the block's own relation, a
      DIRECTLY nested block correlated to this block, or — root block
      only — a qualified column of a main-FROM join dim (``jcol``).
    """
    sql = tree.sql
    if not sql:
        return None
    span_nodes = {n.span: n for n in tree.nodes if n.span is not None}
    join_nodes = [n for n in tree.nodes if n.span is None]
    join_names: dict[str, CorrNode] = {}
    for n in join_nodes:
        join_names[n.table] = n
        join_names[n.alias] = n
    out: dict[CorrNode | None, DocTemplate] = {}

    # --- root select list --------------------------------------------
    sm = _search_depth0(re.compile(r"\bselect\s+", re.IGNORECASE), sql)
    fm = _search_depth0(_FROM_PAT, sql)
    if not sm or not fm:
        return None
    items = _split_ranges(sql, sm.end(), fm.start())
    if len(items) != 2:
        return None
    id_txt = sql[items[0][0]:items[0][1]]
    idm = re.fullmatch(
        rf'(?:({_IDENT})\s*\.\s*)?"?{tree.id_col}"?', id_txt, re.IGNORECASE
    )
    if not idm:
        return None
    id_qual = _norm(idm.group(1)) if idm.group(1) else None
    if id_qual is not None and id_qual not in {tree.parent_table, tree.parent_alias}:
        return None  # doc keyed on a join dim's id: out of grammar
    vs, ve = items[1]
    am = re.search(rf"\s+as\s+{_IDENT}\s*$", sql[vs:ve], re.IGNORECASE)
    if am:
        ve = vs + am.start()
    root_names = {tree.parent_table, tree.parent_alias}
    tpl = _parse_jbo(sql, vs, ve, root_names, span_nodes, join_names or None)
    if tpl is None:
        return None
    out[None] = tpl

    # --- each block ---------------------------------------------------
    for node in tree.nodes:
        if node.span is None:
            continue  # main-FROM join dims carry no template (jcol serves them)
        lo, hi = node.span[0] + 1, node.span[1] - 1
        body = sql[lo:hi]
        bm = re.match(r"\s*select\s+", body, re.IGNORECASE)
        bf = _search_depth0(_FROM_PAT, body)
        if not bm or not bf:
            return None
        es, ee = lo + bm.end(), lo + bf.start()
        while ee > es and sql[ee - 1].isspace():
            ee -= 1
        names = {node.table, node.alias}
        if node.to_one(tree.id_col):
            tpl = _parse_jbo(sql, es, ee, names, span_nodes)
        else:
            tpl = _parse_to_many_select(sql, es, ee, names, span_nodes)
        if tpl is None:
            return None
        out[node] = tpl

    # every nested-node value must be a DIRECT child of its block; a
    # root-template node may also anchor on a main-FROM join dim (the
    # join dim is part of the root block's scope)
    for owner, tpl in out.items():
        for _k, (kind, val) in tpl.entries:
            if kind != "node":
                continue
            if val.outer is owner:
                continue
            if owner is None and val.outer is not None and val.outer.span is None:
                continue
            return None
    # every SUBQUERY node must appear in exactly one template; join dims
    # appear only via jcol entries (possibly not at all — pure bridges)
    used = [v for tpl in out.values() for _k, (kind, v) in tpl.entries if kind == "node"]
    if len(used) != len(set(map(id, used))) or set(map(id, used)) != {
        id(n) for n in tree.nodes if n.span is not None
    }:
        return None
    return out
