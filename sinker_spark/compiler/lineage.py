"""SQL table-lineage extraction — ``parse_schema_tables`` equivalent.

Reference: utils.py:7-20 uses sqlglot to return (parent_table,
{constituent tables}) for a view SELECT; the parent (first table of the
main query) doubles as the delete-id proxy (sinker.py:110-120), and the
constituent set decides which source-table changes dirty the view
(sinker.py:121-126). sqlglot isn't available here, so this is a small
self-contained tokenizer + FROM-clause state machine with the same
observable behavior on the reference's own test corpus
(tests/test_parse_schema_tables.py:1-98, replicated in
tests/test_lineage.py):

- schema-qualified names reduce to the bare table name,
- function calls in FROM (``unnest(...)``, ``jsonb_each_text(...)``) are
  skipped, including their ``AS alias(col, ...)`` aliases,
- CTE names are excluded from the constituent set,
- the parent is the first table of the *main* (top-level) FROM,
- a query with no tables raises ValueError.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
    (?P<qident>"[^"]*")
  | (?P<str>'(?:[^']|'')*')
  | (?P<ident>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<punct>::|[(),.;*=<>+\-/%])
  | (?P<ws>\s+)
  | (?P<other>.)
    """,
    re.VERBOSE,
)

_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)

# keywords that terminate a FROM item list
_FROM_END = {
    "WHERE", "GROUP", "ORDER", "HAVING", "WINDOW", "LIMIT", "OFFSET",
    "UNION", "INTERSECT", "EXCEPT", "FETCH", "QUALIFY", "RETURNING", "SELECT",
}
_JOIN_WORDS = {"JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "OUTER", "NATURAL", "LATERAL"}
_NOT_ALIAS = _FROM_END | _JOIN_WORDS | {"ON", "USING", "AS"}


def _tokenize(sql: str) -> list[str]:
    sql = _COMMENT_RE.sub(" ", sql)
    out = []
    for m in _TOKEN_RE.finditer(sql):
        if m.lastgroup in ("ws",):
            continue
        out.append(m.group())
    return out


def _is_ident(tok: str) -> bool:
    return bool(tok) and (tok[0] == '"' or re.match(r"[A-Za-z_]", tok[0]) is not None)


def _bare(tok: str) -> str:
    return tok[1:-1] if tok.startswith('"') else tok


class _Scanner:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        self.tables: list[str] = []          # all table refs, document order
        self.top_level_tables: list[str] = []  # main-query FROM tables only
        self.ctes: set[str] = set()

    def peek(self, off: int = 0) -> str:
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else ""

    def _skip_parens(self, top: bool) -> None:
        """Position is at '('; recursively scan the sub-block for tables."""
        assert self.peek() == "("
        self.i += 1
        self._scan_block(top=False)
        if self.peek() == ")":
            self.i += 1

    def _read_name(self) -> str:
        """Read a possibly schema-qualified identifier; return last part."""
        name = _bare(self.peek())
        self.i += 1
        while self.peek() == "." and _is_ident(self.peek(1)):
            name = _bare(self.peek(1))
            self.i += 2
        return name

    def _scan_with_clause(self, top: bool) -> None:
        """At 'WITH': collect CTE names, scan bodies (never top-level)."""
        self.i += 1  # WITH
        if self.peek().upper() == "RECURSIVE":
            self.i += 1
        while True:
            if not _is_ident(self.peek()):
                return
            self.ctes.add(_bare(self.peek()))
            self.i += 1
            if self.peek() == "(":  # column alias list
                depth = 0
                while self.i < len(self.toks):
                    if self.peek() == "(":
                        depth += 1
                    elif self.peek() == ")":
                        depth -= 1
                        if depth == 0:
                            self.i += 1
                            break
                    self.i += 1
            if self.peek().upper() == "AS":
                self.i += 1
            if self.peek() == "(":
                self._skip_parens(top=False)
            if self.peek() == ",":
                self.i += 1
                continue
            return

    def _scan_block(self, top: bool) -> None:
        """Scan until end of tokens or an unmatched ')'.

        States: 0 = neutral, 1 = expecting a FROM item, 2 = after a FROM
        item (aliases), 3 = inside ON/USING expression.

        A ``FROM`` opens a table list only if this block has seen a
        ``SELECT``: SQL also spells FROM inside scalar function calls —
        ``extract(year FROM ts)``, ``substring(s FROM 2)``,
        ``trim(both ' ' FROM s)`` — whose argument blocks contain no
        SELECT, and treating those as table refs puts phantom tables in
        the view's deps (found by tools/fuzz_view_engine.py: a view
        using extract(... FROM l_shipdate) grew an 'l_shipdate' dep).
        """
        state = 0
        saw_select = False
        while self.i < len(self.toks):
            tok = self.peek()
            up = tok.upper() if not tok.startswith('"') else tok

            if tok == ")":
                return
            if tok == "(":
                self._skip_parens(top=False)
                if state == 1:  # derived table / subquery as FROM item
                    state = 2
                continue
            if up == "WITH" and state == 0:
                self._scan_with_clause(top)
                continue
            if up == "SELECT":
                saw_select = True
                state = 0
                self.i += 1
                continue
            if up == "FROM":
                if saw_select:
                    state = 1
                self.i += 1
                continue
            if state in (1, 2, 3):
                if up in _FROM_END:
                    state = 0
                    self.i += 1
                    continue
                if up == "JOIN":
                    state = 1
                    self.i += 1
                    continue
                if up in _JOIN_WORDS:
                    self.i += 1
                    continue
                if up in ("ON", "USING"):
                    state = 3
                    self.i += 1
                    continue
                if tok == ",":
                    if state != 3:
                        state = 1
                    self.i += 1
                    continue
                if state == 1 and _is_ident(tok):
                    if self.peek(1) == "(" or (self.peek(1) == "." and self.peek(3) == "("):
                        # function call in FROM: skip name(.name)(args) + alias
                        self._read_name()
                        if self.peek() == "(":
                            self._skip_parens(top=False)
                        state = 2
                        continue
                    name = self._read_name()
                    self.tables.append(name)
                    if top:
                        self.top_level_tables.append(name)
                    state = 2
                    continue
                if state == 2 and _is_ident(tok):
                    if up == "AS":
                        self.i += 1
                        continue
                    # alias identifier (possibly followed by a column list)
                    self.i += 1
                    if self.peek() == "(":
                        self._skip_parens(top=False)
                    continue
                self.i += 1
                continue
            self.i += 1


def parse_schema_tables(view_select_query: str) -> tuple[str, set[str]]:
    """(parent_table, constituent tables) for a view SELECT query.

    Behavior-compatible with the reference's utils.py:7-20 on its own test
    corpus; the parent table is the first table of the main query's FROM,
    the set excludes CTE aliases and function calls.
    """
    sc = _Scanner(_tokenize(view_select_query))
    sc._scan_block(top=True)
    tables = {t for t in sc.tables if t} - sc.ctes
    parents = [t for t in sc.top_level_tables if t not in sc.ctes]
    if not parents and not tables:
        raise ValueError("No table found in the query")
    parent = parents[0] if parents else sorted(tables)[0]
    return parent, tables
