"""Fully-incremental maintenance of a SQL-DECLARED document view.

``ivm_flagship`` maintains the complete reference doc shape for views
declared as :class:`~sinker_spark.views.DocTreeViewSpec`; this module
derives that spec — plus a NESTED serving plan — straight from the
view's PG SQL, so the reference's own ``course_mv.sql`` (tests/
fixtures/course_mv.sql:1-26) dropped into the definitions dir is
maintained as a pure delta fold on all five tables with zero Python
(opt-in: ``ViewDef(sql=…, sql_doctree=True)`` or the engine-wide
``SINKER_SPARK_SQL_DOCTREE=1``).

Derivation reuses the correlation tree + doc templates
(compiler/correlate.py) and the catalog schemas; the state/walk
machinery is ivm_flagship's unchanged (same multiplicity states, same
reverse indexes, same O(|Δ|·fan-out) refresh). Only SERVING differs,
because the engine's truth for a SQL view is the TRANSPILED compile
(compiler/transpile.py rewrites nested scalar subqueries into LEFT
JOINs and ``json_agg`` into ``sort_array(collect_list(named_struct))``)
— so the nested serve reproduces exactly those semantics:

- the root chain's FIRST hop is a scalar subquery → the field is NULL
  when that dim row is missing, and the doc SURVIVES (unlike the
  flat DocTreeViewSpec lane, where a broken chain retracts the doc);
- every DEEPER nested object (rewritten to LEFT JOIN + named_struct)
  is built unconditionally — missing rows serve a struct of NULLs;
- child arrays sort by the full element struct
  (``sort_array(collect_list(...))``) and serve ``[]`` — not NULL —
  for childless parents (Spark aggregate-over-empty semantics);
- decimals inside the doc canonicalize to double exactly as
  ``ViewDef.compile`` does (views._decimals_to_double).

A root-block WHERE is supported when the predicate transpiles to a
Spark expression over parent columns only: the serve applies it, so a
parent row crossing the predicate retracts/creates its doc exactly as
the compiled view would.

The root's to-one structure is a TREE, fed from two spellings that
real MVs mix freely:

- **main-FROM joins** — ``FROM course JOIN teacher t ON
  course.teacher_id = t.id`` — serve FLAT columns (``'tname', t.name``
  in the root template); an INNER join drops the doc when the dim row
  is missing, LEFT serves NULL columns;
- **correlated scalar subqueries** — serve nested structs; a missing
  dim row NULLs the field (outermost) or serves a struct of NULLs
  (nested), exactly the transpiled compile's semantics;
- branches anywhere: a parent with two independent lookups, a join dim
  carrying a correlated block, a correlated block whose template nests
  two sibling objects.

To-many blocks NEST: a ``json_agg`` inside a child's element template
(customer→orders[]→lineitems[], any depth) derives
``ChildArraySpec.children`` — the transpiled compile pre-groups the
inner agg into a derived-table LEFT JOIN (transpile._agg_subquery_join)
and the serve reproduces its semantics exactly: a NESTED array with
zero rows is NULL (PG json_agg-over-empty through the derived-table
join), while a ROOT-level array coalesces to ``[]`` (Spark
aggregate-over-empty in the compiled correlated scalar subquery).

To-many blocks also anchor AT DIM NODES (DimLookup.arrays): a
``json_agg`` inside a to-one block's template keyed on that block (the
teacher object carrying the teacher's courses[]), or in the root
template keyed on a main-FROM join dim. Dim-template arrays serve NULL
over empty (derived-table join parity); root-template (join-dim) ones
coalesce to ``[]`` like other root arrays.

Further grammar the lane serves with exact compiled-view parity:

- **per-block FILTER conjuncts** (``… where e.course_id = c.id AND
  e.active``, any conjunct order, either equality side order): compiled
  against the block's OWN schema and applied to its state rows — a
  to-one row failing its filter serves NULL, a to-many row drops out of
  its array/aggregate;
- **CORRELATED block filters** (r7 — a non-correlation conjunct
  referencing the block's ANCHOR: ``… and e.grade >= c.min_grade``):
  to-one blocks fold the predicate into the serve JOIN condition (a
  failing dim row serves NULL, exactly the compiled subquery matching
  nothing); to-many blocks get an ELEMENT predicate whose anchor
  columns ride the probe as ``__af_`` slots. Refs beyond the (own,
  anchor) two-scope window — a grandparent, a sibling block — bail;
- **root WHERE over JOIN-DIM columns** (r7 — ``where t.active and
  course.name <> 'x'`` with ``t`` a main-FROM join dim): compiled
  against the serve's joined frame (bare parent columns +
  ``__d{i}_``-prefixed dim columns); a dim delta flipping the predicate
  retracts/re-admits parents through the dim's reverse-index walk;
- **json_agg(DISTINCT jbo(…))** (r7): the serve dedups element VALUES
  (``sort_array∘array_distinct∘collect_list`` — value-identical to the
  compile's ``collect_list(DISTINCT …)``); DISTINCT with a declared
  ORDER BY still bails (PG restricts it to the element anyway);
- **correlated SCALAR AGGREGATES** (``(select count(*)|sum|min|max|
  avg(col) from child where child.fk = anchor.id [AND …])``) at any
  anchor (root template, to-one block template, to-many element
  template): the same child state serves one value — ``count``
  coalesces to 0 over empty everywhere (Spark's depth-0 scalar COUNT
  and the derived-table coalesce agree), others serve NULL;
- **declared element order** (``json_agg(jbo(…) ORDER BY k [DESC]
  [NULLS …], …)``): keys must be own-relation columns; served via the
  same array_sort comparator the transpiled compile emits
  (ASC→NULLS LAST / DESC→NULLS FIRST, element tie-break);
- **expression template values** (``'total', o.price * o.qty``,
  function calls, CASE, ``||`` chains with PG casts): compiled against
  the block's own schema, computed as slot columns on the state rows;
  outer refs, subqueries and rand/uuid bail.

Shape restrictions (anything else returns None and the view keeps the
targeted/full lanes): every to-many block keyed directly on the id of
its anchor (the parent, its container block, or a to-one dim); element
to-one lookups form a TREE (several independent lookups per element,
each nesting further — per-branch states and reverse indexes, DFS
numbering via views.edim_nodes; a hop whose fk IS its referrer's key
column is an identity hop needing no index); every template value a
column or own-schema expression of its block's relation (root template
with main-FROM join dims: qualified columns only — a bare name there
is ambiguous without schemas); no ambiguous unqualified outer refs;
root WHERE restricted to parent + main-FROM join-dim columns; block
filters restricted to (own, anchor) columns; json_agg ORDER BY keys
restricted to own-block columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.compiler.correlate import (
    CorrelationTree,
    CorrNode,
    DocTemplate,
    _search_depth0,
    parse_correlation_tree,
    parse_doc_templates,
)
from sinker_spark.ivm_doc import expand_mult
from sinker_spark.ivm_flagship import RowsFor, doc_tree_states
from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec


@dataclass
class RootDim:
    """One to-one hop of the root dim TREE: a main-FROM join dim
    (``corr.span is None``; serves flat ``jcol`` columns, 'inner' joins
    drop the parent row when the dim is missing) or a correlated
    scalar-subquery block (serves a nested struct). ``idx`` is the
    DFS-preorder number — the node's states are ``d{idx}``/``rp{idx}``,
    matching :func:`sinker_spark.views.dim_nodes` over the derived
    spec's ``dim_forest``."""

    idx: int
    corr: CorrNode
    parent: "int | None"  # referrer RootDim idx; None = the parent table


@dataclass
class SqlChild:
    """One to-many block of the derived doc tree (any nesting depth):
    ``suffix`` is the ivm_flagship state path (``c{i}`` at the root,
    ``{container}x{k}`` nested), ``echain`` its element to-one TREE —
    DFS-preorder ``(node, parent_idx|None)`` hops, parent None = the
    element row carries the fk (an element may hold several independent
    lookups, each nesting further) — ``children`` its own nested
    to-many blocks (a json_agg inside the element template, keyed on
    this block's id)."""

    node: CorrNode
    suffix: str
    echain: "list[tuple[CorrNode, int | None]]"
    children: list["SqlChild"]
    # scalar-aggregate block: (fname, argcol|None) — serves ONE value
    # (count coalesced to 0 over empty, others NULL), never an array
    agg: "tuple[str, str | None] | None" = None
    # declared json_agg ORDER BY: [(own_col, desc, nulls_first)] — the
    # serve honors it exactly as the transpiled compile does
    order_keys: "list[tuple[str, bool, bool]] | None" = None
    # json_agg(DISTINCT …): dedup identical element values (compile
    # parity: sort_array(collect_list(DISTINCT named_struct(…))))
    distinct: bool = False
    # NON-KEY parent anchor (top level only): the parent column the
    # block correlates on (``… where sale.region = p.region``); None =
    # the parent id. The spec grows an ra{suffix} reverse index so
    # child deltas walk anchor → parent keys bucket-pruned.
    anchor: "str | None" = None


@dataclass
class SqlDocTree:
    """A SQL view compiled to the doc-tree lane: the state/walk spec
    plus the template structure the nested serve builds from."""

    spec: DocTreeViewSpec
    tree: CorrelationTree
    templates: "dict[CorrNode | None, DocTemplate]"
    root_dims: list[RootDim]            # root to-one tree, DFS preorder
    child_nodes: list[CorrNode]         # root to-many nodes, template order
    child_chains: list[list[CorrNode]]  # element to-one chain per root child
    # transpiled root WHERE predicate over BARE parent columns (None =
    # unfiltered view); the serve applies it so filtered-out parents are
    # retracted exactly as the compiled view omits them
    where_expr: str | None = None
    # root WHERE that also references main-FROM join-dim columns
    # (``where t.active``): applied AFTER the root-dim joins, over the
    # prefixed frame — mutually exclusive with where_expr
    where_join_expr: str | None = None
    # recursive to-many structure (supersedes child_nodes/child_chains,
    # which remain the top level of this forest)
    sql_children: "list[SqlChild]" = None  # type: ignore[assignment]
    # dim-anchored arrays: (dim idx, shape, declared-at-root?) — at-root
    # (join-dim-anchored) arrays serve [] over empty like other root
    # arrays; dim-template ones serve NULL (derived-table join parity)
    dim_sql_children: "list[tuple[int, SqlChild, bool]] | None" = None
    # id(CorrNode) → compiled Spark filter predicate over the block's
    # BARE own columns (the block's non-correlation WHERE conjuncts);
    # the serve applies it to that block's state rows
    node_pred: "dict[int, str] | None" = None
    # CORRELATED block filters (r7): to-one blocks get a JOIN predicate
    # over prefixed (own, anchor) columns; to-many blocks get an element
    # predicate over prefixed own columns + __af_ anchor slots that the
    # probe carries ({id(node): [(slot, anchor_col)]})
    corr_join_pred: "dict[int, str] | None" = None
    corr_elem_pred: "dict[int, str] | None" = None
    corr_probe_cols: "dict[int, list[tuple[str, str]]] | None" = None
    # template EXPRESSION values: per-block slot columns computed on
    # the state rows ({id(node): [(slot, spark_expr)]}), the slot each
    # (block, json key) serves from, and the root template's compiled
    # expressions (evaluated directly on the parent frame)
    node_exprs: "dict[int, list[tuple[str, str]]] | None" = None
    expr_slots: "dict[tuple[int, str], str] | None" = None
    root_exprs: "dict[str, str] | None" = None


# identifiers legal in a served WHERE predicate that are NOT column
# references: SQL keywords, literals and the type names reachable after
# ``CAST(x AS <type>)`` — anything else unresolved against the parent
# schema bails the derivation (the targeted/full lanes stay sound)
_PRED_KEYWORDS = frozenset({
    "and", "or", "not", "true", "false", "null", "is", "in", "like",
    "ilike", "rlike", "regexp", "between", "case", "when", "then", "else",
    "end", "cast", "try_cast", "as", "escape", "distinct", "interval",
    "div", "current_date", "current_timestamp",
    "int", "integer", "bigint", "smallint", "tinyint", "double", "float",
    "real", "decimal", "numeric", "string", "text", "varchar", "char",
    "boolean", "bool", "date", "timestamp", "precision", "varying",
})
_QUALIFIED_REF = re.compile(r"[A-Za-z_]\w*\s*\.\s*[A-Za-z_\"`]")
_BARE_IDENT = re.compile(r"\b([A-Za-z_]\w*)\b")


def _compile_pred(
    spark: SparkSession, table: str, aliases: "set[str]",
    where_text: str, own_cols: "dict[str, str]", id_col: str,
) -> "tuple[str, list[str]] | None":
    """Transpile one block's predicate text to a Spark expression over
    BARE columns of ``table``. Returns ``(spark_pred,
    referenced_cols)``, or None when the predicate is outside what the
    state-serve can apply (a qualifier not covered by ``aliases``, an
    identifier that is neither a keyword, a function call nor a column
    of ``table``, or a transpile/analysis failure). An unqualified
    identifier that is a column of ``table`` binds there by PG's
    innermost-scope rule, so no outer-ambiguity check is needed."""
    from sinker_spark.compiler.transpile import (
        _literal_spans,
        _strip_table_qualifiers,
        transpile,
    )

    if _NONDET_CALL.search(where_text):
        # a rand()/uuid() filter would be re-drawn per serve, diverging
        # from the compiled recompute — bail like template expressions do
        return None
    try:
        t = transpile(f"select {id_col} from {table} where {where_text}")
    except Exception:
        return None
    wm = _search_depth0(re.compile(r"\bwhere\b", re.IGNORECASE), t)
    if not wm:
        return None
    pred = _strip_table_qualifiers(t[wm.end():].strip(), aliases)
    cols = _validate_refs(pred, own_cols)
    if cols is None:
        return None
    try:
        probe = spark.table(table).where(F.expr(pred))
        probe.schema  # force analysis: unknown functions/columns raise
    except Exception:
        return None
    return pred, cols


def _validate_refs(expr: str, own_cols: "dict[str, str]") -> "list[str] | None":
    """Every identifier in a transpiled, qualifier-stripped expression
    must be a keyword, a function call, or a column of the block's own
    relation (returned); any surviving qualified ref (an alias the strip
    did not cover — i.e. an OUTER reference) fails."""
    from sinker_spark.compiler.transpile import _literal_spans

    lits = _literal_spans(expr)

    def in_lit(i: int) -> bool:
        return any(s <= i < e for s, e in lits)

    for m in _QUALIFIED_REF.finditer(expr):
        if not in_lit(m.start()):
            return None  # a qualified ref the aliases didn't cover
    cols: list[str] = []
    for m in _BARE_IDENT.finditer(expr):
        if in_lit(m.start()):
            continue
        ident = m.group(1).lower()
        if ident in _PRED_KEYWORDS:
            continue
        rest = expr[m.end():]
        if rest.lstrip().startswith("("):
            continue  # function call
        if expr[: m.start()].rstrip().endswith("."):
            continue  # column part of a (stripped) qualified ref
        if ident not in own_cols:
            return None
        cols.append(ident)
    return cols


_NONDET_CALL = re.compile(
    r"(?i)\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id)\s*\(",
)


def _rewrite_scoped_refs(
    expr: str, scopes: "list[tuple[set[str], dict[str, str], object]]",
    innermost_first: bool = False,
) -> "tuple[str, list[list[str]]] | None":
    """Rewrite every identifier in a transpiled predicate to its scope's
    serve-frame name. ``scopes``: ``(aliases, cols, fmt)`` per relation
    in template order — a qualified ref binds to the unique scope whose
    aliases contain the qualifier, a bare identifier to the unique scope
    whose columns contain it (two matches = PG ambiguity error → None;
    zero = keyword/function or out of reach). With ``innermost_first``
    (correlated block filters: scopes ordered own → anchor) a name in
    several scopes binds to the FIRST — PG's innermost-scope rule —
    instead of erroring. Returns the rewritten text plus the referenced
    columns per scope."""
    from sinker_spark.compiler.transpile import _literal_spans

    lits = _literal_spans(expr)

    def in_lit(i: int) -> bool:
        return any(s <= i < e for s, e in lits)

    refs: list[list[str]] = [[] for _ in scopes]
    out: list[str] = []
    pos = 0
    pat = re.compile(
        r"([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)|([A-Za-z_]\w*)"
    )
    for m in pat.finditer(expr):
        if m.start() < pos or in_lit(m.start()):
            continue
        out.append(expr[pos:m.start()])
        pos = m.end()
        if m.group(1) is not None:  # qualified q.c
            q, c = m.group(1).lower(), m.group(2).lower()
            hits = [i for i, (al, cols, _f) in enumerate(scopes) if q in al]
            if innermost_first and len(hits) > 1:
                hits = hits[:1]
            if len(hits) != 1 or c not in scopes[hits[0]][1]:
                return None
            i = hits[0]
            refs[i].append(c)
            out.append(scopes[i][2](c))
            continue
        ident = m.group(3).lower()
        rest = expr[m.end():]
        if ident in _PRED_KEYWORDS or rest.lstrip().startswith("("):
            out.append(m.group(3))
            continue
        hits = [i for i, (_al, cols, _f) in enumerate(scopes) if ident in cols]
        if innermost_first and len(hits) > 1:
            hits = hits[:1]
        if len(hits) != 1:
            return None  # unresolvable or PG-ambiguous bare identifier
        refs[hits[0]].append(ident)
        out.append(scopes[hits[0]][2](ident))
    out.append(expr[pos:])
    return "".join(out), refs


def _compile_pred_corr(
    spark: SparkSession, table: str, own_aliases: "set[str]",
    own_cols: "dict[str, str]", anchor_aliases: "set[str]",
    anchor_cols: "dict[str, str]", own_fmt, anchor_fmt, where_text: str,
) -> "tuple[str, list[str], list[str]] | None":
    """Compile a block's filter conjunction that references its ANCHOR
    (``where e.course_id = c.id AND e.grade >= c.min_grade`` — the
    correlation edge is already stripped; this sees only the residue).
    Scopes bind innermost-first (own shadows anchor, PG's rule); the
    returned predicate is rewritten to the SERVE frame's names via
    ``own_fmt``/``anchor_fmt``. Returns ``(pred, own_refs, anchor_refs)``
    or None (a ref outside the two scopes, nondeterministic calls,
    analysis failure). A filter with NO anchor refs is the plain
    _compile_pred path's job and returns None here too."""
    from sinker_spark.compiler.transpile import transpile

    if _NONDET_CALL.search(where_text):
        return None
    try:
        t = transpile(f"select 1 from {table} where {where_text}")
    except Exception:
        return None
    wm = _search_depth0(re.compile(r"\bwhere\b", re.IGNORECASE), t)
    if not wm:
        return None
    scopes = [
        ({a.lower() for a in own_aliases}, own_cols, own_fmt),
        ({a.lower() for a in anchor_aliases}, anchor_cols, anchor_fmt),
    ]
    rw = _rewrite_scoped_refs(t[wm.end():].strip(), scopes, innermost_first=True)
    if rw is None:
        return None
    pred, (own_refs, anchor_refs) = rw
    if not anchor_refs:
        return None
    fields = [f"{own_fmt(c)} {ty}" for c, ty in own_cols.items()]
    fields += [f"{anchor_fmt(c)} {ty}" for c, ty in anchor_cols.items()
               if anchor_fmt(c) not in {own_fmt(o) for o in own_cols}]
    try:
        spark.createDataFrame([], ", ".join(fields)).where(F.expr(pred)).schema
    except Exception:
        return None
    return pred, sorted(set(own_refs)), sorted(set(anchor_refs))


def _compile_where_joined(
    spark: SparkSession, tree: CorrelationTree, root_dims: "list",
    cols_of, where_text: str, id_col: str,
) -> "tuple[str, list[str], dict[int, list[str]]] | None":
    """Root WHERE referencing main-FROM join-dim columns (``where
    t.active and c.id > 5``) → a Spark predicate over the SERVE's joined
    frame: bare parent columns + ``__d{idx}_``-prefixed join-dim
    columns. Returns ``(pred, parent_cols, {dim idx: cols})`` or None
    when out of reach (a correlated-block alias — SELECT-list subqueries
    are not in the root WHERE's scope in PG — an ambiguous bare name, a
    nondeterministic call, or analysis failure)."""
    from sinker_spark.compiler.transpile import transpile

    if _NONDET_CALL.search(where_text):
        return None
    try:
        t = transpile(f"select {id_col} from {tree.parent_table} where {where_text}")
    except Exception:
        return None
    wm = _search_depth0(re.compile(r"\bwhere\b", re.IGNORECASE), t)
    if not wm:
        return None
    pred_text = t[wm.end():].strip()

    parent_cols = cols_of(tree.parent_table)
    if parent_cols is None:
        return None
    scopes: list = [(
        {tree.parent_table.lower(), tree.parent_alias.lower()},
        parent_cols, lambda c: c,
    )]
    join_dims = [rd for rd in root_dims if rd.corr.span is None]
    dim_pos: list[int] = []
    for rd in join_dims:
        own = cols_of(rd.corr.table)
        if own is None:
            return None
        pre = f"__d{rd.idx}_"
        scopes.append((
            {rd.corr.table.lower(), rd.corr.alias.lower()},
            own, lambda c, pre=pre: f"{pre}{c}",
        ))
        dim_pos.append(rd.idx)
    # a duplicated alias/table name across scopes makes every qualified
    # ref ambiguous — _rewrite_scoped_refs' unique-hit rule handles it
    rewritten = _rewrite_scoped_refs(pred_text, scopes)
    if rewritten is None:
        return None
    pred, refs = rewritten
    if not any(refs[i + 1] for i in range(len(join_dims))):
        return None  # parent-only: the plain _compile_pred path owns it
    # analysis probe over an empty frame with the serve's joined schema
    fields = [f"{c} {ty}" for c, ty in parent_cols.items()]
    for i, rd in enumerate(join_dims):
        fields += [f"__d{rd.idx}_{c} {ty}" for c, ty in scopes[i + 1][1].items()]
    try:
        probe = spark.createDataFrame([], ", ".join(fields)).where(F.expr(pred))
        probe.schema
    except Exception:
        return None
    dim_cols = {rd.idx: sorted(set(refs[i + 1]))
                for i, rd in enumerate(join_dims) if refs[i + 1]}
    return pred, sorted(set(refs[0])), dim_cols


def _compile_expr(
    spark: SparkSession, table: str, aliases: "set[str]",
    expr_text: str, own_cols: "dict[str, str]",
) -> "tuple[str, list[str]] | None":
    """Transpile one template EXPRESSION value (``'total', o.price *
    o.qty``) to a Spark expression over BARE columns of ``table``.
    Returns ``(spark_expr, referenced_cols)`` or None when out of reach:
    outer references, scalar subqueries, value-nondeterministic calls
    (rand/uuid — a fold would freeze one draw while the compiled
    recompute redraws), or transpile/analysis failure."""
    from sinker_spark.compiler.correlate import _SUBQ_OPEN
    from sinker_spark.compiler.transpile import (
        _search_code,
        _strip_table_qualifiers,
        transpile,
    )

    if _search_code(_SUBQ_OPEN, expr_text) or _NONDET_CALL.search(expr_text):
        return None
    try:
        t = transpile(f"select {expr_text} as __x from {table}")
    except Exception:
        return None
    sm = re.match(r"(?is)^\s*select\s+", t)
    fm = _search_depth0(re.compile(r"\bfrom\b", re.IGNORECASE), t)
    if not sm or not fm:
        return None
    e = t[sm.end():fm.start()].strip()
    am = re.search(r"(?is)\s+as\s+__x\s*$", e)
    if not am:
        return None
    e = _strip_table_qualifiers(e[: am.start()].strip(), aliases)
    cols = _validate_refs(e, own_cols)
    if cols is None:
        return None
    try:
        probe = spark.table(table).select(F.expr(e))
        probe.schema  # force analysis
    except Exception:
        return None
    return e, cols


def _etree(
    heads: list, templates: dict, id_col: str
) -> "list[tuple[CorrNode, int | None]] | None":
    """DFS-preorder element to-one TREE over the templates:
    ``(node, parent_idx)`` per hop (parent None = the element row
    carries the fk). A block may nest several sibling lookups, each
    nesting further — a linear chain keeps the historical positional
    numbering bit-for-bit. None when any nested block is a to-many
    (arrays anchored under ELEMENT dims are out of shape)."""
    out: "list[tuple[CorrNode, int | None]]" = []

    def visit(node, parent) -> bool:
        if not node.to_one(id_col):
            return False
        idx = len(out)
        out.append((node, parent))
        for _k, (kind, v) in templates[node].entries:
            if kind == "node" and not visit(v, idx):
                return False
        return True

    for h in heads:
        if not visit(h, None):
            return None
    return out


def _parse_child_order(
    order_text: "str | None", cn: CorrNode
) -> "list[tuple[str, bool, bool]] | None":
    """Parse a to-many block's declared ``json_agg … ORDER BY`` into
    [(own_col, desc, nulls_first)] — every key must be a plain
    [qual.]column of the block's OWN relation (the only names in scope
    of the aggregate's argument list that the state holds); anything
    else raises _Bail so the view keeps the targeted/full lanes."""
    if order_text is None:
        return None
    from sinker_spark.compiler.correlate import _COL_PAT, _norm
    from sinker_spark.compiler.transpile import _parse_order_keys

    keys = _parse_order_keys(order_text)
    if keys is None:
        raise _Bail
    out = []
    for expr, desc, nfirst in keys:
        cm = _COL_PAT.match(expr)
        if not cm:
            raise _Bail
        qual = _norm(cm.group(1)) if cm.group(1) else None
        if qual is not None and qual not in {cn.table, cn.alias}:
            raise _Bail
        out.append((_norm(cm.group(2)), desc, nfirst))
    return out


class _Bail(Exception):
    """Internal: the SQL is outside the doc-tree shape — derivation
    returns None and the view keeps the targeted/full lanes."""


def derive_sql_doctree(
    spark: SparkSession, sql: str, id_col: str = "id"
) -> SqlDocTree | None:
    tree = parse_correlation_tree(sql, id_col)
    if tree is None:
        return None
    templates = parse_doc_templates(tree)
    if templates is None:
        return None

    def cols_of(t: str) -> dict[str, str] | None:
        try:
            return {f.name.lower(): f.dataType.simpleString()
                    for f in spark.table(t).schema.fields}
        except Exception:
            return None

    # PG binds unqualified outer refs innermost-scope first: if the
    # column also names a column of the subquery's own table, the ref
    # bound THERE and the parsed edge is wrong — same guard as
    # derive_affected_rows_keys._valid (compiler/correlate.py)
    for n in tree.nodes:
        if not n.outer_qualified:
            own = cols_of(n.table)
            if own is None or n.outer_col in own:
                return None

    # root WHERE: serve only rows passing it (the compiled view omits
    # them; without this the fold lane would upsert filtered-out docs).
    # A predicate beyond parent columns defers to the JOINED compile
    # below — it may reference main-FROM join-dim columns (``where
    # t.active``), resolvable once the root dim tree is numbered.
    where_expr: str | None = None
    where_cols: list[str] = []
    where_pending: str | None = None
    if tree.where_text is not None:
        compiled = _compile_pred(
            spark, tree.parent_table,
            {tree.parent_table, tree.parent_alias},
            tree.where_text, cols_of(tree.parent_table) or {}, id_col,
        )
        if compiled is None:
            where_pending = tree.where_text
        else:
            where_expr, where_cols = compiled

    # per-block FILTER conjuncts (``AND e.active``): compile each block's
    # non-correlation predicate against its OWN relation — the serve
    # applies it to the block's state rows, reproducing the compiled
    # view exactly (a to-one row failing its filter serves NULL, a
    # to-many row is excluded from its array). A predicate beyond own
    # columns defers to the CORRELATED compile below (``and e.grade >=
    # c.min_grade`` references the block's anchor), resolvable once the
    # tree is numbered.
    node_pred: "dict[int, str]" = {}
    node_pred_cols: "dict[int, list[str]]" = {}
    pending_corr: "dict[int, str]" = {}
    for n in tree.nodes:
        if not n.filters:
            continue
        own = cols_of(n.table)
        if own is None:
            return None
        text = " and ".join(f"({c})" for c in n.filters)
        compiled = _compile_pred(
            spark, n.table, {n.table, n.alias}, text, own, id_col,
        )
        if compiled is None:
            pending_corr[id(n)] = text
        else:
            node_pred[id(n)], node_pred_cols[id(n)] = compiled

    # template EXPRESSION values ('total', o.price * o.qty): compile
    # each against its block's OWN schema; the serve computes slot
    # columns (__x{j}) on the block's state rows before prefixing, so
    # build_struct reads them like plain columns. Out-of-reach
    # expressions (outer refs, subqueries, rand/uuid) bail.
    node_exprs: "dict[int, list[tuple[str, str]]]" = {}
    expr_slots: "dict[tuple[int, str], str]" = {}
    node_expr_cols: "dict[int, list[str]]" = {}
    root_exprs: "dict[str, str]" = {}
    root_expr_cols: "list[str]" = []
    for owner, tpl in templates.items():
        exprs = [(k, v) for k, (kind, v) in tpl.entries if kind == "expr"]
        if not exprs:
            continue
        tbl = tree.parent_table if owner is None else owner.table
        aliases = (
            {tree.parent_table, tree.parent_alias} if owner is None
            else {owner.table, owner.alias}
        )
        own = cols_of(tbl)
        if own is None:
            return None
        for j, (k, raw) in enumerate(exprs):
            comp = _compile_expr(spark, tbl, aliases, raw, own)
            if comp is None:
                return None
            if owner is None:
                root_exprs[k] = comp[0]
                root_expr_cols.extend(comp[1])
            else:
                key = (id(owner), k)
                if key in expr_slots:
                    return None  # duplicate json key: ambiguous slot
                slot = f"__x{j}"
                expr_slots[key] = slot
                node_exprs.setdefault(id(owner), []).append((slot, comp[0]))
                node_expr_cols.setdefault(id(owner), []).extend(comp[1])

    root_entries = [v for _k, (kind, v) in templates[None].entries if kind == "node"]
    to_one_entries = [n for n in root_entries if n.to_one(id_col)]
    child_nodes = [n for n in root_entries if not n.to_one(id_col)]
    join_nodes = [n for n in tree.nodes if n.span is None]

    # jcol columns referenced per join node (root template only)
    jcols: dict[int, list[str]] = {}
    for _k, (kind, v) in templates[None].entries:
        if kind == "jcol":
            node, col = v
            jcols.setdefault(id(node), []).append(col)

    # ---- root to-one TREE (main-FROM joins + correlated blocks) ------
    # DFS preorder; children ordering is deterministic: join dims in
    # parse order, then correlated blocks in template order — the same
    # order the DimLookup forest is emitted in, so RootDim.idx ==
    # views.dim_nodes(spec) numbering == state suffixes d{idx}/rp{idx}.
    root_dims: list[RootDim] = []

    def corr_kids(owner: CorrNode) -> list[CorrNode]:
        """To-one blocks nested in a correlated block's template. A
        nested to-many KEYED ON THE OWNER becomes a dim-anchored array
        (collected later from the template); one keyed elsewhere is out
        of shape."""
        kids = []
        for _k, (kind, v) in templates[owner].entries:
            if kind == "node":
                if not v.to_one(id_col):
                    if v.outer is owner and v.outer_col == id_col:
                        continue  # dim-anchored array, handled below
                    raise _Bail
                kids.append(v)
        return kids

    def visit(corr: CorrNode, parent_idx: "int | None") -> int:
        idx = len(root_dims)
        root_dims.append(RootDim(idx, corr, parent_idx))
        if corr.span is None:  # join dim: joins + root-template blocks
            kids = [j for j in join_nodes if j.outer is corr]
            kids += [t for t in to_one_entries if t.outer is corr]
        else:                   # correlated block: its nested blocks
            kids = corr_kids(corr)
        for k in kids:
            visit(k, idx)
        return idx

    try:
        anchors = [j for j in join_nodes if j.outer is None]
        anchors += [t for t in to_one_entries if t.outer is None]
        for a in anchors:
            visit(a, None)
    except _Bail:
        return None
    # (no orphan check needed: parse_doc_templates guarantees every
    # subquery block appears in exactly one template and is a direct
    # child of its owner, so the DFS + the to-many element chains below
    # reach every node)

    # deferred root WHERE over parent + join-dim columns: the serve
    # applies it AFTER the root-dim joins (prefixed refs); a dim delta
    # flipping the predicate re-serves the parent through the dim's
    # reverse-index walk, retracting the doc exactly as the compiled
    # view drops the row
    where_join_expr: str | None = None
    where_dim_cols: "dict[int, list[str]]" = {}
    if where_pending is not None:
        cj = _compile_where_joined(
            spark, tree, root_dims, cols_of, where_pending, id_col
        )
        if cj is None:
            return None
        where_join_expr, where_cols, where_dim_cols = cj

    def child_shape(cn: CorrNode, suffix: str) -> SqlChild:
        """Validate + shape one to-many block (recursing into nested
        to-many blocks in its element template): element to-one hops
        form a TREE (DFS preorder), every nested array keyed directly
        on this block's own id column."""
        nested_nodes = [v for _k, (kind, v) in templates[cn].entries if kind == "node"]
        to_ones = [n for n in nested_nodes if n.to_one(id_col)]
        to_manys = [n for n in nested_nodes if not n.to_one(id_col)]
        echain = _etree(to_ones, templates, id_col)
        if echain is None:
            raise _Bail
        subs = []
        for k, g in enumerate(to_manys):
            if g.outer is not cn or g.outer_col != id_col:
                raise _Bail  # nested array must key on its container's id
            subs.append(child_shape(g, f"{suffix}x{k}"))
        order_keys = _parse_child_order(templates[cn].order_text, cn)
        return SqlChild(cn, suffix, echain, subs,
                        agg=templates[cn].agg, order_keys=order_keys,
                        distinct=templates[cn].distinct)

    parent_children = [n for n in child_nodes if n.outer is None]
    sql_children: list[SqlChild] = []
    for i, cn in enumerate(parent_children):
        anchor = None
        if cn.outer_col != id_col:
            # non-key parent anchor (r7): fine when it names a parent
            # column — the serve joins on it and the walk gets an
            # anchor→key reverse index; anything else is out of grammar
            if cn.outer_col not in (cols_of(tree.parent_table) or {}):
                return None
            anchor = cn.outer_col
        try:
            sc = child_shape(cn, f"c{i}")
            if anchor is not None:
                sc = replace(sc, anchor=anchor)
            sql_children.append(sc)
        except _Bail:
            return None
    child_chains = [sc.echain for sc in sql_children]
    child_nodes = parent_children

    # ---- DIM-ANCHORED arrays: a to-many keyed on a to-one node — in
    # the ROOT template anchored on a main-FROM join dim (its alias is
    # in scope there), or inside a CORRELATED block's template keyed on
    # its owner. Suffix numbering d{idx}a{k} mirrors
    # ivm_flagship.child_nodes' enumeration of DimLookup.arrays.
    corr_rd = {id(rd.corr): rd for rd in root_dims}
    dim_sql_children: list[tuple[int, SqlChild, bool]] = []
    a_counts: dict[int, int] = {}

    def collect_anchored(tmpl_owner: "CorrNode | None") -> None:
        for _k, (kind, v) in templates[tmpl_owner].entries:
            if kind != "node" or v.to_one(id_col):
                continue
            if tmpl_owner is None and v.outer is None:
                continue  # parent-anchored, collected above
            rd = corr_rd.get(id(v.outer)) if v.outer is not None else None
            if rd is None or v.outer_col != id_col:
                raise _Bail
            k = a_counts.get(rd.idx, 0)
            a_counts[rd.idx] = k + 1
            dim_sql_children.append(
                (rd.idx, child_shape(v, f"d{rd.idx}a{k}"), tmpl_owner is None)
            )

    try:
        collect_anchored(None)
        for rd in root_dims:
            if rd.corr.span is not None:
                collect_anchored(rd.corr)
    except _Bail:
        return None

    # ---- CORRELATED block filters (r7): compile each pending filter
    # against (own, anchor) scopes now that every node's serve position
    # (dim idx / child suffix) is numbered. To-one blocks get a JOIN
    # predicate (dim row failing it serves NULL / drops the parent under
    # 'inner', exactly like the compiled subquery matching no row);
    # to-many blocks get an ELEMENT predicate evaluated against anchor
    # columns carried on the probe as __af_ slots. Anchor-side columns
    # are recorded so the anchor's state schema includes them.
    corr_join_pred: "dict[int, str]" = {}
    corr_elem_pred: "dict[int, str]" = {}
    corr_probe_cols: "dict[int, list[tuple[str, str]]]" = {}
    corr_own_cols: "dict[int, list[str]]" = {}
    anchor_extra: "dict[int, list[str]]" = {}
    corr_parent_cols: list[str] = []

    def _corr_compile(n: CorrNode, own_fmt, anchor_node: "CorrNode | None",
                      anchor_fmt) -> "tuple[str, list[str]] | None":
        if anchor_node is None:
            a_al = {tree.parent_table, tree.parent_alias}
            a_cols = cols_of(tree.parent_table)
        else:
            a_al = {anchor_node.table, anchor_node.alias}
            a_cols = cols_of(anchor_node.table)
        own = cols_of(n.table)
        if own is None or a_cols is None:
            return None
        comp = _compile_pred_corr(
            spark, n.table, {n.table, n.alias}, own, a_al, a_cols,
            own_fmt, anchor_fmt, pending_corr[id(n)],
        )
        if comp is None:
            return None
        pred, own_refs, a_refs = comp
        corr_own_cols[id(n)] = own_refs
        if anchor_node is None:
            corr_parent_cols.extend(a_refs)
        else:
            anchor_extra.setdefault(id(anchor_node), []).extend(a_refs)
        return pred, a_refs

    if pending_corr:
        handled: set[int] = set()
        for rd in root_dims:
            n = rd.corr
            if id(n) not in pending_corr:
                continue
            own_fmt = lambda c, p=f"__d{rd.idx}_": f"{p}{c}"
            if rd.parent is None:
                a_node, anchor_fmt = None, (lambda c: c)
            else:
                a_node = root_dims[rd.parent].corr
                anchor_fmt = lambda c, p=f"__d{rd.parent}_": f"{p}{c}"
            comp = _corr_compile(n, own_fmt, a_node, anchor_fmt)
            if comp is None:
                return None
            corr_join_pred[id(n)] = comp[0]
            handled.add(id(n))

        def corr_child(sc: SqlChild, container: "CorrNode | None") -> bool:
            cn, pre_c = sc.node, f"__{sc.suffix}_"
            if id(cn) in pending_corr:
                # anchor columns travel on the probe as __af_ slots
                comp = _corr_compile(
                    cn, lambda c, p=pre_c: f"{p}{c}", container,
                    lambda c: f"__af_{c}",
                )
                if comp is None:
                    return False
                corr_elem_pred[id(cn)] = comp[0]
                corr_probe_cols[id(cn)] = [(f"__af_{c}", c) for c in comp[1]]
                handled.add(id(cn))
            for j, (en, parent) in enumerate(sc.echain):
                if id(en) not in pending_corr:
                    continue
                own_fmt = lambda c, p=f"__{sc.suffix}d{j}_": f"{p}{c}"
                if parent is None:
                    a_node, anchor_fmt = cn, (lambda c, p=pre_c: f"{p}{c}")
                else:
                    a_node = sc.echain[parent][0]
                    anchor_fmt = lambda c, p=f"__{sc.suffix}d{parent}_": f"{p}{c}"
                comp = _corr_compile(en, own_fmt, a_node, anchor_fmt)
                if comp is None:
                    return False
                corr_join_pred[id(en)] = comp[0]
                handled.add(id(en))
            return all(corr_child(g, cn) for g in sc.children)

        for sc in sql_children:
            if not corr_child(sc, None):
                return None
        for idx, sc, _at_root in dim_sql_children:
            if not corr_child(sc, root_dims[idx].corr):
                return None
        if set(pending_corr) - handled:
            return None  # a filtered node outside every serve context

    def ddl(table: str, needed: list[str]) -> str | None:
        have = cols_of(table)
        if have is None or any(c not in have for c in needed):
            return None
        return ", ".join(f"{c} {have[c]}" for c in needed)

    def tpl_cols(node: CorrNode | None) -> list[str]:
        return [v for _k, (kind, v) in templates[node].entries if kind == "col"]

    def uniq(cols: list[str]) -> list[str]:
        seen: set[str] = set()
        return [c for c in cols if not (c in seen or seen.add(c))]

    parent_needed = uniq(
        [id_col] + tpl_cols(None) + where_cols + root_expr_cols
        + corr_parent_cols
        + [sc.anchor for sc in sql_children if sc.anchor]
        + [rd.corr.outer_col for rd in root_dims if rd.parent is None]
    )
    parent_ddl = ddl(tree.parent_table, parent_needed)
    if parent_ddl is None:
        return None

    # ---- DimLookup forest mirroring the RootDim DFS ------------------
    lookups: list[DimLookup] = []
    forest: list[DimLookup] = []
    for rd in root_dims:
        n = rd.corr
        own = tpl_cols(n) if n.span is not None else jcols.get(id(n), [])
        kid_fks = [r.corr.outer_col for r in root_dims if r.parent == rd.idx]
        d = ddl(n.table, uniq([id_col] + own + kid_fks
                              + node_pred_cols.get(id(n), [])
                              + node_expr_cols.get(id(n), [])
                              + where_dim_cols.get(rd.idx, [])
                              + corr_own_cols.get(id(n), [])
                              + anchor_extra.get(id(n), [])))
        if d is None:
            return None
        dl = DimLookup(n.table, fk=n.outer_col, key=id_col, row_schema=d)
        lookups.append(dl)
        (forest if rd.parent is None else lookups[rd.parent].children).append(dl)

    def tree_dims(
        etree: "list[tuple[CorrNode, int | None]]",
    ) -> list[DimLookup] | None:
        """Element-dim DimLookups mirroring the DFS preorder of
        ``etree`` (ChildArraySpec.dims holds the roots; children nest)
        — views.edim_nodes re-derives the identical numbering."""
        dims: list[DimLookup] = []
        roots: list[DimLookup] = []
        for j, (n, parent) in enumerate(etree):
            kid_fks = [m.outer_col for m, pp in etree if pp == j]
            needed = uniq(
                [id_col] + tpl_cols(n) + kid_fks
                + node_pred_cols.get(id(n), [])
                + node_expr_cols.get(id(n), [])
                + corr_own_cols.get(id(n), [])
                + anchor_extra.get(id(n), [])
            )
            d = ddl(n.table, needed)
            if d is None:
                return None
            dl = DimLookup(n.table, fk=n.outer_col, key=id_col, row_schema=d)
            dims.append(dl)
            (roots if parent is None else dims[parent].children).append(dl)
        return roots

    def alias_of(container: "CorrNode | None", node: CorrNode) -> str:
        for k, (kind, v) in templates[container].entries:
            if kind == "node" and v is node:
                return k
        raise _Bail

    def build_child_spec(sc: SqlChild, container: "CorrNode | None") -> ChildArraySpec:
        cn = sc.node
        needed = uniq(
            [cn.sub_col] + tpl_cols(cn)
            + [n.outer_col for n, pp in sc.echain if pp is None]
            + ([id_col] if sc.children else [])  # nested arrays key on it
            + node_pred_cols.get(id(cn), [])
            + node_expr_cols.get(id(cn), [])
            + corr_own_cols.get(id(cn), [])
            + anchor_extra.get(id(cn), [])
            + ([sc.agg[1]] if sc.agg and sc.agg[1] else [])
            + [k for k, _d, _nf in (sc.order_keys or [])]
        )
        d = ddl(cn.table, needed)
        edims = tree_dims(sc.echain)
        if d is None or edims is None:
            raise _Bail
        return ChildArraySpec(
            table=cn.table, fk=cn.sub_col, row_schema=d,
            alias=alias_of(container, cn), order=None, dims=edims,
            key=id_col if sc.children else None,
            children=[build_child_spec(g, cn) for g in sc.children],
            anchor_col=sc.anchor,
        )

    try:
        children = [build_child_spec(sc, None) for sc in sql_children]
        for idx, sc, at_root in dim_sql_children:
            lookups[idx].arrays.append(
                build_child_spec(sc, None if at_root else root_dims[idx].corr)
            )
    except _Bail:
        return None

    spec = DocTreeViewSpec(
        parent_table=tree.parent_table, key=id_col,
        row_schema_parent=parent_ddl, dim_forest=forest, children=children,
    )
    return SqlDocTree(spec, tree, templates, root_dims, child_nodes,
                      child_chains, where_expr=where_expr,
                      where_join_expr=where_join_expr,
                      sql_children=sql_children,
                      dim_sql_children=dim_sql_children,
                      node_pred=node_pred, node_exprs=node_exprs,
                      expr_slots=expr_slots, root_exprs=root_exprs,
                      corr_join_pred=corr_join_pred,
                      corr_elem_pred=corr_elem_pred,
                      corr_probe_cols=corr_probe_cols)


def _order_cmp(keys: "list[tuple[str, bool, bool]]"):
    """array_sort comparator honoring declared key directions and PG
    null placement, with the same element tie-break the transpiled
    compile emits (_ordered_agg_expr) — fold-vs-compile bit parity."""
    def comparator(l, r):  # noqa: ANN001 — Column lambdas
        chain = None

        def add(cond, val):
            nonlocal chain
            chain = (F.when(cond, F.lit(val)) if chain is None
                     else chain.when(cond, F.lit(val)))

        for i, (_k, desc, nfirst) in enumerate(keys):
            lo, ro = l[f"__o{i}"], r[f"__o{i}"]
            nl, nr = (-1, 1) if nfirst else (1, -1)
            lt, gt = (1, -1) if desc else (-1, 1)
            add(lo.isNull() & ro.isNotNull(), nl)
            add(lo.isNotNull() & ro.isNull(), nr)
            add(lo < ro, lt)
            add(lo > ro, gt)
        add(l["__e"] < r["__e"], -1)
        add(l["__e"] > r["__e"], 1)
        return chain.otherwise(F.lit(0)).cast("int")

    return comparator


_SAGG_FNS = {"count": F.count, "count_distinct": F.count_distinct,
             "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}


def _empty_fix(df: DataFrame, gv: str, sc: SqlChild, root_array: bool) -> DataFrame:
    """Post-join empty-group semantics, matching the transpiled compile:
    scalar ``count`` coalesces to 0 EVERYWHERE (Spark's depth-0 scalar
    COUNT returns 0; the nested derived-table join is coalesced by
    _agg_subquery_join); other scalar aggregates stay NULL; arrays
    coalesce to ``[]`` only at root-array anchors (nested arrays serve
    NULL through the derived-table join)."""
    if sc.agg:
        if sc.agg[0].startswith("count"):
            return df.withColumn(gv, F.coalesce(F.col(gv), F.lit(0)))
        return df
    if root_array:
        at = df.schema[gv].dataType
        return df.withColumn(gv, F.coalesce(F.col(gv), F.array().cast(at)))
    return df


def _prefixed(df: DataFrame, pre: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{pre}{c}") for c in df.columns])


def serve_docs_sql(
    sd: SqlDocTree, touched: DataFrame, rows_for: RowsFor
) -> DataFrame:
    """Rebuild the touched parents' documents in the TRANSPILED SQL's
    nested shape (module docstring) from state restricted to reachable
    keys. Output: (``spec.key``, ``doc``) — doc decimals already
    canonicalized to double, key NOT yet cast (the caller casts, same
    as the flat lane). A touched key absent from the output means the
    parent row is gone (only parents retract under SQL semantics)."""
    spec, templates, id_col = sd.spec, sd.templates, sd.spec.key
    states = {s.suffix: s for s in doc_tree_states(spec)}
    tkeys = touched.toDF(id_col)
    cur = expand_mult(rows_for(states["p"], tkeys))
    if sd.where_expr is not None:
        # root WHERE: a touched parent failing the predicate serves no
        # doc → the caller emits the DELETE (compiled-view parity)
        cur = cur.where(F.expr(sd.where_expr))
    # slim parent frame (state read + root filter, PRE-dim-joins): the
    # probe source for NON-KEY-anchored arrays — their probe values are
    # anchor columns, which tkeys doesn't carry
    parent_slim = cur

    def state_rows(state_key: str, probe: DataFrame, corr: CorrNode) -> DataFrame:
        """One block's live state rows restricted to probed keys, with
        the block's compiled FILTER conjuncts applied — so a to-one row
        failing its filter serves NULL and a to-many row is excluded
        from its array, exactly as the compiled view's inlined
        LEFT-JOIN/correlated-subquery predicates behave."""
        raw = expand_mult(rows_for(states[state_key], probe))
        pred = (sd.node_pred or {}).get(id(corr))
        if pred:
            raw = raw.where(F.expr(pred))
        for slot, e in (sd.node_exprs or {}).get(id(corr), []):
            raw = raw.withColumn(slot, F.expr(e))
        return raw

    def build_struct(
        node: CorrNode, pre_of: dict, arrays: "dict | None" = None
    ) -> F.Column:
        arrays = arrays or {}
        entries = []
        for k, (kind, v) in templates[node].entries:
            if kind == "col":
                entries.append(F.col(f"{pre_of[id(node)]}{v}").alias(k))
            elif kind == "expr":
                slot = (sd.expr_slots or {})[(id(node), k)]
                entries.append(F.col(f"{pre_of[id(node)]}{slot}").alias(k))
            elif id(v) in arrays:
                # a nested to-many block: the pre-built array column
                entries.append(F.col(arrays[id(v)]).alias(k))
            else:
                entries.append(build_struct(v, pre_of, arrays).alias(k))
        return F.struct(*entries)

    # ---- root to-one tree: join each dim's state frame onto the
    # parent rows in DFS preorder (the referrer's prefixed columns are
    # already present). Main-FROM 'inner' joins drop parent rows whose
    # dim is missing (compiled-view parity); everything else is LEFT.
    root_fields: dict[str, F.Column] = {}
    root_pre: dict = {}  # id(CorrNode) → column prefix, whole root tree
    dim_key_frames: dict = {}  # idx → slim reachable-key frame
    dim_frames: dict = {}      # idx → full prefixed dim frame (anchor slots)
    for rd in sd.root_dims:
        pre = f"__d{rd.idx}_"
        root_pre[id(rd.corr)] = pre
        fk = (
            F.col(rd.corr.outer_col) if rd.parent is None
            else F.col(f"__d{rd.parent}_{rd.corr.outer_col}")
        )
        # materialize the (reachable-keys-sized) probe: the bucket
        # collect inside rows_for and the final doc plan would otherwise
        # EACH re-execute the cur-so-far join chain per dim level
        probe = cur.select(fk.alias(id_col)).where(
            F.col(id_col).isNotNull()
        ).distinct().localCheckpoint(eager=True)
        dframe = _prefixed(state_rows(f"d{rd.idx}", probe, rd.corr), pre)
        dim_frames[rd.idx] = dframe
        dim_key_frames[rd.idx] = dframe.select(f"{pre}{id_col}")
        how = "inner" if rd.corr.join_how == "inner" else "left"
        cond = fk == F.col(f"{pre}{id_col}")
        cpred = (sd.corr_join_pred or {}).get(id(rd.corr))
        if cpred:
            # correlated block filter: part of the JOIN condition, so a
            # dim row failing it serves NULL (or drops the parent under
            # 'inner') — the compiled subquery matching no row
            cond = cond & F.expr(cpred)
        cur = cur.join(dframe, cond, how)
    if sd.where_join_expr is not None:
        # root WHERE over join-dim columns: evaluated on the joined
        # frame, BEFORE the array probes (a filtered-out parent serves
        # nothing, so its arrays need no probing); a touched parent
        # failing it is absent from the output → the caller DELETEs
        cur = cur.where(F.expr(sd.where_join_expr))

    def array_frame(sc: SqlChild, probe: DataFrame) -> DataFrame:
        """One to-many block's array rows restricted to the probed
        container keys → 2-col frame ``(__k, __arr)``: container key,
        sorted element array. Recurses into nested to-many blocks —
        their arrays are joined onto the element rows by THIS block's id
        and embedded in the element struct. A nested array with zero
        rows serves NULL (the transpiled compile's derived-table LEFT
        JOIN does too — PG json_agg-over-empty parity), unlike the
        root-level arrays, which coalesce to [] (Spark's
        aggregate-over-empty semantics in the compiled scalar
        subquery)."""
        cn = sc.node
        pre_c = f"__{sc.suffix}_"
        pcols = (sd.corr_probe_cols or {}).get(id(cn), [])
        if pcols:
            # correlated element filter: the probe carries the anchor's
            # filter columns as __af_ slots — join them onto the state
            # rows by container key, filter, drop the slots
            kp = probe.where(F.col(cn.sub_col).isNotNull()).distinct() \
                .localCheckpoint(eager=True)
            elem = _prefixed(state_rows(sc.suffix, kp.select(cn.sub_col), cn), pre_c)
            elem = elem.join(
                F.broadcast(kp),
                F.col(f"{pre_c}{cn.sub_col}") == F.col(cn.sub_col), "inner",
            ).drop(cn.sub_col)
            elem = elem.where(
                F.expr((sd.corr_elem_pred or {})[id(cn)])
            ).drop(*[slot for slot, _c in pcols])
        else:
            elem = _prefixed(state_rows(sc.suffix, probe, cn), pre_c)
        elem_keys = (
            elem.select(f"{pre_c}{id_col}") if sc.children else None
        )
        pre_of = {id(cn): pre_c}
        arrays: dict = {}
        for j, (n, parent) in enumerate(sc.echain):
            # DFS preorder: the referrer's prefixed columns (the element
            # row, or an earlier dim hop) are already joined
            pre = f"__{sc.suffix}d{j}_"
            pre_of[id(n)] = pre
            fk = (
                F.col(f"{pre_c}{n.outer_col}") if parent is None
                else F.col(f"__{sc.suffix}d{parent}_{n.outer_col}")
            )
            probe = elem.select(fk.alias(id_col)).where(
                F.col(id_col).isNotNull()
            ).distinct().localCheckpoint(eager=True)
            dframe = _prefixed(state_rows(f"{sc.suffix}d{j}", probe, n), pre)
            cond = fk == F.col(f"{pre}{id_col}")
            cpred = (sd.corr_join_pred or {}).get(id(n))
            if cpred:
                cond = cond & F.expr(cpred)
            elem = elem.join(dframe, cond, "left")
        for g in sc.children:
            gp = (sd.corr_probe_cols or {}).get(id(g.node), [])
            if gp:
                # nested correlated filter: carry the CONTAINER element's
                # anchor columns on the probe
                gprobe = elem.select(
                    F.col(f"{pre_c}{id_col}").alias(g.node.sub_col),
                    *[F.col(f"{pre_c}{c}").alias(slot) for slot, c in gp],
                )
            else:
                gprobe = elem_keys.toDF(g.node.sub_col)
            gprobe = gprobe.where(
                F.col(g.node.sub_col).isNotNull()
            ).distinct().localCheckpoint(eager=True)
            gk, gv = f"__k_{g.suffix}", f"__arr_{g.suffix}"
            garr = array_frame(g, gprobe).toDF(gk, gv)
            elem = elem.join(
                garr, F.col(f"{pre_c}{id_col}") == F.col(gk), "left"
            ).drop(gk)
            elem = _empty_fix(elem, gv, g, False)
            arrays[id(g.node)] = gv
        if sc.agg:
            fname, argc = sc.agg
            val = (_SAGG_FNS[fname](F.col(f"{pre_c}{argc}")) if argc
                   else F.count(F.lit(1)))
            return elem.groupBy(
                F.col(f"{pre_c}{cn.sub_col}").alias("__k")
            ).agg(val.alias("__arr"))
        estruct = build_struct(cn, pre_of, arrays)
        if sc.order_keys:
            okeys = [F.col(f"{pre_c}{k}").alias(f"__o{i}")
                     for i, (k, _d, _nf) in enumerate(sc.order_keys)]
            coll = F.collect_list(F.struct(*okeys, estruct.alias("__e")))
            arr = F.transform(
                F.array_sort(coll, _order_cmp(sc.order_keys)), lambda x: x["__e"]
            )
        elif sc.distinct:
            # compile parity: sort_array(collect_list(DISTINCT e)) ==
            # sorted dedup of the element values
            arr = F.sort_array(F.array_distinct(F.collect_list(estruct)))
        else:
            arr = F.sort_array(F.collect_list(estruct))
        return elem.groupBy(F.col(f"{pre_c}{cn.sub_col}").alias("__k")).agg(
            arr.alias("__arr")
        )

    # ---- DIM-ANCHORED arrays: probe by the dim frame's prefixed id,
    # join onto cur. Declared-at-root (join-dim-anchored) arrays are
    # root fields and coalesce to [] like other root arrays; ones inside
    # a correlated block's template embed in that block's struct and
    # stay NULL over empty (derived-table join parity).
    dim_arr_cols: dict = {}
    for idx, sc, at_root in (sd.dim_sql_children or []):
        # probe from the dim state's SLIM frame, not from ``cur`` —
        # probing the widening doc join re-executes it per state read
        pcols = (sd.corr_probe_cols or {}).get(id(sc.node), [])
        if pcols:
            probe = dim_frames[idx].select(
                F.col(f"__d{idx}_{id_col}").alias(sc.node.sub_col),
                *[F.col(f"__d{idx}_{c}").alias(slot) for slot, c in pcols],
            )
        else:
            probe = dim_key_frames[idx].toDF(sc.node.sub_col)
        probe = probe.where(
            F.col(sc.node.sub_col).isNotNull()
        ).distinct()
        gk, gv = f"__k_{sc.suffix}", f"__arr_{sc.suffix}"
        arr = array_frame(sc, probe).toDF(gk, gv)
        cur = cur.join(arr, F.col(f"__d{idx}_{id_col}") == F.col(gk), "left").drop(gk)
        cur = _empty_fix(cur, gv, sc, at_root and not sc.agg)
        if at_root:
            root_fields[id(sc.node)] = F.col(gv)
        else:
            dim_arr_cols[id(sc.node)] = gv

    # ROOT-TEMPLATE correlated blocks are the compile's OUTERMOST scalar
    # subqueries: NULL field when the dim row is missing, doc survives;
    # nested blocks (rewritten to LEFT JOIN + named_struct) serve
    # structs of NULLs unconditionally (build_struct recursion)
    for rd in sd.root_dims:
        if rd.corr.span is not None and any(
            kind == "node" and v is rd.corr
            for _k, (kind, v) in templates[None].entries
        ):
            s0 = build_struct(rd.corr, root_pre, dim_arr_cols)
            root_fields[id(rd.corr)] = F.when(
                F.col(f"__d{rd.idx}_{id_col}").isNotNull(), s0
            )

    sql_children = sd.sql_children
    if sql_children is None:  # pre-nesting callers constructing SqlDocTree by hand
        sql_children = [
            SqlChild(cn, f"c{i}",
                     [(n, j - 1 if j else None) for j, n in enumerate(chain)],
                     [])
            for i, (cn, chain) in enumerate(zip(sd.child_nodes, sd.child_chains))
        ]
    for i, sc in enumerate(sql_children):
        cn = sc.node
        acol = sc.anchor or id_col
        pcols = (sd.corr_probe_cols or {}).get(id(cn), [])
        if pcols:
            # anchor = the parent row: carry its filter columns (bare in
            # ``cur``) as slots — post-root-WHERE, so filtered-out
            # parents probe nothing
            probe_c = cur.select(
                F.col(acol).alias(cn.sub_col),
                *[F.col(c).alias(slot) for slot, c in pcols],
            )
        elif sc.anchor is not None:
            # non-key anchor: probe with the parents' ANCHOR values from
            # the slim pre-join parent frame
            probe_c = parent_slim.select(F.col(acol).alias(cn.sub_col))
        else:
            probe_c = tkeys.select(F.col(id_col).alias(cn.sub_col))
        gk, gv = f"__k{i}", f"__arr{i}"
        arr = array_frame(sc, probe_c).toDF(gk, gv)
        cur = cur.join(arr, F.col(acol) == F.col(gk), "left").drop(gk)
        cur = _empty_fix(cur, gv, sc, True)
        root_fields[id(cn)] = F.col(gv)

    entries = []
    for k, (kind, v) in templates[None].entries:
        if kind == "col":
            entries.append(F.col(v).alias(k))
        elif kind == "expr":
            entries.append(F.expr((sd.root_exprs or {})[k]).alias(k))
        elif kind == "jcol":
            node, col = v
            entries.append(F.col(f"{root_pre[id(node)]}{col}").alias(k))
        else:
            entries.append(root_fields[id(v)].alias(k))
    out = cur.select(F.col(id_col), F.struct(*entries).alias("doc"))

    from sinker_spark.views import _decimals_to_double

    _, cast, changed = _decimals_to_double(out.schema["doc"].dataType, F.col("doc"))
    if changed:
        out = out.select(F.col(id_col), cast.alias("doc"))
    return out
