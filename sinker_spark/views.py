"""View definitions — the user-facing declaration unit.

Reference model: one ``{view}.sql`` SELECT producing exactly (id, doc)
per view (sinker.py:96-98, query_templates.py:11), mapped to one sink
index via views_to_indices.json (runner.py:30-31). Here a view is:

    ViewDef(name, sql=..., key="id", index=...)   # SQL text (transpiled)
    ViewDef(name, fn=lambda spark: df, ...)       # or a DataFrame program

Dependencies (which source tables dirty this view) are auto-extracted
from the SQL via compiler.lineage (the reference's parse_schema_tables,
utils.py:7-20); DataFrame-program views pass ``deps`` explicitly.

``compile()`` returns the canonical 2-column (id, doc) DataFrame with
decimals cast to double inside the doc struct — the reference's JSON
documents render numeric(p,s) as floats (test_e2e.py:79: 3.50 → 3.5).

NULL group/join keys: SQL makes NULL its own GROUP BY group, and the
delta lanes maintain it like any other (their internal joins are
null-safe, ivm_delta.null_safe_join). The served doc id is the keys'
'|'-join via ``concat_ws``, which DROPS null parts — a single NULL key
serves id ``''``, and a view's recompute fn must build ids the same way
(``F.concat_ws("|", *keys)``) so lane and recompute ids agree. With
MULTIPLE nullable key columns, ('a', NULL) and (NULL, 'a') both render
'a': if that ambiguity is real in your data, disambiguate in the view
(e.g. ``coalesce(k, '∅')`` inside both the group keys and the id).
Internal lane-state stores are immune — their row ids are md5 of the
key struct's JSON (SyncEngine._state_row_id), never concat_ws.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import re

from sinker_spark.compiler.lineage import parse_schema_tables
from sinker_spark.compiler.transpile import transpile


def _selects_parent_id(sql: str) -> bool:
    """True iff the view's FIRST select item — its key output — is the
    parent row id column: bare ``id`` / ``tbl.id`` / ``"id"``, optionally
    aliased. Only then is the reference's targeted-refresh convention
    "changed parent ids ARE the view keys" (person_mv.sql:1,
    sinker.py:110-120) sound. A single-table view keyed by anything else
    (e.g. an AGGREGATE view keyed by a group value) must NOT auto-derive
    it: a CDC batch names changed ROW ids, and scoping the recompute to
    those values as VIEW keys silently misses the real changes — found by
    tools/fuzz_view_engine.py phase 3 (stale sink after mutation)."""
    # find the MAIN query's SELECT: the first one at paren-depth 0 —
    # a regex search would land on a CTE body's SELECT ("WITH b AS
    # (SELECT id …) SELECT <non-id> …") and re-enable the unsound
    # convention for a view keyed by something else
    pat = re.compile(r"\bselect\s+(?:distinct\s+)?", re.IGNORECASE)
    m, depth, i = None, 0, 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            # skip the literal, honoring SQL doubled-quote escapes
            # ('it''s') — a naive find() would terminate at the first
            # inner quote and desynchronize the scan, mis-identifying
            # the first select item and wrongly enabling the
            # id-from-parent targeted-refresh convention (ADVICE r4)
            j = sql.find("'", i + 1)
            while j != -1 and j + 1 < len(sql) and sql[j + 1] == "'":
                j = sql.find("'", j + 2)
            i = (j if j != -1 else len(sql) - 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(sql, i)
            if m:
                break
        i += 1
    if not m:
        return False
    rest = sql[m.end():]
    # first top-level comma-separated item (parens/strings respected)
    depth, i, end = 0, 0, len(rest)
    while i < len(rest):
        c = rest[i]
        if c == "'":
            j = rest.find("'", i + 1)
            while j != -1 and j + 1 < len(rest) and rest[j + 1] == "'":
                j = rest.find("'", j + 2)
            i = (j if j != -1 else len(rest) - 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            if c == ",":
                end = i
                break
            if re.match(r"\bfrom\b", rest[i:], re.IGNORECASE) and (i == 0 or not rest[i - 1].isalnum()):
                end = i
                break
        i += 1
    item = rest[:end].strip()
    item = re.sub(r"\s+as\s+\S+\s*$", "", item, flags=re.IGNORECASE)
    return re.fullmatch(r'(?:[A-Za-z_]\w*\.)?"?id"?', item.strip(), re.IGNORECASE) is not None


def _decimals_to_double(dt: T.DataType, col: Column) -> tuple[T.DataType, Column, bool]:
    """Recursively rebuild ``col`` with every DecimalType cast to double."""
    if isinstance(dt, T.DecimalType):
        return T.DoubleType(), col.cast("double"), True
    if isinstance(dt, T.StructType):
        changed = False
        fields, cols = [], []
        for f_ in dt.fields:
            ndt, ncol, ch = _decimals_to_double(f_.dataType, col.getField(f_.name))
            changed |= ch
            fields.append(T.StructField(f_.name, ndt, f_.nullable))
            cols.append(ncol.alias(f_.name))
        if not changed:
            return dt, col, False
        rebuilt = F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*cols))
        return T.StructType(fields), rebuilt, True
    if isinstance(dt, T.ArrayType):
        ndt, _, ch = _decimals_to_double(dt.elementType, F.lit(None))
        if not ch:
            return dt, col, False
        new_dt = T.ArrayType(ndt, dt.containsNull)
        return new_dt, col.cast(new_dt), True
    return dt, col, False


@dataclass
class AggViewSpec:
    """Declares a view as a keyed aggregate over one fact table, making
    it eligible for the delta-maintenance lane (ivm_delta): CDC batches
    fold into stored (count, sums) state as signed deltas — O(batch),
    no fact scan. Requires before-images on deletes/updates (Debezium
    with REPLICA IDENTITY FULL → ``payload_before``); batches without
    them fall back to the authoritative recompute lane.

    - ``table``: fact table name (resolved via ``spark.table``)
    - ``keys``: group-by columns; the doc id is their '|'-join
    - ``sums``: state column → source column or SQL expression, pre-cast
      to DECIMAL for exact ± folding (e.g. ``CAST(v AS DECIMAL(18,2))``)
    - ``maxes``/``mins``: state column → numeric column or expression
      for per-group extremes. These are NOT self-maintainable under
      deletes (classic IVM result): inserts fold exactly (monotone),
      and a delete that reaches the stored extreme marks the group
      dirty for a key-scoped recompute against the fact table inside
      the lane (ivm_delta.fold_agg_minmax / recompute_agg_groups — the
      same hybrid as the top-k lane's heal, so the lane inherits its
      live-fact contract).
    - ``row_schema``: DDL schema for parsing CDC payload JSON into fact
      rows (only the columns ``keys``/``sums``/``maxes``/``mins``
      reference are needed)
    - ``having``: optional SQL predicate over the EMITTED doc columns
      (``keys…, n_rows, <sums>, <maxes>, <mins>`` — sums/extremes seen
      as doubles, sums NULL when all inputs were). Only groups
      satisfying it are served; the lane emits a DELETE when a touched
      group crosses out of the predicate and an upsert when it crosses
      in. State is kept for ALL groups (a failing group must be able to
      cross back), so maintenance cost is unchanged. The view's sql/fn
      (the recompute lane) must apply the same filter (SQL ``HAVING``).

    The emitted document is ``struct(keys…, n_rows, <sums as double>,
    <maxes as double>, <mins as double>)``; a view's sql/fn (the
    recompute lane) must produce the same shape.
    """

    table: str
    keys: list[str]
    sums: dict[str, str]
    row_schema: str
    maxes: dict[str, str] = field(default_factory=dict)
    mins: dict[str, str] = field(default_factory=dict)
    having: str | None = None


@dataclass
class DistinctViewSpec:
    """Declares a view as per-key APPROXIMATE distinct counts over one
    fact table, eligible for the HLL register lane (ivm_hll): INSERT-only
    CDC batches MAX-merge into stored registers — O(batch), no fact
    scan, and idempotent under at-least-once replay. Registers are
    monotone, so any DELETE or UPDATE in the batch (either could remove
    a counted value) falls back to the recompute lane, which rebuilds
    the registers from the fact table.

    With ``exact=True`` the view maintains EXACT distinct counts via
    support-count state instead (ivm_delta.initial_distinct_state /
    apply_distinct_delta): one state row per distinct (group, value)
    with its multiplicity. That makes deletes self-maintainable — a
    value leaves the distinct set exactly when its support reaches 0 —
    at the cost of state sized by the distinct (group, value) keyspace
    (the HLL lane's registers stay O(groups·buckets)). The exact lane
    requires before-images on deletes/updates (same contract as
    :class:`AggViewSpec`) and is guarded against at-least-once replay
    (the signed fold is not idempotent).

    - ``table``: fact table name
    - ``keys``: group-by columns; the doc id is their '|'-join
    - ``value_col``: the column whose distinct values are counted
    - ``row_schema``: DDL schema for parsing CDC payload JSON
    - ``exact``: False → HLL register lane; True → support-count lane

    The emitted document is ``struct(keys…, n_distinct_est double)`` for
    the HLL lane — the estimator is the cross-engine-verified math of
    the ``hll_manual_distinct_customers`` gate query — and
    ``struct(keys…, n_rows bigint, n_distinct bigint)`` for the exact
    lane (SQL parity: a group lives while any row does; NULL values
    never count toward ``n_distinct``). A view's sql/fn (the recompute
    lane) must produce the matching shape.
    """

    table: str
    keys: list[str]
    value_col: str
    row_schema: str
    exact: bool = False


@dataclass
class MembershipViewSpec:
    """Declares a view as a maintained MEMBERSHIP filter (Bloom word
    relation) over one fact column, eligible for the bit_or lane
    (ivm_bloom): INSERT-only CDC batches OR new bits into the stored
    words — O(batch), no fact scan, idempotent under at-least-once
    replay (bit_or is idempotent). Bits are monotone, so any DELETE or
    UPDATE in the batch falls back to the recompute lane, which rebuilds
    the words from the fact table.

    - ``table``: fact table name
    - ``value_col``: the column whose values form the membership set
    - ``m_bits``: filter width (words = m_bits/32 rows — the view is
      always tiny and broadcastable by consumers)
    - ``row_schema``: DDL schema for parsing CDC payload JSON

    The emitted documents are ``struct(word_idx int, word bigint)`` —
    the exact relation operators/bloom.probe consumes; a hit means
    "maybe present, verify exact", so maintenance false positives can
    never corrupt a consumer's answer.
    """

    table: str
    value_col: str
    m_bits: int
    row_schema: str


@dataclass
class TopKViewSpec:
    """Declares a view as "top k rows per group, ranked by a score
    column" — leaderboards, latest-N-per-entity — eligible for the
    buffered top-(k+buffer) lane (ivm_topk): inserts re-rank only the
    touched groups' ≤(k+buffer) stored rows, deletes backfill from the
    buffer, and only buffer-exhausted groups pay a key-scoped recompute
    against the catalog fact table (which the lane assumes mirrors the
    applied CDC, the same contract as every recompute lane). Same
    before-image requirement as :class:`AggViewSpec`.

    - ``table``: fact table name (``spark.table``-resolvable)
    - ``keys``: group columns; the doc id is their '|'-join
    - ``order_col``: ranking column (descending; must be present in
      ``row_schema``)
    - ``id_col``: row identity + deterministic tiebreak column
    - ``k`` / ``buffer``: served size / delete-absorbing slack
    - ``row_schema``: DDL schema for parsing CDC payload JSON

    The emitted document is ``struct(keys…, top: array<struct(rank,
    <id_col>, <order_col>)>)`` sorted by rank; a view's sql/fn (the
    recompute lane) must produce the same shape.
    """

    table: str
    keys: list[str]
    order_col: str
    id_col: str
    k: int
    buffer: int
    row_schema: str


@dataclass
class JoinViewSpec:
    """Declares a view as an equi-join of two base tables, making it
    eligible for the delta-join lane (ivm_delta.join_delta): CDC batches
    refresh the view by the bilinear rule Δ(A⋈B) = ΔA⋈B ⊎ A⋈ΔB ⊎ ΔA⋈ΔB
    over signed multiplicities — O(|Δ|·fan-out), the join product is
    never recomputed. Base-table relations are themselves maintained as
    multiplicity state from the stream (initialized from the catalog
    tables at the snapshot point), so no base re-scan happens per batch.
    Same before-image contract as :class:`AggViewSpec`.

    - ``table_a``/``table_b``: base table names (``spark.table``-resolvable)
    - ``on``: equi-join columns (same names on both sides)
    - ``row_schema_a``/``row_schema_b``: DDL schemas for parsing CDC
      payload JSON into base rows (only needed columns)
    - ``key_cols``: join-output columns whose '|'-join forms the doc id
      (must be unique per joined row, e.g. both sides' PKs; for
      ``how='left'`` a padded row's b-side key cols are NULL and drop
      out of the concat, so its doc id is the left key alone — distinct
      from every matched id by construction)
    - ``how``: ``'inner'`` (default), ``'left'`` or ``'full'``.
      Outer views maintain unmatched rows as NULL-padded docs with an
      explicit ``__matched`` flag via ivm_delta.left_join_delta /
      full_join_delta — the padded sets change only where a join key's
      other-side multiplicity crosses zero, so refresh stays
      O(|Δ|·fan-in). For a RIGHT join, declare the right table as
      ``table_a`` and use ``'left'`` (the rule is symmetric).
    """

    table_a: str
    table_b: str
    on: list[str]
    row_schema_a: str
    row_schema_b: str
    key_cols: list[str]
    how: str = "inner"

    def __post_init__(self) -> None:
        if self.how not in ("inner", "left", "full"):
            raise ValueError(
                f"JoinViewSpec.how must be 'inner', 'left' or 'full', got {self.how!r}"
            )


@dataclass
class JoinChainViewSpec:
    """Declares a view as an N-WAY INNER equi-join chain
    T1 ⋈ T2 ⋈ … ⋈ Tn, maintained by CASCADING the bilinear rule through
    stored intermediate join states: the lane keeps J_i = T1⋈…⋈T_i as
    multiplicity state for every prefix, and each stage's signed delta
    (expanded back into change rows) becomes the left-side change feed
    of the next stage:

        ΔJ_{i+1} = ΔJ_i ⋈ T_{i+1}  ⊎  J_i ⋈ ΔT_{i+1}  ⊎  ΔJ_i ⋈ ΔT_{i+1}

    so a batch refreshes an arbitrary-arity join in
    O(|Δ| · total fan-out) — no join product is ever recomputed at any
    stage. This is the n-way generalization of :class:`JoinViewSpec`
    (which stays the 2-table fast path and the one with outer-join
    support; chains are inner-join only). Same before-image contract
    as :class:`AggViewSpec`.

    - ``tables``: n ≥ 2 base table names, joined left-to-right
    - ``ons``: n−1 join-key lists; ``ons[i]`` joins the running chain
      with ``tables[i+1]`` (same key names on both sides)
    - ``row_schemas``: one DDL schema per table for CDC payload parsing;
      column names must be DISJOINT across tables except the join keys
    - ``key_cols``: final-row columns whose '|'-join forms the doc id
      (unique per joined row — e.g. every table's PK). ROW MODE: the
      view serves the joined rows themselves.
    - ``keys``/``sums``/``having``: AGGREGATE MODE (mutually exclusive
      with ``key_cols``) — the view serves γ_keys(T1⋈…⋈Tn) instead of
      the joined rows: the final stage's signed delta pipes into the
      linear aggregate fold exactly as :class:`JoinAggViewSpec` does
      for 2 tables (``keys``: group-by columns over join-output
      columns; ``sums``: state column → SQL sum expression, pre-cast to
      DECIMAL; ``having``: optional served-set predicate over the doc
      columns with exact boundary-crossing retraction). Refresh stays
      O(|Δ|·fan-out): only one extra keyed state (the aggregate) is
      maintained on top of the prefix states.

    In row mode the emitted document is
    ``struct(<final join row>, n_rows bigint)`` with ``n_rows`` the
    row's join multiplicity, exactly as :class:`JoinViewSpec` emits; in
    aggregate mode it is ``struct(keys…, n_rows, <sums as double>)``,
    exactly as :class:`JoinAggViewSpec` emits.
    """

    tables: list[str]
    ons: list[list[str]]
    row_schemas: list[str]
    key_cols: list[str] | None = None
    keys: list[str] | None = None
    sums: dict[str, str] | None = None
    having: str | None = None

    def __post_init__(self) -> None:
        if len(self.tables) < 2:
            raise ValueError("JoinChainViewSpec needs at least 2 tables")
        if len(self.ons) != len(self.tables) - 1:
            raise ValueError(
                f"JoinChainViewSpec needs len(tables)-1 join-key lists, got "
                f"{len(self.ons)} for {len(self.tables)} tables"
            )
        if len(self.row_schemas) != len(self.tables):
            raise ValueError("JoinChainViewSpec needs one row_schema per table")
        if (self.key_cols is None) == (self.keys is None):
            raise ValueError(
                "JoinChainViewSpec needs exactly one of key_cols (row mode) "
                "or keys (aggregate mode)"
            )
        if self.keys is None and (self.sums or self.having):
            raise ValueError(
                "JoinChainViewSpec sums/having require aggregate mode (keys)"
            )
        if self.keys is not None and self.sums is None:
            self.sums = {}


@dataclass
class NestedDocViewSpec:
    """Declares a view as a PARENT-PLUS-NESTED-CHILD-ARRAY document —
    THE reference view shape (the flagship order document: order/
    customer fields plus a ``lineitems`` array, reference
    query_templates.py:11) — maintained O(batch) from stored
    multiplicity states (see ivm_doc module docstring): the batch's
    touched parent keys re-serve their docs by joining the parent and
    child STATES restricted to those keys, so neither base table is
    rescanned (the targeted-refresh lane's remaining cost) and the
    child array is rebuilt only where it changed.

    - ``parent_table``/``child_table``: base tables; the parent key
      columns (``on``) must be UNIQUE per parent row — they become the
      doc id (duplicates would collide on the sink key)
    - ``on``: shared key columns (parent PK = child FK, same names)
    - ``row_schema_parent``/``row_schema_child``: DDL schemas for CDC
      payload parsing; non-key column names must be disjoint
    - ``child_alias``: doc field carrying the child array
    - ``child_order``: child columns that sort the array (default: all
      child payload columns — a total order, so the served array is
      canonical under redelivery)

    The emitted document is ``struct(<parent row>, child_alias:
    array<struct<child payload>>)``; childless parents serve an empty
    array (reference parity: ``coalesce(json_agg(...), '[]')``). Same
    before-image contract, replay guard and fallback behavior as the
    other delta lanes.
    """

    parent_table: str
    child_table: str
    on: list[str]
    row_schema_parent: str
    row_schema_child: str
    child_alias: str = "children"
    child_order: list[str] | None = None


@dataclass
class DimLookup:
    """One to-one lookup hop in a :class:`DocTreeViewSpec` chain/tree:
    ``fk`` is the referencing column IN THE REFERRER relation (the
    parent/child for an anchor hop, the referrer dim's table after),
    ``key`` the dim's unique key column, ``row_schema`` the DDL of the
    dim columns the document projects (must include ``key``, plus every
    deeper hop's ``fk``). ``children``: further to-one lookups whose fk
    is a column of THIS dim's table — only meaningful inside
    :attr:`DocTreeViewSpec.dim_forest` (tree form); entries of the
    legacy linear ``dims`` chain must leave it empty.

    ``arrays``: to-many child arrays ANCHORED AT THIS DIM — rows of each
    array's ``table`` whose ``fk`` equals this dim's ``key`` value (a
    supplier doc whose nation object carries the nation's customers[]).
    Maintained by the same fold: the array's delta values are dim keys,
    which ascend to parent docs through the dim's existing ``rp``
    reverse-index walk — no new index needed at this level."""

    table: str
    fk: str
    key: str
    row_schema: str
    children: list["DimLookup"] = field(default_factory=list)
    arrays: list["ChildArraySpec"] = field(default_factory=list)


@dataclass
class ChildArraySpec:
    """One to-many child array in a :class:`DocTreeViewSpec`: rows of
    ``table`` whose ``fk`` equals the CONTAINER's key (the parent key at
    the top level, the containing child's ``key`` when nested) become an
    array of structs under ``alias``, each element carrying the child
    payload (minus ``fk``) plus its own to-one ``dims`` — a linear
    chain, or a TREE when entries carry ``children`` (normalized by
    :func:`edim_nodes`; an element with several independent lookups)
    (LEFT-joined: a missing element dim serves NULL fields, reference
    course_mv's correlated-subquery semantics). ``order``: child columns
    forming a total order within one container (default: all payload
    columns).

    NESTED to-many: ``children`` hangs further arrays off each element
    (customer doc → orders[] → lineitems[] — reference README person
    example generalized one level down). A child that declares
    ``children`` must also declare ``key`` — its own unique key column
    (must appear in ``row_schema``) — which the nested arrays' ``fk``
    references and which anchors the child→container reverse index the
    fold lane walks. Depth is unbounded (the maintenance recursion is
    uniform per level)."""

    table: str
    fk: str
    row_schema: str
    alias: str
    order: list[str] | None = None
    dims: list[DimLookup] = field(default_factory=list)
    key: str | None = None
    children: list["ChildArraySpec"] = field(default_factory=list)
    # the CONTAINER column ``fk`` equals — default (None) the
    # container's key. A non-key anchor (``… where sale.region =
    # parent.region`` with parent keyed on id) is supported at the TOP
    # level only: the fold maintains an anchor→parent-key reverse index
    # (``ra{suffix}``) so child deltas still walk to the affected docs
    # with bucket-pruned reads instead of a parent-state scan.
    anchor_col: str | None = None

    def __post_init__(self) -> None:
        if self.children and not self.key:
            raise ValueError(
                f"ChildArraySpec({self.table}): nested children require "
                "an explicit unique `key` column on the containing child"
            )


@dataclass
class DocTreeViewSpec:
    """Declares THE COMPLETE reference document shape (course_mv.sql:
    1-26 ≙ the flagship order doc) as one incrementally-maintained
    view: a parent row + a to-one dim CHAIN (course→teacher→person ≙
    orders→customer→nation→region, INNER-joined: a broken chain
    retracts the doc) + N to-many child ARRAYS (enrollments ≙
    lineitems), each element optionally carrying its own to-one dim
    chain (enrollment→student→person ≙ lineitem→part).

    Maintained as a PURE DELTA FOLD on every constituent table —
    including dim-row changes that fan out to many documents — via
    per-hop REVERSE-INDEX states (ivm_flagship module docstring): a
    dim delta walks key→referrer indexes back to the affected parent
    keys in O(affected docs), never a scoped recompute. All states
    live in the key-local store bucketed by their own probe key, so
    per-batch state I/O is O(touched buckets).

    - ``parent_table``/``key``/``row_schema_parent``: the doc root;
      ``key`` must be unique per parent row (it is the doc id)
    - ``dims``: the parent's to-one chain, outermost first
      (``dims[0].fk`` is a parent column) — the LINEAR form
    - ``dim_forest``: the TREE form (mutually exclusive with ``dims``):
      a list of parent-anchored :class:`DimLookup` trees (each entry's
      ``fk`` is a parent column; each node's ``children`` hang off that
      node's table) — a doc with two independent root lookups
      (orders→customer AND orders→clerk) branches here. A linear
      ``dims`` chain is exactly the one-path special case; both forms
      normalize to the same numbered node list (:func:`dim_nodes`), so
      state naming — ``d{j}``/``rp{j}`` — is identical where the
      shapes coincide.
    - ``children``: N child arrays (0 permitted: chain-only doc)

    The emitted document is ``struct(<parent cols>, <each dim's
    non-key cols in preorder>, <child alias: array<struct<payload +
    element-dim non-key cols>>>…)``. Same before-image contract, replay
    guard and fallback behavior as the other delta lanes.
    """

    parent_table: str
    key: str
    row_schema_parent: str
    dims: list[DimLookup] = field(default_factory=list)
    children: list[ChildArraySpec] = field(default_factory=list)
    dim_forest: list[DimLookup] = field(default_factory=list)

    def all_tables(self) -> set[str]:
        out = {self.parent_table}

        def rec(ch: ChildArraySpec) -> None:
            out.add(ch.table)
            out.update(nd.dim.table for nd in edim_nodes(ch))
            for g in ch.children:
                rec(g)

        for nd in dim_nodes(self):
            out.add(nd.dim.table)
            for ch in nd.dim.arrays:
                rec(ch)
        for ch in self.children:
            rec(ch)
        return out


@dataclass(frozen=True)
class DimNode:
    """One normalized to-one hop of a :class:`DocTreeViewSpec`:
    ``idx`` is the node's DFS-preorder number (its state suffix is
    ``d{idx}``, its reverse index ``rp{idx}``), ``parent`` the preorder
    number of the referrer dim (None = the spec's parent table carries
    ``dim.fk``)."""

    idx: int
    dim: DimLookup
    parent: "int | None"


def edim_nodes(ch: "ChildArraySpec") -> list[DimNode]:
    """Normalize a child array's element to-one structure to DFS-preorder
    :class:`DimNode` rows — ``ch.dims`` entries are forest ROOTS whose
    ``children`` nest further lookups (an order item with BOTH a part
    and a supplier object; the part carrying its own brand lookup). For
    the historical linear chain (no children anywhere) the numbering is
    exactly the old positional ``{sfx}d0..dN`` — state names unchanged
    bit-for-bit."""
    out: list[DimNode] = []

    def visit(d: DimLookup, parent: "int | None") -> None:
        idx = len(out)
        out.append(DimNode(idx, d, parent))
        for c in d.children:
            visit(c, idx)

    for root in ch.dims:
        visit(root, None)
    return out


def dim_nodes(spec: "DocTreeViewSpec") -> list[DimNode]:
    """Normalize the spec's to-one structure — linear ``dims`` chain or
    ``dim_forest`` tree — to one DFS-preorder node list. For a linear
    chain the numbering (and therefore every state name) is exactly the
    historical ``d0..dN`` / ``rp0..rpN``."""
    if spec.dims and spec.dim_forest:
        raise ValueError("DocTreeViewSpec: dims and dim_forest are mutually exclusive")
    out: list[DimNode] = []
    if spec.dims:
        for j, d in enumerate(spec.dims):
            if d.children:
                raise ValueError(
                    "DocTreeViewSpec: linear dims entries must not carry "
                    "children — use dim_forest for trees"
                )
            out.append(DimNode(j, d, j - 1 if j else None))
        return out

    def visit(d: DimLookup, parent: "int | None") -> None:
        idx = len(out)
        out.append(DimNode(idx, d, parent))
        for c in d.children:
            visit(c, idx)

    for root in spec.dim_forest:
        visit(root, None)
    return out


@dataclass
class JoinAggViewSpec:
    """Declares a view as a KEYED AGGREGATE OVER A TWO-TABLE EQUI-JOIN —
    γ_keys(A ⋈ B) with count/sum aggregates — the composed lane: the
    bilinear join rule (ivm_delta.join_delta) produces the view's signed
    delta and, because the aggregate fold is linear in multiplicities,
    it pipes straight into the delta-agg fold
    (ivm_delta.join_delta_to_changes → apply_agg_delta). Refresh is
    O(|Δ|·fan-out); neither the join product nor either base table is
    ever recomputed. Same before-image contract as :class:`AggViewSpec`;
    base relations are maintained as multiplicity state exactly like
    :class:`JoinViewSpec`.

    - ``table_a``/``table_b``, ``on``, ``row_schema_a``/``row_schema_b``:
      as in :class:`JoinViewSpec`
    - ``keys``: group-by columns of the aggregate (join-output columns)
    - ``sums``: state column → SQL expression over join-output columns,
      pre-cast to DECIMAL (as in :class:`AggViewSpec`)
    - ``how``: ``'inner'`` (default), ``'left'`` or ``'full'`` — an
      aggregate over an OUTER join (e.g. order counts per customer
      including zero-order customers) composes the outer-join delta
      with the same linear fold: a pad→match transition arrives as
      delete(padded row)+insert(joined row), so counts stay at LOJ
      row semantics and NULL padded sum-inputs contribute nothing.

    ``having``: optional SQL predicate over the emitted doc columns,
    exactly as in :class:`AggViewSpec` (boundary crossings emit
    upsert/DELETE; state keeps all groups; the recompute sql/fn must
    carry the same ``HAVING``).

    The emitted document is ``struct(keys…, n_rows, <sums as double>)``.
    """

    table_a: str
    table_b: str
    on: list[str]
    row_schema_a: str
    row_schema_b: str
    keys: list[str]
    sums: dict[str, str]
    how: str = "inner"
    having: str | None = None

    def __post_init__(self) -> None:
        if self.how not in ("inner", "left", "full"):
            raise ValueError(
                f"JoinAggViewSpec.how must be 'inner', 'left' or 'full', got {self.how!r}"
            )


@dataclass
class ViewDef:
    name: str
    sql: str | None = None
    fn: Callable[[SparkSession], DataFrame] | None = None
    key: str = "id"
    index: str | None = None  # sink index name; defaults to view name
    deps: set[str] = field(default_factory=set)
    parent_table: str | None = None
    agg: AggViewSpec | None = None
    join: "JoinViewSpec | None" = None
    distinct: "DistinctViewSpec | None" = None
    membership: "MembershipViewSpec | None" = None
    topk: "TopKViewSpec | None" = None
    joinagg: "JoinAggViewSpec | None" = None
    joinchain: "JoinChainViewSpec | None" = None
    nesteddoc: "NestedDocViewSpec | None" = None
    doctree: "DocTreeViewSpec | None" = None
    # Optional targeted-refresh hook: (spark, {table: DataFrame of
    # changed ids, one `id string` column}) → one-column DataFrame of
    # affected VIEW keys, or None for "unknown → full refresh". Enables
    # SnapshotStore.refresh_partial: the engine filters the compiled view
    # by these keys instead of recomputing the world. Hooks resolve
    # reverse lineage with semi-joins against the id frames — changed
    # keys never funnel through the driver, so the lane survives
    # backfill-sized batches (availableNow replays) at 100 TB.
    affected_keys: Callable[[SparkSession, dict[str, DataFrame]], DataFrame | None] | None = None
    # Richer targeted-refresh hook: (spark, cdc_rows restricted to this
    # view's deps — columns table/op/id [+payload/payload_before]) →
    # affected view keys | None. Preferred over affected_keys when both
    # are set; auto-derived from the view SQL's correlation tree for the
    # reference MV shape (compiler/correlate.py) so a course_mv.sql user
    # gets O(affected-docs) refresh with zero Python.
    affected_rows_keys: Callable[[SparkSession, DataFrame], DataFrame | None] | None = None
    # Opt-in SQL→doc-tree derivation (ivm_doc_sql): when True and the
    # view SQL fits the doc grammar (one parent + correlated to-one
    # chain + json_agg child arrays — the reference course_mv shape),
    # the engine derives a DocTreeViewSpec at backfill and maintains the
    # view as a pure delta fold. Opt-in rather than default because the
    # fold needs before-image CDC: payload-less streams would route
    # every batch through the heavier lane-repair path instead of the
    # auto-derived targeted refresh.
    sql_doctree: bool = False

    def __post_init__(self) -> None:
        if (self.sql is None) == (self.fn is None):
            raise ValueError("ViewDef needs exactly one of sql= or fn=")
        if self.sql is not None and not self.deps:
            parent, tables = parse_schema_tables(self.sql)
            self.deps = tables
            self.parent_table = self.parent_table or parent
        if self.index is None:
            self.index = self.name
        if (
            self.affected_keys is None
            and self.parent_table
            and self.deps == {self.parent_table}
            and self.sql is not None
            and _selects_parent_id(self.sql)
        ):
            # single-table view keyed by the parent row id (person_mv
            # shape, verified textually by _selects_parent_id): by the
            # id-from-parent convention (reference person_mv.sql:1,
            # sinker.py:110-120) changed parent ids ARE the affected view
            # keys — targeted refresh is derivable with no user hook.
            # Any other single-table shape (aggregate keys, computed ids,
            # fn= views) falls back to full recompute+diff unless the
            # caller provides an explicit affected_keys hook.
            parent = self.parent_table

            def _parent_ids(spark: SparkSession, changed: dict[str, DataFrame]) -> DataFrame | None:
                if set(changed) - {parent}:
                    return None  # unexpected table → full refresh
                ids = changed.get(parent)
                if ids is None:
                    return spark.createDataFrame([], f"{self.key} string")
                return ids.select(F.col(ids.columns[0]).cast("string").alias(self.key))

            self.affected_keys = _parent_ids
        if (
            self.affected_keys is None
            and self.affected_rows_keys is None
            and self.sql is not None
            and self.parent_table
            and len(self.deps) > 1
            and _selects_parent_id(self.sql)
        ):
            # multi-table reference-MV shape (course_mv.sql): derive the
            # reverse-lineage walk from the SQL's correlation tree. The
            # derivation is conservative — out-of-grammar SQL installs
            # nothing, and the installed hook answers None (→ full
            # refresh) for batches it cannot soundly target
            from sinker_spark.compiler.correlate import derive_affected_rows_keys

            hook = derive_affected_rows_keys(self.sql, id_col="id")
            if hook is not None and hook.correlation_tree.parent_table == self.parent_table:
                self.affected_rows_keys = hook

    # Above this many scope keys the literal IN-list is abandoned for a
    # semi-join (driver memory + plan size); below it, literals win big:
    # Catalyst propagates a literal IN through joins AND through
    # aggregates on the grouping key, pruning every branch's scan — a
    # semi-join against a DataFrame does not push through aggregations.
    SCOPE_LITERAL_MAX = 10_000

    def compile_scoped(self, spark: SparkSession, scope_keys: DataFrame | list) -> DataFrame:
        """Compile restricted to the given view keys.

        Small scopes become a literal ``key IN (…)`` predicate (pushes to
        the parent scan and, via constraint propagation, into every join
        branch including grouped subplans) — partial recompute costs
        ∝ |scope|. Large scopes fall back to a left-semi join (prunes the
        parent side only)."""
        if not isinstance(scope_keys, list):
            head = scope_keys.limit(self.SCOPE_LITERAL_MAX + 1).collect()
            if len(head) > self.SCOPE_LITERAL_MAX:
                full = self.compile(spark)
                scope = scope_keys.select(
                    F.col(scope_keys.columns[0]).cast("string").alias(self.key)
                ).distinct()
                return full.join(scope, self.key, "left_semi")
            scope_keys = [r[0] for r in head]
        keys = sorted({str(k) for k in scope_keys})
        # filter the RAW (pre-string-cast) id column with literals of its
        # native type — a predicate under the cast reaches the scans; one
        # over it does not
        raw = self._raw(spark)
        id_col, _ = raw.columns
        id_dtype = dict(raw.dtypes)[id_col]
        if not keys:
            scoped = raw.where(F.lit(False))
        elif id_dtype in ("bigint", "int", "smallint", "tinyint"):
            scoped = raw.where(F.col(id_col).isin(*[int(k) for k in keys]))
        else:
            scoped = raw.where(F.col(id_col).cast("string").isin(*keys))
        return self._canonicalize(scoped)

    def _raw(self, spark: SparkSession) -> DataFrame:
        """The view program's 2-column output, before canonicalization."""
        df = spark.sql(transpile(self.sql)) if self.sql is not None else self.fn(spark)
        if len(df.columns) != 2:
            raise ValueError(
                f"view {self.name!r} must produce exactly 2 columns (id, doc); got {df.columns}"
            )
        return df

    def _canonicalize(self, df: DataFrame) -> DataFrame:
        id_col, doc_col = df.columns
        doc_dt = df.schema[doc_col].dataType
        _, doc_cast, changed = _decimals_to_double(doc_dt, F.col(doc_col))
        return df.select(
            F.col(id_col).cast("string").alias(self.key),
            (doc_cast if changed else F.col(doc_col)).alias("doc"),
        )

    def compile(self, spark: SparkSession) -> DataFrame:
        """→ canonical (key, doc) DataFrame; decimals inside doc → double."""
        return self._canonicalize(self._raw(spark))
