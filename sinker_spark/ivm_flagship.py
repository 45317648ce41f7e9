"""Fully-incremental maintenance of the COMPLETE reference document
shape (DocTreeViewSpec): parent + to-one dim chain + N child arrays
with per-element dim chains — the whole course_mv pattern
(reference tests/fixtures/course_mv.sql:1-26: course→teacher→person
to-one chain, enrollments array with enrollment→student→person
lookups inside the elements) maintained as a PURE DELTA FOLD on every
constituent table.

The hard case is a DIM-ROW change fanning out to many documents (a
customer rename touches every order doc of that customer; a region
rename touches every doc in the region). The scoped-recompute lane
handles that correctly but by re-running the view query restricted to
affected keys — still a (predicate-pushed) base-table scan. This lane
never rescans anything: alongside each relation's multiplicity state
it maintains per-hop REVERSE-INDEX states
(``dim key value → referrer key``, bucketed by the dim key), so a dim
delta walks key→referrer indexes back to the affected parent keys in
O(affected docs) bucket-pruned reads:

    nation Δ{n_nationkey} ──rp1──► {c_custkey} ──rp0──► {o_orderkey}
    part   Δ{p_partkey}  ──rc00──► {l_orderkey}

Soundness of walking the POST-FOLD indexes: a document is affected iff
some row on one of its reference paths changed. If the parent still
references the changed row's chain after the batch, the walk from that
row's Δ reaches it through the new indexes. If it no longer does, then
some nearer reference on the path changed IN THIS BATCH, so a
shallower relation's Δ contains that row and the parent is reached
from there (inductively, down to the parent's own Δ). Both old- and
new-image keys of every change row enter the walk (deletes/updates
parse ``payload_before`` too), so re-pointed references cover their
old targets' fan-out as well.

Serving: the touched parents' docs are rebuilt by joining the states
RESTRICTED to the reachable keys (batch-sized at every hop — parent
rows for touched keys, dim rows for the fk values those rows carry,
child rows for the touched parent keys): inner joins along the parent
chain (a broken chain retracts the doc, flagship parity), left joins
for the arrays (childless parents serve an empty array) and for
element dims (missing element dim serves NULL fields, course_mv's
correlated-subquery semantics). Arrays are ``array_sort``-canonical
under the spec's order columns.

Child arrays NEST to arbitrary depth (ChildArraySpec.children:
customer→orders[]→lineitems[], each level with its own element dims).
A nesting child keeps one extra ``rk`` reverse index (its key → its
container's key, bucketed by the child key); a nested relation's (or
its dims') delta first walks its dim indexes to its container keys,
then ASCENDS the rk chain to the root parent keys — still O(affected
docs). Serving recurses: each level's sub-arrays are grouped by the
container key and embedded in the element structs.

All states live in the key-local store (state_keyed) bucketed by their
own probe key: per-batch state I/O is O(touched buckets), and the
whole refresh — fold, walk, serve, merge — is O(|Δ| · doc fan-out)
with no driver-side key collection anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sinker_spark import ivm_delta
from sinker_spark.ivm_doc import expand_mult
from sinker_spark.views import DocTreeViewSpec, dim_nodes, edim_nodes


@dataclass(frozen=True)
class DocStateDef:
    """One keyed state of a DocTreeViewSpec lane. ``schema`` is the CDC
    parse DDL for BASE states (one per relation occurrence in the doc
    tree); INDEX states (``source`` set) are projections of their source
    base state's rows/changes — they parse nothing themselves."""

    suffix: str
    table: str
    cols: tuple[str, ...]
    key_cols: tuple[str, ...]
    schema: str | None = None       # base states only
    source: str | None = None       # index states: source base suffix


def doc_tree_states(spec: DocTreeViewSpec) -> list[DocStateDef]:
    """Every state the lane maintains: base multiplicity states for the
    parent, each dim (chain or tree — see views.dim_nodes), each child
    and each element dim, plus one reverse index per to-one hop
    (bucketed by the hop's dim key). Linear chains keep the historical
    ``d{j}``/``rp{j}`` numbering bit-for-bit."""
    nodes = dim_nodes(spec)
    out: list[DocStateDef] = [
        DocStateDef(
            "p", spec.parent_table, tuple(_ddl_cols(spec.row_schema_parent)),
            (spec.key,), schema=spec.row_schema_parent,
        )
    ]
    for nd in nodes:
        out.append(
            DocStateDef(
                f"d{nd.idx}", nd.dim.table, tuple(_ddl_cols(nd.dim.row_schema)),
                (nd.dim.key,), schema=nd.dim.row_schema,
            )
        )
    for nd in nodes:
        ref_tbl, ref_key, src = (
            (spec.parent_table, spec.key, "p") if nd.parent is None
            else (nodes[nd.parent].dim.table, nodes[nd.parent].dim.key,
                  f"d{nd.parent}")
        )
        if nd.dim.fk == ref_key:
            continue  # identity hop: walkers short-circuit
        out.append(
            DocStateDef(
                f"rp{nd.idx}", ref_tbl, (nd.dim.fk, ref_key), (nd.dim.fk,),
                source=src,
            )
        )
    for node in child_nodes(spec):
        sfx, ch = node.suffix, node.child
        ch_cols = tuple(_ddl_cols(ch.row_schema))
        if ch.children and ch.key not in ch_cols:
            raise ValueError(
                f"ChildArraySpec({ch.table}): key {ch.key!r} must appear "
                f"in row_schema (got {ch_cols})"
            )
        alt_anchor = ch.anchor_col is not None and ch.anchor_col != spec.key
        if alt_anchor and (node.parent is not None or node.anchor_dim is not None):
            raise ValueError(
                f"ChildArraySpec({ch.table}): anchor_col is supported on "
                "top-level (doc-parent-anchored) arrays only"
            )
        out.append(
            DocStateDef(sfx, ch.table, ch_cols, (ch.fk,), schema=ch.row_schema)
        )
        if alt_anchor:
            # anchor value -> parent key: the reverse edge a child delta
            # walks when the array keys on a NON-key parent column —
            # bucketed by the anchor, so the walk stays bucket-pruned
            # instead of scanning the parent state
            out.append(
                DocStateDef(
                    f"ra{sfx}", spec.parent_table,
                    (ch.anchor_col, spec.key), (ch.anchor_col,), source="p",
                )
            )
        edims = edim_nodes(ch)
        for nd in edims:
            d = nd.dim
            out.append(
                DocStateDef(
                    f"{sfx}d{nd.idx}", d.table, tuple(_ddl_cols(d.row_schema)),
                    (d.key,), schema=d.row_schema,
                )
            )
        for nd in edims:
            d = nd.dim
            ref_tbl, ref_key, src = (
                (ch.table, ch.fk, sfx) if nd.parent is None
                else (edims[nd.parent].dim.table, edims[nd.parent].dim.key,
                      f"{sfx}d{nd.parent}")
            )
            if d.fk == ref_key:
                continue  # identity hop (the referrer's fk IS its own
                # key column, e.g. an element dim joined on the child's
                # container fk): dim keys ARE referrer keys — walkers
                # short-circuit, no index state needed
            out.append(
                DocStateDef(
                    f"r{sfx}{nd.idx}", ref_tbl, (d.fk, ref_key), (d.fk,),
                    source=src,
                )
            )
        if ch.children:
            # child key → container key: the ascent edge a nested array's
            # (or its element dims') delta walks to reach this child's
            # container — bucketed by the child's own key
            out.append(
                DocStateDef(f"rk{sfx}", ch.table, (ch.key, ch.fk), (ch.key,), source=sfx)
            )
    return out


@dataclass(frozen=True)
class ChildNode:
    """One to-many relation occurrence in the doc tree, in preorder.
    ``suffix`` is the state-name path (top level ``c{i}`` — the
    historical flat naming, kept bit-for-bit — nested ``{parent}x{k}``,
    dim-anchored ``d{j}a{k}``); ``parent`` is the containing child's
    suffix (None when the container is the doc parent or a dim);
    ``anchor_dim`` is the :func:`~sinker_spark.views.dim_nodes` index of
    the to-one node the (top-of-its-chain) array hangs off, or None when
    it hangs off the doc parent."""

    suffix: str
    child: "ChildArraySpec"  # noqa: F821 — views.ChildArraySpec
    parent: str | None
    anchor_dim: int | None = None


def child_nodes(spec: DocTreeViewSpec) -> list[ChildNode]:
    """Preorder flat list of every to-many occurrence (arbitrary
    nesting depth; parent-, nested- and dim-anchored)."""
    out: list[ChildNode] = []

    def rec(ch, sfx: str, parent: str | None, anchor: int | None = None) -> None:
        out.append(ChildNode(sfx, ch, parent, anchor))
        for k, g in enumerate(ch.children):
            rec(g, f"{sfx}x{k}", sfx, anchor)

    for i, ch in enumerate(spec.children):
        rec(ch, f"c{i}", None)
    for nd in dim_nodes(spec):
        for k, ch in enumerate(nd.dim.arrays):
            rec(ch, f"d{nd.idx}a{k}", None, nd.idx)
    return out


def _ddl_cols(ddl: str) -> list[str]:
    """Column names of a DDL schema string, no SparkSession needed."""
    from pyspark.sql.types import StructType

    try:
        return [f.name for f in StructType.fromDDL(ddl).fields]
    except Exception:
        # fall back to a naive split for exotic DDL
        return [part.strip().split()[0] for part in ddl.split(",")]


# rows_for(sdef, keys_df) → the state's CURRENT rows whose key is in
# keys_df (column names must already match sdef.key_cols); includes the
# __mult column. keys_df=None asks for the FULL state (serve_docs passes
# it for states its skip_restrict marks as too small to be worth a
# probe). The runner backs this with bucket-pruned store reads; gate-
# query simulations back it with in-memory relations.
RowsFor = Callable[[DocStateDef, DataFrame], DataFrame]


def _notnull(cols: list[str] | tuple[str, ...]) -> F.Column:
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return cond


def touched_parent_keys(
    spec: DocTreeViewSpec,
    change_keys: dict[str, DataFrame],
    rows_for: RowsFor,
) -> DataFrame:
    """Parent keys whose documents the batch may have changed: direct
    parent/child deltas plus every dim delta walked back through the
    reverse indexes (post-fold; see module docstring for soundness).
    ``change_keys`` maps base-state suffix → one-column DataFrame of
    that relation's changed key values (old AND new images)."""
    states = {s.suffix: s for s in doc_tree_states(spec)}
    nodes = dim_nodes(spec)
    cnodes = {n.suffix: n for n in child_nodes(spec)}
    outs: list[DataFrame] = []
    if "p" in change_keys:
        outs.append(change_keys["p"].toDF(spec.key))

    def e_walk_up(keys: DataFrame, cn: "ChildNode", j: int) -> DataFrame:
        # keys: one column named element-dim j's key — follow REFERRER
        # pointers (tree-capable, like the root dims' walk_up) through
        # the per-hop reverse index to the child's fk values (= its
        # container's keys)
        edims = edim_nodes(cn.child)
        while True:
            nd = edims[j]
            ref_key = (
                cn.child.fk if nd.parent is None else edims[nd.parent].dim.key
            )
            if nd.dim.fk == ref_key:
                # identity hop — still dedup/null-filter like the
                # indexed path so high-churn batches don't fan out
                keys = (
                    keys.toDF(ref_key)
                    .where(F.col(ref_key).isNotNull())
                    .distinct()
                )
            else:
                probe = keys.select(F.col(nd.dim.key).alias(nd.dim.fk)).where(
                    F.col(nd.dim.fk).isNotNull()
                ).distinct()
                keys = rows_for(
                    states[f"r{cn.suffix}{nd.idx}"], probe
                ).select(ref_key).distinct()
            if nd.parent is None:
                return keys
            j = nd.parent

    def walk_up(keys: DataFrame, idx: int) -> DataFrame:
        # keys: one column named nodes[idx].dim.key — follow parent
        # pointers through each hop's reverse index to the parent keys
        while True:
            nd = nodes[idx]
            ref_key = spec.key if nd.parent is None else nodes[nd.parent].dim.key
            if nd.dim.fk == ref_key:
                # identity hop: dim keys ARE referrer keys (sound
                # over-approximation: every referrer with that key);
                # dedup/null-filter like the indexed path
                keys = (
                    keys.toDF(ref_key)
                    .where(F.col(ref_key).isNotNull())
                    .distinct()
                )
            else:
                probe = keys.select(F.col(nd.dim.key).alias(nd.dim.fk)).where(
                    F.col(nd.dim.fk).isNotNull()
                ).distinct()
                keys = rows_for(states[f"rp{nd.idx}"], probe).select(ref_key).distinct()
            if nd.parent is None:
                return keys
            idx = nd.parent

    def ascend(keys: DataFrame, cn: ChildNode) -> DataFrame:
        # keys: one column of cn's FK values (= its container's keys) —
        # follow child→container rk indexes up the nesting chain, then
        # (for a dim-anchored chain) the dim's rp walk to the doc parent
        node = cn
        while node.parent is not None:
            pn = cnodes[node.parent]
            probe = keys.toDF(pn.child.key).where(
                F.col(pn.child.key).isNotNull()
            ).distinct()
            keys = rows_for(states[f"rk{node.parent}"], probe).select(
                pn.child.fk
            ).distinct()
            node = pn
        if node.anchor_dim is not None:
            return walk_up(keys.toDF(nodes[node.anchor_dim].dim.key), node.anchor_dim)
        acol = node.child.anchor_col
        if acol is not None and acol != spec.key:
            # non-key anchor: fk values are ANCHOR values — the ra index
            # maps them to every parent sharing the value (the full
            # fan-out; each of those docs embeds the changed element)
            probe = keys.toDF(acol).where(F.col(acol).isNotNull()).distinct()
            return rows_for(states[f"ra{node.suffix}"], probe).select(
                spec.key
            ).distinct()
        return keys

    thunks: list[Callable[[], DataFrame]] = []
    for cn in child_nodes(spec):
        if cn.suffix in change_keys:
            # a child delta's key values are its CONTAINER's key values
            thunks.append(
                lambda cn=cn: ascend(change_keys[cn.suffix], cn).toDF(spec.key)
            )
    for nd in nodes:
        if f"d{nd.idx}" in change_keys:
            thunks.append(
                lambda nd=nd: walk_up(
                    change_keys[f"d{nd.idx}"].toDF(nd.dim.key), nd.idx
                ).toDF(spec.key)
            )
    for cn in child_nodes(spec):
        for nd in edim_nodes(cn.child):
            if f"{cn.suffix}d{nd.idx}" in change_keys:
                # dim walk lands on this child's fk values (= its
                # container's keys); ascend the rk chain to the doc root
                def _edim_walk(cn=cn, nd=nd) -> DataFrame:
                    keys = change_keys[f"{cn.suffix}d{nd.idx}"].toDF(nd.dim.key)
                    return ascend(e_walk_up(keys, cn, nd.idx), cn).toDF(spec.key)

                thunks.append(_edim_walk)
    if not outs and not thunks:
        raise ValueError("touched_parent_keys: no change keys supplied")
    if len(thunks) == 1 and not outs:
        outs = [thunks[0]()]
    elif thunks:
        # the per-family reverse walks are independent of each other —
        # fan out on threads (concurrent Spark jobs; each walk's hops
        # run bucket-collect jobs while building its plan) and
        # materialize each family so the final union-distinct is over
        # leaf frames instead of re-executing every walk
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(thunks))) as pool:
            outs += list(
                pool.map(lambda t: t().localCheckpoint(eager=True), thunks)
            )
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.unionByName(o)
    return acc.where(F.col(spec.key).isNotNull()).distinct()


def doc_columns(spec: DocTreeViewSpec) -> list[str]:
    """Flat column list of the served document, in emission order
    (dims in preorder; column names must be distinct across the doc —
    the SQL lane's prefixed serve has no such restriction)."""
    cols = list(_ddl_cols(spec.row_schema_parent))
    for nd in dim_nodes(spec):
        cols += [c for c in _ddl_cols(nd.dim.row_schema) if c != nd.dim.key]
        cols += [ch.alias for ch in nd.dim.arrays]
    cols += [ch.alias for ch in spec.children]
    return cols


def serve_docs(
    spec: DocTreeViewSpec, touched: DataFrame, rows_for: RowsFor,
    skip_restrict: "Callable[[DocStateDef], bool] | None" = None,
) -> DataFrame:
    """Rebuild the touched parents' documents from state restricted to
    the reachable keys. Output: one row per parent key in ``touched``
    that yields a document — parent cols, chain-dim non-key cols, and
    one sorted array column per child (see doc_columns). A touched key
    ABSENT from the output means its doc no longer exists (parent gone
    or chain broken) — the caller emits the DELETE.

    ``skip_restrict`` (optional): states for which it returns True are
    read FULL (``rows_for(sdef, None)``) instead of probe-restricted.
    Restriction is a correctness requirement only for the PARENT state
    (it defines the output rows); for dims and children the join itself
    restricts the output, so for a state small enough that a full read
    is one cheap scan, the probe's eager materialization (one blocking
    Spark job per dim level / child) costs more than it saves. The
    runner passes the store's size-based ``prunable`` signal; at
    production state sizes every state clears the threshold and the
    probes engage exactly as before."""
    states = {s.suffix: s for s in doc_tree_states(spec)}

    def _skip(sdef: DocStateDef) -> bool:
        return skip_restrict is not None and skip_restrict(sdef)

    tkeys = touched.toDF(spec.key)
    cur = expand_mult(rows_for(states["p"], tkeys))
    dim_keys: dict[int, DataFrame] = {}  # slim reachable-key frames
    for nd in dim_nodes(spec):
        d = nd.dim
        # preorder guarantees the referrer (parent cols or the referrer
        # dim's cols) is already in ``cur``, so d.fk is resolvable.
        # Materialize the (reachable-keys-sized) probe: the bucket
        # collect inside rows_for and the final doc plan would otherwise
        # EACH re-execute the cur-so-far join chain per dim level
        sdef = states[f"d{nd.idx}"]
        if _skip(sdef):
            dim = expand_mult(rows_for(sdef, None))
        else:
            probe = cur.select(F.col(d.fk).alias(d.key)).where(
                F.col(d.key).isNotNull()
            ).distinct().localCheckpoint(eager=True)
            dim = expand_mult(rows_for(sdef, probe))
        dim_keys[nd.idx] = dim.select(d.key)
        # a dim whose key column shares the fk's NAME (org.mgr referenced
        # by dims.mgr) would make the join condition ambiguous — alias
        # the dim key before joining
        k_alias = d.key if d.key != d.fk else f"__dtk{nd.idx}"
        if k_alias != d.key:
            dim = dim.withColumnRenamed(d.key, k_alias)
        cur = cur.join(dim, F.col(d.fk) == F.col(k_alias), "inner").drop(k_alias)
    def attach(cur: DataFrame, container_key: str, level: list[ChildNode],
               probe_src: DataFrame) -> DataFrame:
        # attach one array column per child node onto ``cur`` (the
        # container rows — parent docs at the top level, the containing
        # child's elements when nested), recursing into nested arrays.
        # ``probe_src`` is a SLIM one-source frame carrying
        # ``container_key`` (tkeys / a dim state's keys / the pre-join
        # element rows): probing from ``cur`` itself would re-execute
        # the whole widening doc join once per child state read — the
        # r6 nested-tree rewrite did exactly that and near-tripled
        # serve time on the flagship bench (serve_sink 10.4 s → 29 s)
        for cn in level:
            ch = cn.child
            if _skip(states[cn.suffix]):
                elem = expand_mult(rows_for(states[cn.suffix], None))
            else:
                probe_c = probe_src.select(F.col(container_key).alias(ch.fk)).where(
                    F.col(ch.fk).isNotNull()
                ).distinct().localCheckpoint(eager=True)
                elem = expand_mult(rows_for(states[cn.suffix], probe_c))
            elem_keys = elem.select(ch.key) if ch.key else None
            payload = [c for c in elem.columns if c != ch.fk]
            for nd in edim_nodes(ch):
                d, j = nd.dim, nd.idx
                # preorder: the referrer's columns (the element payload,
                # or an earlier dim's row) are already joined, so d.fk
                # resolves at every tree shape
                esdef = states[f"{cn.suffix}d{j}"]
                if _skip(esdef):
                    dim = expand_mult(rows_for(esdef, None))
                else:
                    probe = elem.select(F.col(d.fk).alias(d.key)).where(
                        F.col(d.key).isNotNull()
                    ).distinct().localCheckpoint(eager=True)
                    dim = expand_mult(rows_for(esdef, probe))
                k_alias = d.key if d.key != d.fk else f"__dtek_{cn.suffix}_{j}"
                if k_alias != d.key:
                    dim = dim.withColumnRenamed(d.key, k_alias)
                elem = elem.join(dim, F.col(d.fk) == F.col(k_alias), "left").drop(k_alias)
                payload += [c for c in _ddl_cols(d.row_schema) if c != d.key]
            if ch.children:
                elem = attach(
                    elem,
                    ch.key,
                    [
                        ChildNode(f"{cn.suffix}x{k}", g, cn.suffix)
                        for k, g in enumerate(ch.children)
                    ],
                    probe_src=elem_keys,
                )
                payload += [g.alias for g in ch.children]
            order_cols = ch.order if ch.order is not None else [
                c for c in _ddl_cols(ch.row_schema) if c != ch.fk
            ]
            pair = F.struct(
                *[F.col(c).alias(f"__o{k}") for k, c in enumerate(order_cols)],
                F.struct(*[F.col(c) for c in payload]).alias("__c"),
            )
            arrays = (
                elem.groupBy(ch.fk)
                .agg(F.array_sort(F.collect_list(pair)).alias("__pairs"))
                .select(
                    ch.fk,
                    F.transform(F.col("__pairs"), lambda x: x["__c"]).alias(ch.alias),
                )
            )
            fk_alias = ch.fk if ch.fk != container_key else f"__dtf_{cn.suffix}"
            if fk_alias != ch.fk:
                arrays = arrays.withColumnRenamed(ch.fk, fk_alias)
            cur = cur.join(
                arrays, F.col(container_key) == F.col(fk_alias), "left"
            ).drop(fk_alias)
            arr_type = cur.schema[ch.alias].dataType
            cur = cur.withColumn(
                ch.alias, F.coalesce(F.col(ch.alias), F.array().cast(arr_type))
            )
        return cur

    for nd in dim_nodes(spec):
        if nd.dim.arrays:
            # dim-anchored arrays: the dim's key values live in the
            # REFERRER's fk column, already joined into ``cur``
            cur = attach(cur, nd.dim.fk, [
                ChildNode(f"d{nd.idx}a{k}", ch, None, nd.idx)
                for k, ch in enumerate(nd.dim.arrays)
            ], probe_src=dim_keys[nd.idx].toDF(nd.dim.fk))
    top = [n for n in child_nodes(spec) if n.parent is None and n.anchor_dim is None]
    id_anchored = [
        n for n in top
        if n.child.anchor_col is None or n.child.anchor_col == spec.key
    ]
    cur = attach(cur, spec.key, id_anchored, probe_src=tkeys)
    for cn in [n for n in top if n not in id_anchored]:
        # non-key anchor: probe/join on the parent's anchor column; the
        # slim probe is a second (bucket-pruned, touched-keys-sized)
        # parent-state read, not the widening doc join
        aprobe = expand_mult(rows_for(states["p"], tkeys)).select(
            cn.child.anchor_col
        )
        cur = attach(cur, cn.child.anchor_col, [cn], probe_src=aprobe)
    return cur.select(*doc_columns(spec))


def relation_rows_for(relations: dict[str, DataFrame]) -> RowsFor:
    """In-memory RowsFor backing (gate-query simulations, tests):
    ``relations`` maps base-state suffix → its CURRENT multiplicity
    relation (cols + __mult). Index states project their source
    relation; restriction is a semi-join on the probe keys."""

    def rows_for(sdef: DocStateDef, keys: DataFrame) -> DataFrame:
        rel = relations[sdef.source or sdef.suffix]
        if sdef.source is not None:
            rel = (
                rel.where(_notnull(sdef.cols))
                .groupBy(*sdef.cols)
                .agg(F.sum(ivm_delta._MULT).alias(ivm_delta._MULT))
            )
        if keys is None:
            return rel
        return rel.join(keys.distinct(), list(sdef.key_cols), "left_semi")

    return rows_for
