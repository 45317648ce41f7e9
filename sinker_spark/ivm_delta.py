"""Delta aggregate maintenance: O(|changes|) refresh for aggregate views.

The reference's only refresh primitive re-executes the full view query
and lets Postgres diff the result (``REFRESH MATERIALIZED VIEW
CONCURRENTLY``, reference query_templates.py:13). ``ivm.SnapshotStore``
mirrors that (recompute + snapshot diff), and ``refresh_partial`` scopes
the recompute to affected keys. This module goes one step further for
the view shape where even a scoped recompute is wasteful: **keyed
aggregates** (``SELECT keys, count(*), sum(x)... GROUP BY keys``).

For sum/count/avg — self-maintainable aggregates in IVM terms — a CDC
batch can be folded directly into the stored state with signed deltas:

    insert row  →  +1 to the group's count, +x to each sum
    delete row  →  −1,                      −x
    update      →  emitted by the CDC layer as delete(old) + insert(new)

so a refresh costs one aggregation over the *batch* (tiny) plus one
merge against the state, never a scan of the fact table. At 100 TB the
fact scan is the thing you cannot afford per batch; this makes steady
state cost proportional to the change rate, not the data size.

Merge strategy: state ∪ signed-batch-partials → re-aggregate by key.
Re-aggregation is associative/commutative (exactly Spark's own
partial/final split), shuffles only (keys, counters) — no documents —
and with the state stored hash-partitioned by key (SnapshotStore /
BucketedSnapshotStore) both sides arrive co-partitioned.

Exactness: callers pass pre-cast DECIMAL columns for sums (see
queries/helpers rationale) so +x/−x arithmetic is exact and
order-independent; groups whose count reaches 0 are dropped (a group
key disappears exactly when its last row does).

min/max are NOT self-maintainable under deletes (the min may have been
the deleted row). ``dirty_minmax_groups`` returns the group keys whose
min/max must be re-derived; route those through a targeted recompute
(``SnapshotStore.refresh_partial``) — the hybrid keeps the fallback
scan scoped to affected groups only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_COL = "__op"
INSERT = "insert"
DELETE = "delete"
_CNT = "__cnt"


def null_safe_join(left: DataFrame, right: DataFrame, keys: list[str], how: str) -> DataFrame:
    """Equi-join on ``keys`` with NULL-SAFE equality (``<=>``): a NULL
    key matches a NULL key, exactly as GROUP BY already treats NULLs as
    one group. The lane folds all run through groupBy — NULL groups fold
    correctly — but every SERVE/dirty-detection join on the group keys
    was plain (null-unsafe) equality, so a NULL-keyed group could never
    match its own touched-set row: it vanished from upserts and emitted
    spurious deletes forever. Use this wherever lane code joins frames
    BY GROUP KEY tuples that may contain NULLs.

    Output column layout matches ``left.join(right, on=keys, how=…)``:
    left's key columns are kept, right's are dropped (for semi/anti the
    right side contributes no columns anyway). ``<=>`` is a hash-join
    key for Spark, so plan shapes are unchanged."""
    renamed = {k: f"__ns_{k}" for k in keys}
    r = right
    for k, a in renamed.items():
        r = r.withColumnRenamed(k, a)
    cond = None
    for k, a in renamed.items():
        c = F.col(k).eqNullSafe(F.col(a))
        cond = c if cond is None else cond & c
    joined = left.join(r, cond, how)
    if how in ("semi", "left_semi", "anti", "left_anti"):
        return joined
    return joined.drop(*renamed.values())


def _nn(name: str) -> str:
    """Per-sum NON-NULL input counter column. SQL's SUM over zero
    non-null inputs is NULL, not 0 — a signed fold alone cannot tell
    "all contributions cancelled to 0" from "no contributions left"
    (e.g. an outer-join group re-padding when its last matched row
    leaves), so the state carries a delta-maintained count of non-null
    inputs per sum and serves NULL when it reaches zero."""
    return f"__nn_{name}"


def initial_agg_state(
    fact: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    maxes: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
) -> DataFrame:
    """One-time full aggregation of the fact table → state
    ``(keys..., __cnt, <sum outputs>..., <max outputs>..., <min
    outputs>...)``. ``sums`` maps output column name → input column OR
    SQL expression (pre-cast to DECIMAL, e.g. ``CAST(amount AS
    DECIMAL(18,2))``, for exact, order-independent accumulation);
    ``maxes``/``mins`` likewise for extremes (see
    :func:`fold_agg_minmax` for their hybrid maintenance)."""
    aggs = [F.count(F.lit(1)).alias(_CNT)]
    for name, col in sums.items():
        aggs.append(F.sum(F.expr(col)).alias(name))
        aggs.append(F.count(F.expr(col)).cast("bigint").alias(_nn(name)))
    aggs += [F.max(F.expr(col)).alias(name) for name, col in (maxes or {}).items()]
    aggs += [F.min(F.expr(col)).alias(name) for name, col in (mins or {}).items()]
    return fact.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Fold a CDC batch into aggregate state; returns the new state.

    ``changes`` carries the fact-table columns plus ``op_col`` ∈
    {insert, delete}; updates must arrive as delete(old)+insert(new)
    (Debezium-style before/after images provide exactly this). Cost:
    one aggregation of the batch + one key-partitioned merge with the
    state — independent of fact-table size."""
    sign = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1))
    batch = changes.withColumn("__sign", sign)
    nn_names = [_nn(n) for n in sums]
    partial = batch.groupBy(*keys).agg(
        F.sum("__sign").cast("bigint").alias(_CNT),
        *[F.sum(F.expr(col) * F.col("__sign")).alias(name) for name, col in sums.items()],
        *[
            F.sum(F.when(F.expr(col).isNotNull(), F.col("__sign")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(_nn(name))
            for name, col in sums.items()
        ],
    )
    # align sum dtypes: state came from SUM(DECIMAL(p,s)) too, but the
    # sign multiply can widen differently across engines/versions
    partial = partial.select(
        *keys,
        F.col(_CNT),
        *[F.col(name).cast(dict(state.dtypes)[name]).alias(name) for name in sums],
        *[F.col(n) for n in nn_names],
    )
    merged = state.select(*keys, _CNT, *sums, *nn_names).unionByName(partial)
    out = merged.groupBy(*keys).agg(
        F.sum(_CNT).cast("bigint").alias(_CNT),
        *[F.sum(name).cast(dict(state.dtypes)[name]).alias(name) for name in sums],
        *[F.sum(n).cast("bigint").alias(n) for n in nn_names],
    )
    return out.where(F.col(_CNT) > 0)


def fold_agg_minmax(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    maxes: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    op_col: str = OP_COL,
) -> tuple[DataFrame, DataFrame]:
    """Fold a CDC batch into aggregate state that also carries per-group
    extremes → (candidate_state, dirty_groups).

    count/sum fold exactly as in :func:`apply_agg_delta`. Extremes use
    the classic hybrid: they are monotone under inserts (new_max =
    max(stored, batch inserts) is EXACT), but a delete may remove the
    extremum — a group is **dirty** for recompute only when a deleted
    value reaches the stored extreme AND no same-batch insert re-covers
    it (an insert ≥ the stored max makes the new max exact regardless of
    what was deleted, because every surviving old value ≤ stored max).
    The batch is netted on the full row first so a same-batch
    insert+delete pair cannot raise the candidate extreme with a value
    that never survives. Dirty groups must be healed via
    :func:`recompute_agg_groups` before the state is served or folded
    again — the same contract as the top-k lane's dirty set.

    Cost: one aggregation of the batch + one key-co-partitioned merge +
    a batch-sized join against the state's (keys, extremes) projection;
    the fact table is touched only for dirty groups."""
    maxes = maxes or {}
    mins = mins or {}
    fact_cols = [c for c in changes.columns if c != op_col]
    sign = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1))
    net = changes.groupBy(*fact_cols).agg(F.sum(sign).cast("bigint").alias("__m"))
    net = net.where(F.col("__m") != 0)

    state_dtypes = dict(state.dtypes)
    mm_names = list(maxes) + list(mins)
    nn_names = [_nn(n) for n in sums]
    partial = net.groupBy(*keys).agg(
        F.sum("__m").cast("bigint").alias(_CNT),
        *[F.sum(F.expr(col) * F.col("__m")).alias(name) for name, col in sums.items()],
        *[
            F.sum(F.when(F.expr(col).isNotNull(), F.col("__m")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(_nn(name))
            for name, col in sums.items()
        ],
        # insert-side extremes only — the delete side must not union in
        *[
            F.max(F.when(F.col("__m") > 0, F.expr(col))).alias(name)
            for name, col in maxes.items()
        ],
        *[
            F.min(F.when(F.col("__m") > 0, F.expr(col))).alias(name)
            for name, col in mins.items()
        ],
    )
    partial = partial.select(
        *keys,
        F.col(_CNT),
        *[F.col(name).cast(state_dtypes[name]).alias(name) for name in sums],
        *[F.col(n) for n in nn_names],
        *[F.col(name).cast(state_dtypes[name]).alias(name) for name in mm_names],
    )
    merged = state.select(*keys, _CNT, *sums, *nn_names, *mm_names).unionByName(partial)
    out = merged.groupBy(*keys).agg(
        F.sum(_CNT).cast("bigint").alias(_CNT),
        *[F.sum(name).cast(state_dtypes[name]).alias(name) for name in sums],
        *[F.sum(n).cast("bigint").alias(n) for n in nn_names],
        *[F.max(name).alias(name) for name in maxes],
        *[F.min(name).alias(name) for name in mins],
    )
    out = out.where(F.col(_CNT) > 0)

    # dirty: per group with deletes, did a deleted value reach a stored
    # extreme without an insert re-covering it?
    old_mm = state.select(
        *keys,
        *[F.col(name).alias(f"__old_{name}") for name in mm_names],
    )
    del_mm = net.where(F.col("__m") < 0).groupBy(*keys).agg(
        *[F.max(F.expr(col)).alias(f"__del_{name}") for name, col in maxes.items()],
        *[F.min(F.expr(col)).alias(f"__del_{name}") for name, col in mins.items()],
    )
    ins_mm = net.where(F.col("__m") > 0).groupBy(*keys).agg(
        *[F.max(F.expr(col)).alias(f"__ins_{name}") for name, col in maxes.items()],
        *[F.min(F.expr(col)).alias(f"__ins_{name}") for name, col in mins.items()],
    )
    # null-safe: a NULL-keyed group's deleted extreme must still flag it
    j = null_safe_join(
        null_safe_join(del_mm, old_mm, keys, "inner"), ins_mm, keys, "left"
    )
    conds = [
        (F.col(f"__del_{name}") >= F.col(f"__old_{name}"))
        & ~F.coalesce(F.col(f"__ins_{name}") >= F.col(f"__old_{name}"), F.lit(False))
        for name in maxes
    ] + [
        (F.col(f"__del_{name}") <= F.col(f"__old_{name}"))
        & ~F.coalesce(F.col(f"__ins_{name}") <= F.col(f"__old_{name}"), F.lit(False))
        for name in mins
    ]
    if not conds:
        dirty = del_mm.limit(0).select(*keys)
    else:
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        dirty = j.where(cond).select(*keys)
    return out, dirty


def recompute_agg_groups(
    state: DataFrame,
    fact: DataFrame,
    dirty: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    maxes: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
) -> DataFrame:
    """Scoped heal for :func:`fold_agg_minmax` dirty groups: re-derive
    them from the fact table (broadcast semi-join prunes the scan to the
    dirty groups' rows) and splice into the state."""
    fresh = initial_agg_state(
        null_safe_join(fact, F.broadcast(dirty), keys, "semi"), keys, sums, maxes, mins
    )
    return null_safe_join(state, dirty, keys, "left_anti").unionByName(
        fresh.select(*state.columns)
    )


def dirty_minmax_groups(changes: DataFrame, keys: list[str], op_col: str = OP_COL) -> DataFrame:
    """Group keys whose min/max aggregates cannot be delta-maintained:
    any group receiving a delete (the extremum may be the deleted row).
    Inserts alone are safe (min/max are monotone under inserts). Feed
    the result into a targeted recompute of just those groups."""
    return changes.where(F.col(op_col) == DELETE).select(*keys).distinct()


_MULT = "__mult"


def initial_join_state(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """One-time materialization of the join view A ⋈ B under bag
    semantics: identical output rows collapse into a ``__mult`` count
    (the multiplicity representation every delta rule below preserves)."""
    j = a.join(b, on)
    return j.groupBy(*j.columns).agg(F.count(F.lit(1)).cast("bigint").alias(_MULT))


def join_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    a_changes: DataFrame,
    b_changes: DataFrame,
    on: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Signed delta of the join view A ⋈ B for one CDC batch — the
    classical bilinear IVM rule (signs multiply, multiplicities add):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ⊎  A_old ⋈ ΔB  ⊎  ΔA ⋈ ΔB

    ``a_old``/``b_old`` are the stored pre-batch snapshots; the change
    frames carry base-table columns + ``op_col`` (updates as
    delete(old)+insert(new), as for :func:`apply_agg_delta`). Returns
    join-schema rows + signed net ``__mult`` (zero-net rows dropped).

    Scale shape: both ΔA ⋈ B_old and A_old ⋈ ΔB join a batch-sized side
    against a stored snapshot — the delta side broadcasts, and with
    snapshots bucketed on the join key the probe reads only matching
    buckets; the fact-sized A_old ⋈ B_old product is never recomputed.
    Refresh cost is O(|Δ| · fan-out), independent of view size."""

    def signed(ch: DataFrame, alias: str) -> DataFrame:
        s = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1))
        return ch.withColumn(alias, s).drop(op_col)

    da, db = signed(a_changes, "__sa"), signed(b_changes, "__sb")
    def weighted(rel: DataFrame, alias: str) -> DataFrame:
        # stored snapshots may arrive multiplicity-compressed (__mult from
        # relation_state / apply_join_state): the weight IS the multiplicity
        if _MULT in rel.columns:
            return rel.withColumn(alias, F.col(_MULT).cast("bigint")).drop(_MULT)
        return rel.withColumn(alias, F.lit(1))

    a0 = weighted(a_old, "__sa")
    b0 = weighted(b_old, "__sb")

    parts = [
        da.join(b0, on),  # ΔA ⋈ B_old
        a0.join(db, on),  # A_old ⋈ ΔB
        da.join(db, on),  # ΔA ⋈ ΔB
    ]

    out_cols = None
    signed_rows = []
    for p in parts:
        row_sign = (F.col("__sa") * F.col("__sb")).cast("bigint")
        cols = [c for c in p.columns if c not in ("__sa", "__sb")]
        if out_cols is None:
            out_cols = cols
        signed_rows.append(p.select(*cols, row_sign.alias(_MULT)))
    allrows = signed_rows[0]
    for p in signed_rows[1:]:
        allrows = allrows.unionByName(p)
    net = allrows.groupBy(*out_cols).agg(F.sum(_MULT).cast("bigint").alias(_MULT))
    return net.where(F.col(_MULT) != 0)


_MATCHED = "__matched"


def initial_left_join_state(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """One-time materialization of A LEFT JOIN B under bag semantics:
    unmatched left rows carry NULL b-columns plus an explicit
    ``__matched = false`` flag (the flag keeps padding distinct from
    genuine NULL b values, so multiplicity state never conflates them);
    identical rows collapse into ``__mult``."""
    bm = b.withColumn(_MATCHED, F.lit(True))
    j = a.join(bm, on, "left").withColumn(
        _MATCHED, F.coalesce(F.col(_MATCHED), F.lit(False))
    )
    return j.groupBy(*j.columns).agg(F.count(F.lit(1)).cast("bigint").alias(_MULT))


def left_join_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    a_changes: DataFrame,
    b_changes: DataFrame,
    on: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Signed delta of A LEFT JOIN B for one CDC batch.

    Decomposes as Δ(LOJ) = Δ(inner) ⊎ Δ(padded). The inner part is the
    bilinear rule (:func:`join_delta`, tagged ``__matched = true``).
    The padded part only changes where a join key's B-multiplicity
    crosses zero — with n(k) = Σ multiplicities of B rows at key k:

    - n: >0 → 0  →  **+pads** for every post-batch A row at k (the key
      just lost its last match; all its left rows re-pad)
    - n: 0 → >0  →  **−pads** for every pre-batch A row at k (the key
      just gained its first match; the old pads retract — the inner
      delta supplies the joined rows)
    - n: 0 → 0   →  ΔA rows at k pad with their own signs

    Every term is change-key-scoped: B-counts are computed only for the
    keys the batch touches (left-semi pruned from the stored relation —
    bucket-pruned when the state is bucketed), and A-row lookups
    semi-join the boundary-crossing key sets. Cost O(|Δ| · per-key
    fan-in), never a relation scan. Same before-image contract as
    :func:`join_delta`."""
    inner = join_delta(a_old, b_old, a_changes, b_changes, on, op_col).withColumn(
        _MATCHED, F.lit(True)
    )
    pads = _pad_delta(a_old, b_old, a_changes, b_changes, on, op_col)
    allrows = inner.unionByName(pads, allowMissingColumns=False)
    out_cols = [c for c in allrows.columns if c != _MULT]
    net = allrows.groupBy(*out_cols).agg(F.sum(_MULT).cast("bigint").alias(_MULT))
    return net.where(F.col(_MULT) != 0)


def _pad_delta(
    l_old: DataFrame,
    r_old: DataFrame,
    l_changes: DataFrame,
    r_changes: DataFrame,
    on: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Signed delta of the NULL-padded unmatched-LEFT set against RIGHT
    match counts — the outer-join padding primitive shared by the left
    and full variants (the full join also runs it with the roles
    swapped). Output columns: left columns + NULL right-value columns +
    ``__matched = false`` + signed ``__mult``."""

    def as_mult(rel: DataFrame) -> DataFrame:
        if _MULT in rel.columns:
            return rel
        return rel.withColumn(_MULT, F.lit(1).cast("bigint"))

    l0 = as_mult(l_old)
    r0 = as_mult(r_old)
    dl = changes_to_mult(l_changes, op_col)
    dr = changes_to_mult(r_changes, op_col)

    # SQL equality is null-unsafe: a left row with ANY NULL join-key
    # column can never match, so it is padded unconditionally — its pad
    # delta is just its own signed multiplicity, independent of right
    # counts. Route those rows around the key-crossing machinery (whose
    # semi-joins are themselves null-unsafe and would silently DROP
    # them — a NULL-key insert would never reach the view).
    nullkey = F.lit(False)
    for k in on:
        nullkey = nullkey | F.col(k).isNull()
    dl_nullkey = dl.where(nullkey)
    dl = dl.where(~nullkey)

    keys_touched = (
        dl.select(*on).unionByName(dr.select(*on)).where(~nullkey).distinct()
    )
    nr_old = (
        r0.join(keys_touched, on, "left_semi")
        .groupBy(*on)
        .agg(F.sum(_MULT).cast("bigint").alias("__nr"))
    )
    dnr = dr.groupBy(*on).agg(F.sum(_MULT).cast("bigint").alias("__dnr"))
    nk = (
        keys_touched.join(nr_old, on, "left")
        .join(dnr, on, "left")
        .select(
            *on,
            F.coalesce(F.col("__nr"), F.lit(0)).alias("__n_old"),
            (F.coalesce(F.col("__nr"), F.lit(0)) + F.coalesce(F.col("__dnr"), F.lit(0))).alias("__n_new"),
        )
    )
    k_down = nk.where((F.col("__n_old") > 0) & (F.col("__n_new") <= 0)).select(*on)
    k_up = nk.where((F.col("__n_old") <= 0) & (F.col("__n_new") > 0)).select(*on)
    k_zero = nk.where((F.col("__n_old") <= 0) & (F.col("__n_new") <= 0)).select(*on)

    # post-batch left rows at the lost-last-match keys; pre-batch left
    # rows at the gained-first-match keys; raw signed Δleft at
    # never-matched keys
    l_new_down = apply_join_state(
        l0.join(k_down, on, "left_semi"), dl.join(k_down, on, "left_semi")
    )
    l_old_up = l0.join(k_up, on, "left_semi").withColumn(_MULT, -F.col(_MULT))
    dl_zero = dl.join(k_zero, on, "left_semi")

    r_value_cols = [
        (c, dict(r0.dtypes)[c]) for c in r0.columns if c not in (*on, _MULT)
    ]

    def pad(rows: DataFrame) -> DataFrame:
        return rows.select(
            *[c for c in rows.columns if c != _MULT],
            *[F.lit(None).cast(dt).alias(c) for c, dt in r_value_cols],
            F.lit(False).alias(_MATCHED),
            F.col(_MULT),
        )

    return (
        pad(l_new_down)
        .unionByName(pad(l_old_up))
        .unionByName(pad(dl_zero))
        .unionByName(pad(dl_nullkey))
    )


def initial_full_join_state(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """One-time materialization of A FULL OUTER JOIN B under bag
    semantics: unmatched rows on EITHER side carry NULL other-side
    columns + ``__matched = false``; identical rows collapse into
    ``__mult``. Column order follows (on, a-cols, b-cols)."""
    am = a.withColumn("__a_present", F.lit(True))
    bm = b.withColumn("__b_present", F.lit(True))
    j = am.join(bm, on, "full")
    j = j.withColumn(
        _MATCHED,
        F.coalesce(F.col("__a_present"), F.lit(False))
        & F.coalesce(F.col("__b_present"), F.lit(False)),
    ).drop("__a_present", "__b_present")
    return j.groupBy(*j.columns).agg(F.count(F.lit(1)).cast("bigint").alias(_MULT))


def full_join_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    a_changes: DataFrame,
    b_changes: DataFrame,
    on: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Signed delta of A FULL OUTER JOIN B: the bilinear inner delta
    plus BOTH padding deltas — the unmatched-A set against B counts and
    (roles swapped) the unmatched-B set against A counts, each changing
    only where the other side's per-key multiplicity crosses zero. Same
    change-scoped cost shape as :func:`left_join_delta`."""
    inner = join_delta(a_old, b_old, a_changes, b_changes, on, op_col).withColumn(
        _MATCHED, F.lit(True)
    )
    a_pads = _pad_delta(a_old, b_old, a_changes, b_changes, on, op_col)
    b_pads = _pad_delta(b_old, a_old, b_changes, a_changes, on, op_col)
    allrows = inner.unionByName(a_pads).unionByName(b_pads, allowMissingColumns=False)
    out_cols = [c for c in allrows.columns if c != _MULT]
    net = allrows.groupBy(*out_cols).agg(F.sum(_MULT).cast("bigint").alias(_MULT))
    return net.where(F.col(_MULT) != 0)


def apply_join_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a :func:`join_delta` result into multiplicity state: one
    co-partitioned group-sum; rows whose multiplicity reaches 0 vanish
    (exactly when their last contributing base rows did)."""
    cols = [c for c in state.columns if c != _MULT]
    merged = state.unionByName(delta)
    out = merged.groupBy(*cols).agg(F.sum(_MULT).cast("bigint").alias(_MULT))
    return out.where(F.col(_MULT) != 0)


def relation_state(df: DataFrame) -> DataFrame:
    """Multiplicity-compress a base relation: identical rows collapse
    into a signed ``__mult`` count — the stored form the delta-join lane
    maintains per base table (state size = distinct rows, not rows)."""
    return df.groupBy(*df.columns).agg(F.count(F.lit(1)).cast("bigint").alias(_MULT))


def changes_to_mult(changes: DataFrame, op_col: str = OP_COL) -> DataFrame:
    """CDC change rows → net signed multiplicities per distinct row
    (insert +1, delete −1), mergeable into :func:`relation_state` output
    via :func:`apply_join_state`."""
    sign = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    base = changes.withColumn(_MULT, sign).drop(op_col)
    cols = [c for c in base.columns if c != _MULT]
    net = base.groupBy(*cols).agg(F.sum(_MULT).cast("bigint").alias(_MULT))
    return net.where(F.col(_MULT) != 0)


_VAL = "__val"


def initial_distinct_state(fact: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Support-count state for EXACT per-key distinct-count maintenance:
    one row per distinct ``(keys…, value)`` with its multiplicity
    (``__cnt``). Unlike the HLL register lane (monotone, insert-only),
    support counts make COUNT(DISTINCT x) fully self-maintainable under
    deletes: a value leaves the distinct set exactly when its support
    reaches 0 — the classic IVM duplicate-elimination technique (count
    annotations on the pre-projection relation). State size is the
    number of distinct (group, value) pairs — the same order as the
    group-by's own shuffle keyspace, and it stays hash-partitioned by
    (keys, value) in the snapshot store, so the per-batch merge is
    co-partitioned and change-sized.

    NULL values are kept as a (collapsed) support row so the derived
    view can serve SQL semantics exactly: a group exists while ANY row
    exists (``n_rows > 0``) but NULLs never count toward
    ``n_distinct`` (see :func:`distinct_counts`)."""
    return (
        fact.select(*keys, F.col(value_col).alias(_VAL))
        .groupBy(*keys, _VAL)
        .agg(F.count(F.lit(1)).cast("bigint").alias(_CNT))
    )


def apply_distinct_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str = OP_COL,
) -> DataFrame:
    """Fold a CDC batch into support-count state; returns the new state.
    Same contract as :func:`apply_agg_delta`: updates arrive as
    delete(old)+insert(new), cost is one aggregation of the batch plus
    one key-partitioned merge — never a fact scan. Support rows whose
    count reaches 0 vanish (their value left the distinct set)."""
    sign = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    partial = (
        changes.select(*keys, F.col(value_col).alias(_VAL), sign.alias("__sign"))
        .groupBy(*keys, _VAL)
        .agg(F.sum("__sign").cast("bigint").alias(_CNT))
    )
    merged = state.select(*keys, _VAL, _CNT).unionByName(partial)
    out = merged.groupBy(*keys, _VAL).agg(F.sum(_CNT).cast("bigint").alias(_CNT))
    return out.where(F.col(_CNT) > 0)


def distinct_counts(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the served view from support-count state:
    ``(keys…, n_rows, n_distinct)`` with SQL parity — ``n_rows`` is the
    group's surviving row count (group existence), ``n_distinct`` counts
    non-null values only (``COUNT(DISTINCT x)`` ignores NULLs, so a
    group of all-NULL values serves ``n_distinct = 0``, not absence)."""
    return state.groupBy(*keys).agg(
        F.sum(_CNT).cast("bigint").alias("n_rows"),
        F.count(F.when(F.col(_VAL).isNotNull(), F.lit(1))).cast("bigint").alias("n_distinct"),
    )


def join_delta_to_changes(delta: DataFrame, op_col: str = OP_COL) -> DataFrame:
    """Signed join-delta rows → plain change rows for the aggregate fold:
    a row with net multiplicity m becomes |m| copies tagged insert (m>0)
    or delete (m<0). |m| is bounded by the per-batch join fan-out, so the
    explode is change-sized. This is the composition glue for maintaining
    Δ(γ(A⋈B)): the bilinear join rule feeds the linear aggregate fold.

    m=0 rows are dropped up front: ``sequence(1, 0)`` would otherwise
    default to a descending step and yield [1, 0] — two spurious
    delete-tagged copies — for callers that don't pre-filter net-zero
    multiplicities the way :func:`join_delta` does."""
    sign = F.when(F.col(_MULT) > 0, F.lit(INSERT)).otherwise(F.lit(DELETE))
    return (
        delta.where(F.col(_MULT) != 0)
        .withColumn(op_col, sign)
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.abs(F.col(_MULT)).cast("int"))))
        .drop(_MULT, "__copy")
    )
