"""Incremental top-k view maintenance: O(|changes|) refresh for
"top k rows per group" views.

The reference refreshes every view by full recompute + diff (reference
query_templates.py:13 ``REFRESH MATERIALIZED VIEW CONCURRENTLY``); the
delta lanes in :mod:`sinker_spark.ivm_delta` cover keyed aggregates and
joins. Ranked views (``row_number() <= k`` per group — leaderboards,
latest-N-events-per-entity, top-spenders) are the remaining common shape
where a per-batch fact scan is unaffordable at 100 TB. They are not
self-maintainable under deletes either: evicting a stored row may promote
a row the state never kept. The classic fix (e.g. STREAM/DSMS ranked-view
maintenance) is a **buffered top-(k+b) state**:

- State keeps the top ``k + buffer`` rows per group (the view serves the
  first k), plus a delta-maintained per-group total row count.
- **Prefix invariant** (the correctness keystone): the stored set is
  always a *true prefix* of the group's full ordering — exactly the
  top-s fact rows for s = stored count. Deletes preserve this for free
  (removing rows from a prefix leaves a prefix of the survivors).
  Inserts preserve it only if gated at the **watermark** — the sort key
  of the weakest surviving stored row: when the group has unstored fact
  rows, an insert ranking below the watermark may interleave with rows
  the state never kept, so it is *dropped* (the count still increments;
  a later scoped recompute re-derives it from the fact table if ever
  needed). Inserts above the watermark — and all inserts when the state
  holds the whole group — fold in exactly.
- **Insert**: union the admitted batch rows into the touched groups'
  stored rows, re-rank those groups only, truncate back to k+buffer. A
  batch touches |Δ| groups → cost O(|Δ| · (k+buffer)), never a fact scan.
- **Delete of a stored row**: remove it and re-rank the group; the
  buffer rows backfill the vacancy.
- **Delete of an unstored row**: it ranked below the stored prefix, so
  the stored rows cannot change — only the group's count decrements.
- **Buffer exhaustion**: thanks to the prefix invariant the stored count
  IS the coverage, so after folding, a group whose stored row count
  fell below min(k, total) has evicted rows it now needs. Those groups
  come back from :func:`apply_topk_delta` as the *dirty set* for a
  recompute scoped to just those group keys (the same hybrid as
  ``ivm_delta.dirty_minmax_groups`` — the fallback scan is key-pruned,
  not global). Larger ``buffer`` trades state size for fallback rate.

Updates arrive as delete(old)+insert(new), as everywhere in the CDC
layer. All steps are batch-sized joins against a state that holds
≤ (k+buffer) rows per group — the state is view-sized, the work is
change-sized.

Special cases worth naming: k=1 IS incremental per-group MAX (invert
the sort for MIN) — this lane therefore also closes the min/max gap
that ``ivm_delta.dirty_minmax_groups`` routes around for plain
aggregate views, with the buffer playing the "runner-up cache" role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sinker_spark.ivm_delta import DELETE, OP_COL, null_safe_join

_N = "__n_total"


def _ranked_truncate(rows: DataFrame, keys: list[str], order_col: str, id_col: str, limit: int) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.asc(id_col))
    return (
        rows.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= limit)
        .drop("__rk")
    )


def initial_topk_state(
    fact: DataFrame,
    keys: list[str],
    order_col: str,
    id_col: str,
    k: int,
    buffer: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """One-time build → (rows_state, counts_state).

    rows_state: the top k+buffer fact rows per group (full fact columns,
    ordered by ``order_col`` desc, ``id_col`` asc tiebreak).
    counts_state: (keys..., __n_total) — delta-maintained group sizes,
    the oracle for "does this group have evicted rows"."""
    rows = _ranked_truncate(fact, keys, order_col, id_col, k + buffer)
    counts = fact.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias(_N))
    return rows, counts


def apply_topk_delta(
    rows_state: DataFrame,
    counts_state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_col: str,
    id_col: str,
    k: int,
    buffer: int = 2,
    op_col: str = OP_COL,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold one CDC batch → (new_rows_state, new_counts_state,
    dirty_groups).

    ``changes`` carries fact columns + ``op_col`` ∈ {insert, delete};
    updates as delete(old)+insert(new). ``dirty_groups`` (keys only) are
    the buffer-exhausted groups needing a scoped recompute via
    :func:`recompute_groups`; every other group's new state is exact.

    CONTRACT: heal the dirty groups (recompute_groups) before folding
    the next batch — the fold's correctness rests on the stored set
    being a true prefix of each group's fact rows, which a dirty group
    by definition no longer is (the runner's _topk_refresh heals within
    the same epoch)."""
    fact_cols = [c for c in changes.columns if c != op_col]
    # net the batch as a multiset on the FULL tuple first: a row created
    # and deleted within one batch (insert(x) + delete(x)) must cancel,
    # or the insert would fold a phantom row into the state (the delete
    # below only anti-joins the OLD stored rows). Updates are unaffected:
    # delete(old)+insert(new) are distinct tuples, each keeps its sign.
    sign_m = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1))
    net = changes.groupBy(*fact_cols).agg(F.sum(sign_m).cast("bigint").alias("__m"))
    inserts = net.where(F.col("__m") > 0).select(*fact_cols)
    deletes = net.where(F.col("__m") < 0).select(*fact_cols)
    touched = changes.select(*keys).distinct()

    # untouched groups pass through unchanged; touched groups re-rank.
    # All key joins are NULL-SAFE: group keys may legally be NULL (one
    # group, per GROUP BY semantics) and a plain equi-join would strand
    # a NULL group's stored rows in BOTH untouched and not-touched sets.
    untouched = null_safe_join(rows_state, touched, keys, "left_anti")
    touched_rows = null_safe_join(rows_state, touched, keys, "semi")
    after_delete = null_safe_join(
        touched_rows, deletes.select(*keys, id_col), [*keys, id_col], "left_anti"
    )

    # Watermark gate (prefix invariant): per touched group, find the
    # weakest surviving stored old row — (order, id) of the LAST row in
    # desc(order)/asc(id) ordering — and the surviving stored count. An
    # insert is admitted iff the state will still be a true top-s prefix
    # of the group's fact rows afterwards:
    #   * the group has no unstored surviving old rows (state held the
    #     whole group — n_old_surviving <= s_old, or group is brand new),
    #     OR
    #   * the insert ranks strictly above the watermark (so no unstored
    #     old row can interleave between it and the stored prefix).
    # Dropped inserts still count into __n_total; if coverage ever falls
    # below k the dirty/recompute path re-derives them from the fact
    # table. Without this gate, same-batch inserts ranking below
    # never-stored old rows inflate the stored count and a later batch
    # can miss the dirty flag (multi-batch unsoundness).
    w_grp = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.asc(id_col))
    wm = (
        after_delete.withColumn("__rk", F.row_number().over(w_grp))
        .withColumn("__sold", F.max("__rk").over(Window.partitionBy(*keys)))
        .where(F.col("__rk") == F.col("__sold"))
        .select(
            *keys,
            F.col(order_col).alias("__wm_ord"),
            F.col(id_col).alias("__wm_id"),
            F.col("__sold").cast("bigint").alias("__sold"),
        )
    )
    n_del = deletes.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("__ndel"))
    grp_info = (
        null_safe_join(
            null_safe_join(
                null_safe_join(counts_state, touched, keys, "semi"),
                n_del, keys, "left",
            ),
            wm, keys, "left",
        )
        .select(
            *keys,
            (F.col(_N) - F.coalesce(F.col("__ndel"), F.lit(0))).alias("__nold"),
            F.coalesce(F.col("__sold"), F.lit(0)).alias("__sold"),
            "__wm_ord",
            "__wm_id",
        )
    )
    admitted = (
        null_safe_join(inserts, grp_info, keys, "left")
        .where(
            F.col("__nold").isNull()  # brand-new group: state holds everything
            | (F.col("__nold") <= F.col("__sold"))  # no unstored old rows
            | (
                (F.col("__sold") > 0)
                & (
                    (F.col(order_col) > F.col("__wm_ord"))
                    | (
                        (F.col(order_col) == F.col("__wm_ord"))
                        & (F.col(id_col) < F.col("__wm_id"))
                    )
                )
            )
        )
        .select(*fact_cols)
    )

    refolded = _ranked_truncate(
        after_delete.unionByName(admitted.select(*after_delete.columns)),
        keys,
        order_col,
        id_col,
        k + buffer,
    )
    new_rows = untouched.unionByName(refolded)

    sign = F.when(F.col(op_col) == DELETE, F.lit(-1)).otherwise(F.lit(1))
    delta_n = changes.groupBy(*keys).agg(F.sum(sign).cast("bigint").alias(_N))
    new_counts = (
        counts_state.unionByName(delta_n)
        .groupBy(*keys)
        .agg(F.sum(_N).cast("bigint").alias(_N))
        .where(F.col(_N) > 0)
    )

    # dirty: with the prefix invariant, the NEW stored count is exactly
    # the number of top positions the state covers. A group needs
    # recovery iff that coverage falls below min(k, new total): the
    # served top-k would reach past what the state kept. Checked on the
    # post-fold state, so it is sound across arbitrarily many batches.
    s_new = refolded.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("__snew"))
    dirty = (
        null_safe_join(
            null_safe_join(new_counts, touched, keys, "semi"), s_new, keys, "left"
        )
        .where(
            F.coalesce(F.col("__snew"), F.lit(0))
            < F.least(F.lit(k).cast("bigint"), F.col(_N))
        )
        .select(*keys)
    )
    return new_rows, new_counts, dirty


def recompute_groups(
    rows_state: DataFrame,
    fact: DataFrame,
    dirty: DataFrame,
    keys: list[str],
    order_col: str,
    id_col: str,
    k: int,
    buffer: int = 2,
) -> DataFrame:
    """Scoped fallback: re-derive the dirty groups' top-(k+buffer) from
    the fact table — the group-key filter semi-joins (or broadcasts) into
    the fact scan, so cost is O(dirty groups' rows), not a full scan —
    and splice them into the state."""
    fresh = _ranked_truncate(
        null_safe_join(fact, F.broadcast(dirty), keys, "semi"),
        keys, order_col, id_col, k + buffer,
    )
    return null_safe_join(rows_state, dirty, keys, "left_anti").unionByName(
        fresh.select(*rows_state.columns)
    )


def topk_view(rows_state: DataFrame, keys: list[str], order_col: str, id_col: str, k: int) -> DataFrame:
    """The served view: first k of the stored k+buffer rows per group,
    with their ranks."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.asc(id_col))
    return rows_state.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
