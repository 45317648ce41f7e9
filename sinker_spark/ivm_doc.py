"""Nested-document maintenance: the reference's CORE view shape —
one document per parent row carrying the parent's columns plus an
ARRAY of child structs (the flagship order document: order fields +
``lineitems`` array, reference query_templates.py:11 /
tests fixture school.sql) — refreshed O(batch) from stored
multiplicity states.

The array aggregate (``json_agg`` in the reference SQL) is NOT
self-maintainable the way sums are: a child delete cannot be "folded"
into a stored array without knowing the array's other members. But the
members ARE known — they are exactly the child relation's multiplicity
state, which the delta lanes already maintain per base table. So the
lane rebuilds arrays ONLY for parents touched by the batch, by joining
the parent and child STATES restricted to the touched keys:

    touched = π_on(ΔP) ∪ π_on(ΔC)                (batch-sized)
    docs    = (P ⋉ touched) ⟕ sort(array_agg(C ⋉ touched))

No base table is ever rescanned — this beats even the targeted-refresh
lane (which recomputes touched keys FROM the catalog tables: a
predicate-pushed scan, cheap but still a scan at 100 TB). Both states
live hash-partitioned by their own row hash in the snapshot store; the
touched-key semi-joins broadcast (batch-sized build side).

Determinism: arrays are sorted by caller-declared order columns
(``array_sort`` over (order-key, row) pairs), so redelivery and
cross-engine comparison see one canonical array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sinker_spark.ivm_delta import _MULT


def expand_mult(state: DataFrame) -> DataFrame:
    """Multiplicity state → plain rows: a row with ``__mult`` = m yields
    m copies (states store positive multiplicities only, so the
    ascending sequence is well-formed). Bounded by the true row count of
    the restricted state — call AFTER restricting to touched keys."""
    cols = [c for c in state.columns if c != _MULT]
    return (
        state.withColumn(
            "__copy", F.explode(F.sequence(F.lit(1), F.col(_MULT).cast("int")))
        )
        .select(*cols)
    )


def build_docs(
    parent_state: DataFrame,
    child_state: DataFrame,
    on: list[str],
    child_alias: str = "children",
    child_order: list[str] | None = None,
) -> DataFrame:
    """Serve nested documents from (restricted) parent/child states:
    one row per parent row — parent columns plus ``child_alias``, an
    array of child structs (join columns excluded from the structs,
    they repeat the parent's) sorted by ``child_order`` (default: every
    child column, total order). Parents with no children serve an
    EMPTY array (reference parity: ``coalesce(json_agg(...), '[]')``).

    Restrict both states to the touched keys BEFORE calling — this
    function joins whatever it is given.
    """
    parents = expand_mult(parent_state)
    children = expand_mult(child_state)
    payload_cols = [c for c in children.columns if c not in on]
    order_cols = child_order if child_order is not None else payload_cols
    # sort key first so array_sort's lexicographic field order is the
    # declared one; then strip it back off
    pair = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.struct(*[F.col(c) for c in payload_cols]).alias("__c"),
    )
    arrays = (
        children.groupBy(*on)
        .agg(F.array_sort(F.collect_list(pair)).alias("__pairs"))
        .select(
            *on,
            F.transform(F.col("__pairs"), lambda x: x["__c"]).alias(child_alias),
        )
    )
    out = parents.join(arrays, on, "left")
    # typed empty array for childless parents
    arr_type = out.schema[child_alias].dataType
    return out.withColumn(
        child_alias, F.coalesce(F.col(child_alias), F.array().cast(arr_type))
    )
