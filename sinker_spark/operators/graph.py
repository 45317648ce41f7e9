"""Iterative graph operators: connected components over pair edges.

Use case: near-duplicate PAIRS (from MinHash/SimHash/embedding LSH) must
become duplicate CLUSTERS to pick one canonical doc per group — that's
connected components. Spark has no native CC; this is the classic
min-label propagation expressed as a bounded DataFrame loop:

    label(v) ← min(label(v), min over neighbors(label(u)))

iterated to fixpoint. Each round is one join + one aggregation (both on
the vertex key); lineage is cut with localCheckpoint per round so plans
stay flat. Convergence needs ≤ diameter rounds — near-dup clusters are
shallow (diameter ≲ 5), so the loop is short; a max_iter bound guards
pathological chains (a driver-side count per round is the only
non-distributed step, and it reads one aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id in the connected component (deterministic canonical choice)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("comp"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(sym["u"].alias("node2"))
            .agg(F.min("comp").alias("n_comp"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["node2"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias("comp"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("comp").alias("component"))
