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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank over an edge DataFrame → (node, rank).

    The iterative-algorithm lane beyond connected components: each round
    is one join of the rank vector (|V| rows) against the normalized edge
    list plus one aggregation on ``dst`` — the edge list is the big side
    but is scanned from a localCheckpoint, never recomputed, and the data
    that moves per round is O(|V|+|E|) with the rank vector broadcast-
    sized for dimension-like graphs. Dangling-node mass (nodes with no
    out-edges) is redistributed uniformly via a one-row aggregate
    cross-joined back in — fully distributed, nothing collected to the
    driver. Lineage is truncated every ``checkpoint_every`` rounds so the
    plan stays flat over many iterations (same policy as
    :func:`connected_components`)."""
    w = (F.col(weight) if weight else F.lit(1.0)).cast("double")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # transition probability per edge; checkpoint: reused every iteration
    e = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    sources = e.select("src").distinct().withColumnRenamed("src", "node")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("cnode"))
            .agg(F.sum(F.col("p") * F.col("rank")).alias("c"))
        )
        dangling = ranks.join(sources, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["cnode"], "left")
            .crossJoin(dangling)  # one-row broadcast, stays distributed
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dmass") / n)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Per-node triangle participation counts — the standard distributed
    triangle algorithm: canonicalize to ``u < v`` edges, build wedges
    (e1.v = e2.u), close them against a third edge, count each triangle
    exactly once (``u < v < w`` ordering), then explode the three corners
    for per-node totals.

    Output: ``(node, n_triangles)`` for nodes in ≥1 triangle.

    Scale shape: two equi-joins on vertex keys — O(Σ deg(v)²) wedge rows,
    never all-triples. Heavy-hitter vertices dominate Σ deg²; the classic
    mitigation (orient edges low-degree → high-degree before wedging,
    which bounds wedges at O(m^1.5)) drops in by replacing the id
    ordering with a (degree, id) ordering — the join structure below is
    unchanged.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    wedge = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(e.select(F.col("u").alias("b"), F.col("v").alias("c")), "b")
    )
    tri = wedge.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"]
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def sssp(
    edges: DataFrame,
    source: str,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Hop-bounded single-source shortest paths (Bellman–Ford rounds in
    min-plus algebra) → (node, dist): the cheapest ≤``rounds``-hop path
    cost from ``source`` to every reached node.

    Each round relaxes every edge once: dist' = min(dist, min over
    in-edges of dist[src] + cost) — one equi-join of the frontier
    against the edge list plus one min-aggregation on dst, the same
    O(|V|+|E|)-per-round shape as :func:`pagerank`. Costs must be
    integral (BIGINT): min-plus over integers is exact, so the result is
    engine- and partitioning-independent with no float rounding anywhere.
    A fixed ``rounds`` (≥ graph diameter for full SSSP) keeps the loop
    bounded and the semantics well-defined either way: "cheapest path
    using at most k hops" — and makes the computation SQL-unrollable for
    the oracle. Unreached nodes emit no row."""
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(cost).cast("bigint").alias("cost"),
    ).localCheckpoint(eager=True)
    dist = e.sparkSession.createDataFrame([(source, 0)], "node string, dist bigint")
    for i in range(rounds):
        relaxed = (
            e.join(dist, e["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("cost")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if (i + 1) % checkpoint_every == 0 or i == rounds - 1:
            dist = dist.localCheckpoint(eager=True)
    return dist
