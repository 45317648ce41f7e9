"""Vector-similarity operators over an ``array<float>`` embedding column.

- ``cosine``: pure Catalyst higher-order-function expression
  (zip_with product + ordered left-fold sum) — deterministic double math,
  no UDF, fully codegen'd.
- ``brute_force_topk``: queries × corpus with the small side broadcast →
  per-partition score + rank-limited window. The baseline every ANN
  variant is measured against.
- ``sign_lsh_topk`` / ``sign_near_dups``: random-hyperplane-style LSH
  using axis sign bits (deterministic, engine-portable). Buckets make the
  candidate join O(docs·bands) instead of O(docs²) — the 100 TB path.
- ``ivf_topk``: inverted-file search over a coarse partition column
  (here the pre-assigned ``label``; in production the centroid id from a
  k-means fit) — probes only matching partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs cast to double (float→double is exact)."""
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (a query batch is small by construction), so the
    corpus is scanned once with no shuffle; the only exchange is the
    rank-limited window on qid — Spark pushes the k-limit into the sort.
    Scores are rounded before ranking so ordering (and hence the result
    set) is reproducible across engines and partitionings.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine(F.col("qvec"), F.col("nvec")), round_digits).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def sign_signature(vec: Column, bits: int = 16) -> Column:
    """Axis-sign LSH signature: first ``bits`` dimension signs as a string.
    Deterministic stand-in for random-hyperplane SimHash (axis-aligned
    hyperplanes); cosine-close vectors collide with high probability."""
    return F.concat_ws(
        "",
        F.transform(F.slice(vec.cast("array<double>"), 1, bits), lambda x: F.when(x >= 0, "1").otherwise("0")),
    )


def sign_near_dups(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket by sign signature, verify
    cosine ≥ threshold inside buckets. Join key = signature → candidate
    set is O(bucket²) per bucket, not O(corpus²)."""
    sigs = corpus.select(F.col(id_col), F.col(vec_col), sign_signature(F.col(vec_col), bits).alias("sig"))
    a = sigs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "sig")
    return (
        a.join(b, "sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("v_a"), F.col("v_b")), round_digits).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (nprobe=1).

    ``cell_col`` is the coarse quantizer assignment — the driver data
    ships one (``label``); production replaces it with argmin-centroid
    from a sampled k-means. Equi-join on the cell id means the shuffle is
    partitioned by cell: each executor scores one cell's vectors."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"), F.col(cell_col).alias("cell"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"), F.col(cell_col).alias("cell"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine(F.col("qvec"), F.col("nvec")), round_digits).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _sq_dist_to(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an ``array<float>`` column → (assignments,
    centroids). The coarse-quantizer trainer for :func:`ivf_topk`.

    Scale shape per iteration: centroids live as a k×dim literal (a few
    KB — same trust model as a broadcast hint), so ASSIGNMENT is a pure
    per-row projection (k codegen'd zip_with distances + array_position
    argmin — no join, no shuffle); the UPDATE is one posexplode +
    (cluster, dim-position) aggregation whose map-side partials bound the
    shuffle at k×dim rows per partition regardless of input size. The
    k×dim collect per iteration is the only driver-side data. Init is
    deterministic: the k lowest-id vectors.
    """
    vec = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("_id"), vec.alias("_v")).persist()
    centroids = [
        [float(x) for x in r["_v"]]
        for r in base.orderBy("_id").limit(k).collect()
    ]
    if not centroids:
        base.unpersist()
        raise ValueError("kmeans: input has no rows")
    # fewer rows than k: clamp so the empty-cluster fallback centroids[c]
    # never indexes past the collected init set
    k = min(k, len(centroids))

    def assign(cents: list[list[float]]) -> DataFrame:
        dists = F.array(*[_sq_dist_to(F.col("_v"), c) for c in cents])
        return base.select(
            "_id",
            "_v",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
            F.round(F.sqrt(F.array_min(dists)), 6).alias("dist"),
        )

    for _ in range(iterations):
        assigned = assign(centroids)
        new_rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean"]
        centroids = [
            [by_cluster[c][p] for p in sorted(by_cluster[c])] if c in by_cluster else centroids[c]
            for c in range(k)
        ]

    out = assign(centroids).select(F.col("_id").alias(id_col), "cluster", "dist")
    base.unpersist()
    return out, centroids
