"""Vector-similarity operators over an ``array<float>`` embedding column.

- ``cosine``: pure Catalyst higher-order-function expression
  (zip_with product + ordered left-fold sum) — deterministic double math,
  no UDF, fully codegen'd.
- ``brute_force_topk``: queries × corpus with the small side broadcast →
  per-partition score + rank-limited window. The baseline every ANN
  variant is measured against.
- ``sign_near_dups``: single-band axis-sign LSH — simple, oracle-matched,
  but NOT the scale path: axis-sign bits on biased embedding corpora
  (post-LayerNorm dims have strongly non-random signs) concentrate mass
  into few buckets → O(bucket²) verify blowup.
- ``sign_banded_near_dups``: the 100 TB path. ``bands`` independent
  difference-hyperplane projections (bit = sign(x[i]−x[j]) for
  deterministic md5-derived index pairs — zero-mean on biased corpora,
  so buckets stay balanced where axis signs collapse), pairs from ANY
  band, plus an optional per-bucket size cap with hash-salt splitting.
- ``ivf_topk``: inverted-file search over a coarse partition column
  (here the pre-assigned ``label``; in production the centroid id from a
  k-means fit) — probes only matching partitions.
"""

from __future__ import annotations

import hashlib

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


def hyperplane_index_pairs(bits: int, bands: int) -> list[list[tuple[int, int]]]:
    """Deterministic (i1, i2) dimension-index pairs for every (band, bit),
    derived from md5 so Spark and any SQL oracle agree byte-for-byte.

    Indices are huge ints reduced mod the runtime vector length n as
        i1 = h1 % n
        i2 = (i1 + 1 + h2 % (n-1)) % n      (provably != i1)
    Returned values are the raw (h1, h2) hashes; callers apply the mod
    against their engine's ``len(vec)``."""
    out = []
    for j in range(bands):
        row = []
        for b in range(bits):
            h1 = int(hashlib.md5(f"{j}:{b}:a".encode()).hexdigest()[:8], 16)
            h2 = int(hashlib.md5(f"{j}:{b}:b".encode()).hexdigest()[:8], 16)
            row.append((h1, h2))
        out.append(row)
    return out


def banded_sign_keys(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id, band, key): one row per (vector, band) with the band's
    difference-hyperplane signature string.

    Each bit is sign(x[i1] − x[i2]) for an md5-derived index pair — a
    hyperplane with +1/−1 weights on two dimensions. Unlike raw axis
    signs, the difference of two same-distribution dimensions is
    ~zero-mean even when every dimension is biased (the post-LayerNorm
    regime), so the 2^bits buckets stay balanced and the per-bucket
    verify join stays O(cap²), not O(corpus²)."""
    v = F.col(vec_col).cast("array<double>")
    n = F.size(v)
    band_cols = []
    for j, row in enumerate(hyperplane_index_pairs(bits, bands)):
        bits_exprs = []
        for h1, h2 in row:
            i1 = F.lit(h1) % n
            i2 = (i1 + 1 + F.lit(h2) % (n - 1)) % n
            diff = F.element_at(v, (i1 + 1).cast("int")) - F.element_at(v, (i2 + 1).cast("int"))
            bits_exprs.append(F.when(diff >= 0, "1").otherwise("0"))
        band_cols.append(
            F.struct(F.lit(j).alias("band"), F.concat_ws("", *bits_exprs).alias("key"))
        )
    return (
        df.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))
        .select(id_col, "bk.band", "bk.key")
    )


def sign_banded_near_dups(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 4,
    bucket_cap: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: candidates from ANY of
    ``bands`` independent difference-hyperplane bands, verified with
    exact cosine ≥ threshold.

    Scale shape: the candidate join keys on (band, key[, salt]) — one
    shuffle of ``corpus × bands`` rows, never all-pairs. ``bucket_cap``
    bounds the worst bucket: members of a bucket with n > cap are
    hash-split into ceil(n/cap) salt groups, capping the per-bucket join
    at O(cap²) rows regardless of corpus skew. Cross-salt pairs inside an
    oversized bucket are sacrificed for that band — a true near-dup pair
    still surfaces through any of the other independent bands, the same
    recall argument the MinHash banding lane makes. Verification joins
    vectors back by id (candidate set << corpus), exact cosine decides."""
    keyed = banded_sign_keys(corpus, id_col, vec_col, bits, bands)
    if bucket_cap is not None:
        sizes = keyed.groupBy("band", "key").agg(F.count("*").alias("_n"))
        keyed = keyed.join(sizes, ["band", "key"]).withColumn(
            "salt",
            F.when(
                F.col("_n") > bucket_cap,
                F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.ceil(F.col("_n") / bucket_cap)),
            ).otherwise(F.lit(0)),
        )
    else:
        keyed = keyed.withColumn("salt", F.lit(0))
    a = keyed.select(F.col(id_col).alias("id_a"), "band", "key", "salt")
    b = keyed.select(F.col(id_col).alias("id_b"), "band", "key", "salt")
    pairs = (
        a.join(b, ["band", "key", "salt"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = F.col(vec_col).cast("array<double>")
    va = corpus.select(F.col(id_col).alias("id_a"), v.alias("v_a"))
    vb = corpus.select(F.col(id_col).alias("id_b"), v.alias("v_b"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
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
        # distances round to 9 before the argmin (ties then break toward
        # the lower cluster index via first-min array_position), so the
        # assignment is engine- and parallelism-exact
        dists = F.array(*[F.round(_sq_dist_to(F.col("_v"), c), 9) for c in cents])
        return base.select(
            "_id",
            "_v",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
            F.round(F.sqrt(F.array_min(dists)), 6).alias("dist"),
        )

    for _ in range(iterations):
        assigned = assign(centroids)
        # centroid update as an exact decimal mean (rounded-12 summands,
        # order-independent sum, one double division) — the collected
        # centroid literals are therefore bit-identical to what any SQL
        # twin of this loop computes, making the whole fixpoint
        # oracle-matchable (see queries/vectors._kmeans_oracle_ctes)
        new_rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.round(F.col("val"), 12).cast("DECIMAL(28,12)")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("mean")
            )
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


def _int_dot(a: Column, b: Column) -> Column:
    """Ordered left-fold integer dot product (exact in any order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantized_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage ANN: int8-quantized prefilter scan → exact rerank of the
    shortlist — the memory-bound production pattern (store 4x-smaller
    codes hot, touch full-precision vectors only for ``prefilter``
    candidates per query).

    Stage 1 scores approximate cosine from integer code dots (the
    per-vector max-abs scale cancels in cosine, so codes alone suffice;
    integer sums are exact in any order → deterministic). Stage 2
    re-scores the top-``prefilter`` survivors with exact double cosine.

    Scale shape: queries broadcast, corpus scanned once; two rank-limited
    windows on qid. At 100 TB stage 1 reads the int8 code column only
    (4x less I/O than the float corpus — with column pruning the floats
    are fetched just for shortlist rows); compose with ``ivf_topk`` to
    also cut the scanned fraction.
    """
    def with_codes(df: DataFrame, p: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
        return (
            df.select(F.col(id_col).alias(f"{p}id"), v.alias(f"{p}vec"), scale.alias("_s"))
            .where(F.col("_s") > 0)
            .select(
                f"{p}id",
                f"{p}vec",
                F.transform(F.col(f"{p}vec"), lambda x: F.round(x / F.col("_s") * 127.0).cast("int")).alias(
                    f"{p}codes"
                ),
            )
        )

    q = with_codes(queries, "q")
    c = with_codes(corpus, "n")
    approx = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            "qvec",
            "nvec",
            F.round(
                _int_dot(F.col("qcodes"), F.col("ncodes"))
                / (
                    F.sqrt(_int_dot(F.col("qcodes"), F.col("qcodes")))
                    * F.sqrt(_int_dot(F.col("ncodes"), F.col("ncodes")))
                ),
                round_digits,
            ).alias("asim"),
        )
    )
    w1 = Window.partitionBy("qid").orderBy(F.desc("asim"), F.asc("nid"))
    shortlist = approx.withColumn("prerank", F.row_number().over(w1)).where(
        F.col("prerank") <= prefilter
    )
    rescored = shortlist.select(
        "qid",
        "nid",
        F.round(cosine(F.col("qvec"), F.col("nvec")), round_digits).alias("sim"),
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return rescored.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    pairwise cosine is computed only WITHIN a coarse cluster, and a row
    is dropped when a lower-id row of the same cluster sits within the
    similarity threshold.

    The keep rule is greedy-by-id ("dup iff ANY lower-id in-cluster
    neighbor with cos >= t"), which is deterministic, order-independent
    and exactly SQL-expressible — no iterative fixpoint. Output: every
    vector with its cluster, keep decision, and the earliest lower-id
    neighbor that shadows it (NULL for kept rows).

    Scale shape: ONE shuffle on the cluster id; per-cluster cost is
    O(|cluster|²) vector dots, which is the SemDeDup contract — the
    cluster count is chosen (k ≈ sqrt(N) upstream k-means, here the
    embedding table's label) precisely to bound cluster size. Skewed
    mega-clusters would use the same salt-cap treatment as
    sign_banded_near_dups; the exact variant keeps every pair so the
    keep decision stays exact."""
    v = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    a = v.select("cluster", F.col(id_col).alias("id_a"), F.col("e").alias("e_a"))
    b = v.select("cluster", F.col(id_col).alias("id_b"), F.col("e").alias("e_b"))
    shadow = (
        a.join(b, "cluster")
        .where(F.col("id_b") < F.col("id_a"))
        .where(F.round(cosine(F.col("e_a"), F.col("e_b")), round_digits) >= threshold)
        .groupBy("cluster", "id_a")
        .agg(F.min("id_b").alias("dup_of"))
    )
    return (
        v.join(shadow.withColumnRenamed("id_a", id_col), ["cluster", id_col], "left")
        .select(
            F.col(id_col),
            "cluster",
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
    )


def random_projection_signs(in_dim: int, out_dim: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix (md5-seeded, engine-portable:
    sign(i,j) = +1 iff the first hex digit of md5("rp|i|j") is even).
    Materialized as Python literals so BOTH engines fold it into the
    projection expression — no randomness at runtime, no state."""
    rows = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            d = hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest()
            row.append(1 if int(d[0], 16) % 2 == 0 else -1)
        rows.append(row)
    return rows


def random_projection(
    corpus: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss sketch: project ``in_dim`` embeddings to
    ``out_dim`` with a deterministic ±1 matrix, scaled by 1/sqrt(out_dim)
    (Achlioptas 2003 — database-friendly random projections). Output one
    (vec_id, j, p) row per projected coordinate so every result column
    is a hashable scalar.

    Scale shape: pure per-row projection — the sign matrix is a folded
    literal, each output coordinate is a fixed left-to-right chain of
    multiply-adds (identical IEEE order in any engine), no shuffle, no
    UDF. At 100 TB this pipelines with the scan; the sketch then feeds
    cheaper downstream ANN/clustering at out_dim/in_dim the width."""
    signs = random_projection_signs(in_dim, out_dim)
    e = F.col(vec_col).cast("array<double>")
    scale = 1.0 / (out_dim ** 0.5)
    cols = []
    for j in range(out_dim):
        term: Column | None = None
        for i in range(in_dim):
            t = F.element_at(e, i + 1) * F.lit(float(signs[j][i]))
            term = t if term is None else term + t
        cols.append(F.round(term * F.lit(scale), round_digits).alias(f"__p{j}"))
    # 8 independent projected columns, then stack to (j, p) rows: keeps
    # every multiply-add chain its own codegen'd expression — a single
    # explode(array(struct...)) of all chains is one giant Generate
    # expression and trips janino's 64 KB method limit into interpreted
    # fallback (observed at in_dim=64).
    staged = corpus.select(F.col(id_col), *cols)
    stack = ", ".join(f"{j}, __p{j}" for j in range(out_dim))
    return staged.select(
        F.col(id_col), F.expr(f"stack({out_dim}, {stack}) AS (j, p)")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "id",
    score_col: str = "rel",
    vec_col: str = "e",
    round_digits: int = 6,
) -> list[tuple]:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) of
    a SHORTLIST: greedily pick the candidate maximizing
    ``λ·relevance − (1−λ)·max_cosine_to_already_selected``.

    Greedy selection is inherently sequential, so this runs k driver
    iterations — but each iteration is one Spark job over the shortlist
    relation (tens of rows by construction: an upstream ANN/BM25 stage
    already rank-limited it), the selected vectors fold into the scoring
    expression as literals (no join, no shuffle), and exactly ONE row is
    collected per step. Driver memory is O(k·dim), never corpus-sized.
    Ties break by id; scores are rounded before comparison so the
    selection is reproducible at any parallelism.

    Returns the selected rows as (rank, id, rel, mmr) tuples — a
    driver-side list by design (k rows; callers needing a DataFrame
    create one, as the gate query does)."""
    selected: list[tuple] = []
    sel_vecs: list[list[float]] = []
    remaining = candidates.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("rel"),
        F.col(vec_col).cast("array<double>").alias("e"),
    ).persist()
    try:
        for step in range(k):
            if sel_vecs:
                sims = [
                    cosine(F.col("e"), F.array(*[F.lit(float(x)) for x in sv]))
                    for sv in sel_vecs
                ]
                max_sim = sims[0] if len(sims) == 1 else F.greatest(*sims)
            else:
                max_sim = F.lit(0.0)
            mmr = F.round(
                F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * max_sim, round_digits
            )
            top = (
                remaining.withColumn("mmr", mmr)
                .orderBy(F.desc("mmr"), F.asc("id"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            row = top[0]
            selected.append((step + 1, row["id"], row["rel"], row["mmr"]))
            sel_vecs.append(list(row["e"]))
            remaining = remaining.where(F.col("id") != row["id"])
        return selected
    finally:
        remaining.unpersist()


def pq_subvectors(
    df: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, m, s): each vector split into ``m`` contiguous ``sub_dim``
    subvectors — the product-quantization decomposition (Jégou et al.
    2011). Pure per-row explode of array slices; no shuffle."""
    v = F.col(vec_col).cast("array<double>")
    parts = F.array(
        *[
            F.struct(
                F.lit(j).alias("m"),
                F.slice(v, j * sub_dim + 1, sub_dim).alias("s"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(parts).alias("p")).select(
        id_col, "p.m", "p.s"
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Ordered left-fold squared L2 distance of two array<double> cols."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    corpus: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    codebook_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, m, c): the ``codebook_k`` lowest-id corpus vectors'
    subvectors — a deterministic sampled codebook (k-means init without
    iterations; swap in per-subspace k-means offline when recall demands
    it). k·m rows total — KBs at any corpus size."""
    return pq_subvectors(
        corpus.where(F.col(id_col) < codebook_k), m, sub_dim, id_col, vec_col
    ).select(F.col(id_col).alias("cid"), "m", F.col("s").alias("c"))


def pq_distances(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(id, m, cid, dist): rounded squared-L2 from every vector's m-th
    subvector to every codebook centroid of subspace m. The codebook is
    broadcast, so this is one corpus scan with no shuffle."""
    sub = pq_subvectors(vectors, m, sub_dim, id_col, vec_col)
    return sub.join(F.broadcast(codebook), "m").select(
        id_col,
        "m",
        "cid",
        F.round(_sq_dist(F.col("s"), F.col("c")), round_digits).alias("dist"),
    )


def pq_encode(
    corpus: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    codebook_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(id, m, code, dist): PQ codes — per subspace, the argmin-distance
    centroid id (ties break toward the lower centroid id; distances are
    rounded first so the argmin is engine- and partitioning-stable).

    This is the 100 TB ANN storage shape: m bytes/vector (here m=8 →
    8 bytes vs 256 bytes of float32), computed in one scan with the
    codebook broadcast. The per-(id, m) argmin is a rank-limited window
    keyed by the id — one shuffle on the vector id, nothing pairwise."""
    cb = pq_codebook(corpus, m, sub_dim, codebook_k, id_col, vec_col)
    d = pq_distances(corpus, cb, m, sub_dim, id_col, vec_col, round_digits)
    w = Window.partitionBy(id_col, "m").orderBy("dist", "cid")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "m", F.col("cid").alias("code"), "dist")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    codebook_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: approximate nearest neighbors
    by summing, per subspace, the query→centroid distance of each corpus
    vector's stored code (Jégou et al. 2011, Eq. 13).

    Scale shape: the query LUT is queries × m × codebook_k rows (KBs) and
    broadcasts; corpus codes are scanned once and aggregated by
    (qid, nid) — map-side partial sums bound the shuffle at one row per
    (partition, query, neighbor-in-shortlist). Per-subspace distances are
    rounded then summed as DECIMAL so the total is exact in any
    aggregation order; ties rank by neighbor id."""
    cb = pq_codebook(corpus, m, sub_dim, codebook_k, id_col, vec_col)
    codes = pq_encode(corpus, m, sub_dim, codebook_k, id_col, vec_col, round_digits)
    lut = pq_distances(queries, cb, m, sub_dim, id_col, vec_col, round_digits).select(
        F.col(id_col).alias("qid"), "m", "cid", F.col("dist").alias("qdist")
    )
    approx = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["m"]) & (codes["code"] == lut["cid"]),
        )
        .where(F.col("qid") != F.col(id_col))
        .groupBy("qid", F.col(id_col).alias("nid"))
        .agg(
            F.sum(F.col("qdist").cast("DECIMAL(18,6)")).cast("double").alias("adist")
        )
    )
    w = Window.partitionBy("qid").orderBy("adist", F.asc("nid"))
    return approx.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def cell_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, cvec): per-cell centroid as an exact decimal mean per
    dimension (rounded-6 DECIMAL sum / count → double), rebuilt into an
    array ordered by dimension. Engine-exact: any SQL twin computing the
    same formula lands on identical doubles. Cells × dim rows — always
    broadcast-sized."""
    flat = corpus.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    means = flat.groupBy("cell", "dim").agg(
        (
            F.round(F.sum(F.col("x").cast("DECIMAL(28,12)")), 6).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m")
    )
    return means.groupBy("cell").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    codebook_k: int = 16,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ search (Jégou et al. 2011 §V): the production big-corpus
    vector index — coarse cells prune the scan (nprobe=1: only the
    query's cell is read), and within cells vectors are stored as PQ
    codes of their RESIDUAL from the cell centroid (residuals are
    near-zero-mean, so a small shared codebook quantizes them far better
    than raw vectors). Distance = ADC over the residual codes against a
    per-(query, cell) LUT of residual-subvector distances.

    Scale shape: centroids (cells × dim) and the codebook (k·m
    subvectors) broadcast; residual computation and encoding are one
    corpus scan + one (id, m) argmin window; search reads 8-byte codes
    of ONE cell per query and aggregates DECIMAL-exact partial sums.
    Composes the ivf_topk pruning with pq_adc_topk compression — at
    100 TB this is ~32x less I/O on 1/cells of the corpus."""
    cents = cell_centroids(corpus, cell_col, id_col, vec_col)
    e = F.col(vec_col).cast("array<double>")

    def residuals(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(cents), F.col(cell_col) == F.col("cell"))
            .select(
                F.col(id_col),
                "cell",
                F.zip_with(e, F.col("cvec"), lambda a, b: a - b).alias("rvec"),
            )
        )

    r_corpus = residuals(corpus)
    cb = pq_codebook(r_corpus, m, sub_dim, codebook_k, id_col, "rvec")
    codes = pq_encode(r_corpus, m, sub_dim, codebook_k, id_col, "rvec", round_digits)
    codes = codes.join(r_corpus.select(id_col, "cell"), id_col)
    lut = pq_distances(
        residuals(queries), cb, m, sub_dim, id_col, "rvec", round_digits
    ).join(residuals(queries).select(F.col(id_col), F.col("cell").alias("qcell")), id_col)
    lut = lut.select(
        F.col(id_col).alias("qid"), "qcell", "m", "cid", F.col("dist").alias("qdist")
    )
    approx = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["m"])
            & (codes["code"] == lut["cid"])
            & (codes["cell"] == lut["qcell"]),
        )
        .where(F.col("qid") != F.col(id_col))
        .groupBy("qid", F.col(id_col).alias("nid"))
        .agg(F.sum(F.col("qdist").cast("DECIMAL(18,6)")).cast("double").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy("adist", F.asc("nid"))
    return approx.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF search with nprobe > 1: each query probes its ``nprobe``
    nearest coarse cells (by rounded exact-decimal centroid distance,
    cell-id tiebreak) instead of only its own — the recall knob every
    IVF deployment turns when nprobe=1 misses cross-cell neighbors.

    Scale shape: centroids broadcast (cells × dim); the probe set is
    queries × nprobe rows and broadcasts into the cell equi-join, so the
    corpus scan fraction is nprobe/cells — still never all-pairs."""
    cents = cell_centroids(corpus, cell_col, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    qd = q.crossJoin(F.broadcast(cents)).select(
        "qid",
        "qvec",
        "cell",
        F.round(_sq_dist(F.col("qvec"), F.col("cvec")), 9).alias("cdist"),
    )
    w = Window.partitionBy("qid").orderBy("cdist", "cell")
    probes = (
        qd.withColumn("__pr", F.row_number().over(w))
        .where(F.col("__pr") <= nprobe)
        .select("qid", "qvec", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("qvec"), F.col("nvec")), round_digits).alias("sim"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(wr)).where(F.col("rank") <= k)
