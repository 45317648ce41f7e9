"""Similarity-search queries over ``embeddings`` (array<float>, 64-dim).

Wrappers over :mod:`sinker_spark.operators.similarity`. Scores are
rounded to 6 decimals before ranking/filtering in BOTH engines so float
last-ulp differences between independent cosine implementations can't
change result sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables
from sinker_spark.operators import similarity
from sinker_spark.queries import query

# DuckDB-side cosine on DOUBLE lists (explicit dot/norms so the formula
# matches operators/similarity.cosine exactly: dot / (sqrt(na)*sqrt(nb)))
_COS = (
    "round(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))"
    " / (sqrt(list_sum(list_transform(a.e, x -> x * x)))"
    " * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6)"
)


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid, {_COS} AS sim
      FROM (SELECT * FROM v WHERE vec_id < 10) a
      JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT qid, nid, sim, rank FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      FROM scored
    ) t WHERE rank <= 5""",
    doc="brute-force cosine top-k (operators/similarity.brute_force_topk): broadcast query batch × corpus scan, rank-limited window — the exact baseline for ANN variants",
    tags=("similarity-topk",),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5).select("qid", "nid", "sim", "rank")


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid, {_COS} AS sim
      FROM (SELECT * FROM v WHERE vec_id < 20) a
      JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT qid, nid, sim, rank FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      FROM scored
    ) t WHERE rank <= 3""",
    doc="IVF-style ANN (operators/similarity.ivf_topk): probe only the query's coarse cell — shuffle partitioned by cell id, each executor scores one cell",
    tags=("similarity-ivf",),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ivf_topk(emb, queries, k=3).select("qid", "nid", "sim", "rank")


@query(
    "embedding_centroids_by_label",
    oracle="""
    WITH flat AS (
      SELECT label,
             generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings
    ),
    means AS (
      SELECT label, CAST(dim AS INT) AS dim,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
      FROM flat GROUP BY label, dim
    )
    SELECT label, dim, round(m, 8) AS c, CAST(n AS BIGINT) AS n_members
    FROM means JOIN (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label) c USING (label)""",
    doc="coarse-quantizer training step for IVF (operators/similarity.ivf_topk): element-wise decimal-exact mean per label — posexplode → two-level agg, the one-iteration k-means update at any scale. One row per (label, dim) so every output column is a hashable scalar for the harness.",
    tags=("similarity-train",),
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    flat = t["embeddings"].select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x"),
    )
    means = flat.groupBy("label", "dim0").agg(
        (F.round(F.sum(F.col("x").cast("DECIMAL(28,12)")), 6).cast("double") / F.count("*").cast("double")).alias("m")
    )
    counts = t["embeddings"].groupBy("label").agg(F.count("*").alias("n_members"))
    return (
        means.join(counts, "label")
        .select(
            "label",
            (F.col("dim0") + 1).cast("int").alias("dim"),
            F.round("m", 8).alias("c"),
            "n_members",
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scaled AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS scale
      FROM v
    )
    SELECT vec_id, round(scale, 8) AS scale,
           array_to_string(list_transform(e, x -> CAST(round(x / scale * 127.0) AS INT)), ',') AS q
    FROM scaled WHERE scale > 0""",
    doc="int8 scalar quantization of embeddings (4x memory at 100 TB ANN scale): per-vector max-abs scale, round-to-int8 codes (reconstruction-error bound asserted in tests/test_operators.py) — all Catalyst array expressions; codes serialized to a CSV string (int→string is engine-identical) so the harness can hash them",
    tags=("similarity-quantize",),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = F.col("embedding").cast("array<double>")
    v = t["embeddings"].select("vec_id", e.alias("e"))
    scaled = v.select(
        "vec_id", "e", F.array_max(F.transform("e", lambda x: F.abs(x))).alias("scale")
    ).where(F.col("scale") > 0)
    q = F.transform("e", lambda x: F.round(x / F.col("scale") * 127.0).cast("int"))
    return scaled.select(
        "vec_id",
        F.round("scale", 8).alias("scale"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q"),
    )


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             array_to_string(list_transform(CAST(embedding AS DOUBLE[])[1:16],
                             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS sig
      FROM embeddings
    )
    SELECT id_a, id_b, sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS sim
      FROM v a JOIN v b ON a.sig = b.sig AND a.vec_id < b.vec_id
    ) t WHERE sim >= 0.2""",
    doc="embedding near-dup via sign-bit LSH buckets + cosine verify (operators/similarity.sign_near_dups): candidate set O(bucket²), not O(corpus²)",
    tags=("dedup-embedding",),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return similarity.sign_near_dups(t["embeddings"], threshold=0.2)


_BANDED_BITS, _BANDED_BANDS = 6, 4


def _banded_oracle(bits: int, bands: int, threshold: float) -> str:
    """DuckDB twin of operators/similarity.sign_banded_near_dups, built
    from the SAME md5-derived (h1, h2) hyperplane table so the two
    engines cannot drift."""

    def band_key(row: list[tuple[int, int]]) -> str:
        bits_sql = []
        for h1, h2 in row:
            i1 = f"({h1} % len(e))"
            i2 = f"((({h1} % len(e)) + 1 + ({h2} % (len(e) - 1))) % len(e))"
            bits_sql.append(
                f"CASE WHEN e[{i1} + 1] - e[{i2} + 1] >= 0 THEN '1' ELSE '0' END"
            )
        return " || ".join(bits_sql)

    rows = similarity.hyperplane_index_pairs(bits, bands)
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, e, {j} AS band, {band_key(row)} AS key FROM v"
        for j, row in enumerate(rows)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    k AS ({band_selects}),
    cand AS (
      SELECT DISTINCT ka.vec_id AS id_a, kb.vec_id AS id_b
      FROM k ka JOIN k kb ON ka.band = kb.band AND ka.key = kb.key AND ka.vec_id < kb.vec_id
    )
    SELECT id_a, id_b, sim FROM (
      SELECT c.id_a, c.id_b, {_COS} AS sim
      FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b
    ) t WHERE sim >= {threshold}"""


@query(
    "embedding_near_dup_banded",
    oracle=_banded_oracle(_BANDED_BITS, _BANDED_BANDS, 0.2),
    doc=(
        "embedding near-dup via multi-band difference-hyperplane LSH "
        "(operators/similarity.sign_banded_near_dups): bit = sign(x[i]-x[j]) "
        "for md5-derived index pairs — zero-mean on biased (post-LayerNorm) "
        "corpora where raw axis signs collapse into mega-buckets; candidates "
        "from ANY band, exact-cosine verify; optional bucket_cap salt-split "
        "bounds the worst bucket at O(cap²)"
    ),
    tags=("dedup-embedding",),
)
def embedding_near_dup_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return similarity.sign_banded_near_dups(
        t["embeddings"], threshold=0.2, bits=_BANDED_BITS, bands=_BANDED_BANDS
    )


def _kmeans_oracle_ctes(k: int, iterations: int) -> tuple[str, str]:
    """DuckDB twin of operators/similarity.kmeans: Lloyd's iterations
    unrolled into chained materialized CTEs. Returns (sql_prefix,
    final_assignment_cte) where the final CTE has (vec_id, e, cluster,
    dist) — dist is the rounded-9 squared distance of the winning
    cluster. Exactness contract shared with the operator: distances
    round to 9 before the (dist, cid) argmin; centroid updates are
    rounded-12 DECIMAL means; empty clusters keep their previous
    centroid."""
    sq = (
        "round(list_sum(list_transform(range(1, len(v.e) + 1),"
        " t -> (v.e[t] - c.c[t]) * (v.e[t] - c.c[t]))), 9)"
    )
    parts = [
        f"""
    WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c0 AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e AS c
      FROM v ORDER BY vec_id LIMIT {k}
    )"""
    ]
    prev = "c0"
    for i in range(1, iterations + 2):
        parts.append(
            f"""
    d{i} AS MATERIALIZED (
      SELECT v.vec_id, v.e, c.cid, {sq} AS dist
      FROM v CROSS JOIN {prev} c
    ),
    a{i} AS MATERIALIZED (
      SELECT vec_id, e, cid AS cluster, dist FROM (
        SELECT vec_id, e, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d{i}) t
      WHERE rn = 1
    )"""
        )
        if i == iterations + 1:
            break  # final pass assigns only; no further update
        parts.append(
            f"""
    u{i} AS MATERIALIZED (
      SELECT cluster AS cid, CAST(dim AS INT) AS dim,
             CAST(SUM(CAST(round(x, 12) AS DECIMAL(28,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS m
      FROM (
        SELECT a.cluster, generate_subscripts(a.e, 1) AS dim, unnest(a.e) AS x
        FROM a{i} a) f
      GROUP BY cluster, dim
    ),
    c{i} AS MATERIALIZED (
      SELECT p.cid, coalesce(n.c, p.c) AS c
      FROM {prev} p LEFT JOIN (
        SELECT cid, list(m ORDER BY dim) AS c FROM u{i} GROUP BY cid) n
      ON p.cid = n.cid
    )"""
        )
        prev = f"c{i}"
    return ",".join(parts), f"a{iterations + 1}"


_KM_PREFIX, _KM_FINAL = _kmeans_oracle_ctes(k=4, iterations=3)


@query(
    "kmeans_embedding_clusters",
    oracle=_KM_PREFIX
    + f"""
    SELECT vec_id, CAST(cluster AS INT) AS cluster, round(sqrt(dist), 6) AS dist
    FROM {_KM_FINAL}""",
    doc=(
        "Lloyd's k-means (operators/similarity.kmeans, k=4, 3 iterations): "
        "the coarse-quantizer trainer for the IVF lane — assignment is a "
        "shuffle-free per-row argmin over a centroid literal, update is one "
        "k×dim-bounded aggregation per pass. The iterative float fixpoint "
        "is oracle-matched: distances round to 9 before the argmin and "
        "centroid means are rounded-DECIMAL-exact, so the unrolled-CTE "
        "twin walks the identical trajectory; also numpy-verified in "
        "tests/test_operators.py"
    ),
    tags=("similarity-train", "iterative", "kmeans"),
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.similarity import kmeans

    t = load_tables(spark, sf_dir)
    assigned, _ = kmeans(t["embeddings"], k=4, iterations=3)
    return assigned


_KM2_PREFIX, _KM2_FINAL = _kmeans_oracle_ctes(k=4, iterations=2)


@query(
    "ann_ivf_trained_topk",
    oracle=_KM2_PREFIX
    + f"""
    , cells AS MATERIALIZED (SELECT vec_id, e, cluster FROM {_KM2_FINAL})
    SELECT qid, nid, sim, rank FROM (
      SELECT a.vec_id AS qid, b.vec_id AS nid, {_COS} AS sim,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY {_COS} DESC, b.vec_id) AS rank
      FROM (SELECT * FROM cells WHERE vec_id % 100 = 0) a
      JOIN cells b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
    ) t WHERE rank <= 3""",
    doc=(
        "end-to-end trained IVF ANN: k-means fit (similarity.kmeans, k=4) "
        "assigns every vector its learned coarse cell, then ivf_topk "
        "probes only the query's cell — the full production ANN path "
        "(train → assign → partitioned probe) in one query. Oracle-"
        "matched via the unrolled exact-k-means CTEs + the cell-join "
        "probe; recall-vs-brute-force also asserted in "
        "tests/test_operators.py"
    ),
    tags=("similarity-ivf", "similarity-train", "iterative"),
)
def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.similarity import ivf_topk, kmeans

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    assigned, _ = kmeans(emb, k=4, iterations=2)
    with_cell = emb.join(assigned.select("vec_id", "cluster"), "vec_id")
    queries_df = with_cell.where(F.col("vec_id") % 100 == 0)
    return ivf_topk(with_cell, queries_df, k=3, cell_col="cluster")


_QR_IDOT = (
    "list_sum(list_transform(range(1, len(a.codes) + 1), i -> a.codes[i] * b.codes[i]))"
    " / (sqrt(list_sum(list_transform(a.codes, x -> x * x)))"
    " * sqrt(list_sum(list_transform(b.codes, x -> x * x))))"
)


@query(
    "ann_quantized_rerank_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (
      SELECT vec_id, e,
             list_transform(e, x -> CAST(round(x / s * 127.0) AS BIGINT)) AS codes
      FROM (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS s FROM v) t
      WHERE s > 0
    ),
    cand AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid, a.e AS qe, b.e AS ne,
             round({_QR_IDOT}, 6) AS asim
      FROM (SELECT * FROM c WHERE vec_id < 10) a JOIN c b ON a.vec_id <> b.vec_id
    ),
    short AS (
      SELECT qid, nid, qe, ne FROM (
        SELECT qid, nid, qe, ne,
               row_number() OVER (PARTITION BY qid ORDER BY asim DESC, nid) AS pr
        FROM cand) t WHERE pr <= 25
    ),
    exact AS (
      SELECT qid, nid,
             round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ne[i]))
                   / (sqrt(list_sum(list_transform(qe, x -> x * x)))
                      * sqrt(list_sum(list_transform(ne, x -> x * x)))), 6) AS sim
      FROM short
    )
    SELECT qid, nid, sim, rank FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      FROM exact
    ) t WHERE rank <= 5""",
    doc=(
        "two-stage ANN (operators/similarity.quantized_rerank_topk): int8 "
        "code prefilter (integer dots — exact, order-independent; scale "
        "cancels in cosine) shortlists 25 per query, exact double cosine "
        "reranks to top-5 — the memory-bound production pattern: codes are "
        "4x smaller hot data, floats touched only for the shortlist"
    ),
    tags=("similarity-topk", "similarity-quantize"),
)
def ann_quantized_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.quantized_rerank_topk(emb, queries, k=5, prefilter=25).select(
        "qid", "nid", "sim", "rank"
    )


_PQ_M, _PQ_SUB, _PQ_K = 8, 8, 16


def _pq_oracle_ctes(m: int, sub_dim: int, k: int) -> str:
    """DuckDB twin of operators/similarity.pq_encode: same slicing, same
    rounded squared-L2, same (dist, cid) argmin — generated from the SAME
    constants so the two engines cannot drift."""
    sub_selects = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS m, e[{j * sub_dim + 1}:{(j + 1) * sub_dim}] AS s FROM v"
        for j in range(m)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sub AS ({sub_selects}),
    cb AS (SELECT vec_id AS cid, m, s AS c FROM sub WHERE vec_id < {k}),
    d AS (
      SELECT sub.vec_id, sub.m, cb.cid,
             round(list_sum(list_transform(range(1, {sub_dim + 1}),
                    i -> (sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i]))), 6) AS dist
      FROM sub JOIN cb ON sub.m = cb.m
    ),
    codes AS (
      SELECT vec_id, m, cid AS code, dist FROM (
        SELECT vec_id, m, cid, dist,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
        FROM d) t
      WHERE rn = 1
    )"""


@query(
    "pq_encode_codes",
    oracle=_pq_oracle_ctes(_PQ_M, _PQ_SUB, _PQ_K)
    + """
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes,
           CAST(SUM(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS qerr
    FROM codes GROUP BY vec_id""",
    doc=(
        "product-quantization encoding (operators/similarity.pq_encode, "
        "Jégou et al. 2011): 64-dim vectors → 8 subspace codes against a "
        "deterministic 16-centroid sampled codebook — 8 bytes/vector, the "
        "32x-compressed ANN storage shape at 100 TB. Codebook broadcasts "
        "(k·m rows), corpus scanned once; per-(id,m) argmin via rounded "
        "distances with cid tiebreak so both engines pick identical codes. "
        "Codes serialized m-ordered CSV; qerr = exact DECIMAL sum of "
        "per-subspace quantization error"
    ),
    tags=("similarity-quantize", "similarity-pq"),
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    codes = similarity.pq_encode(
        t["embeddings"], m=_PQ_M, sub_dim=_PQ_SUB, codebook_k=_PQ_K
    )
    return codes.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("m", "code"))),
                lambda x: x["code"].cast("string"),
            ),
            ",",
        ).alias("codes"),
        F.sum(F.col("dist").cast("DECIMAL(18,6)")).cast("double").alias("qerr"),
    )


@query(
    "ann_pq_adc_topk",
    oracle=_pq_oracle_ctes(_PQ_M, _PQ_SUB, _PQ_K)
    + """
    , lut AS (SELECT vec_id AS qid, m, cid, dist AS qdist FROM d WHERE vec_id < 10),
    approx AS (
      SELECT lut.qid, codes.vec_id AS nid,
             CAST(SUM(CAST(lut.qdist AS DECIMAL(18,6))) AS DOUBLE) AS adist
      FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.cid
      WHERE codes.vec_id <> lut.qid
      GROUP BY 1, 2
    )
    SELECT qid, nid, adist, rank FROM (
      SELECT qid, nid, adist,
             row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
      FROM approx
    ) t WHERE rank <= 5""",
    doc=(
        "PQ asymmetric-distance search (operators/similarity.pq_adc_topk): "
        "per-query LUT of subspace centroid distances (queries×m×k rows, "
        "broadcast) + stored 8-byte codes — approximate top-5 without "
        "touching a float vector; per-subspace distances rounded then "
        "DECIMAL-summed so totals are aggregation-order-exact. The "
        "memory-bound 100 TB scan: 32x less I/O than float cosine, "
        "compose with ivf cells to also cut the scanned fraction"
    ),
    tags=("similarity-pq", "similarity-topk"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries_df = emb.where(F.col("vec_id") < 10)
    return similarity.pq_adc_topk(
        emb, queries_df, k=5, m=_PQ_M, sub_dim=_PQ_SUB, codebook_k=_PQ_K
    ).select("qid", "nid", "adist", "rank")


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (
      SELECT a.vec_id AS qid, a.label AS q_label, b.vec_id AS nid, b.label AS n_label,
             {_COS} AS sim
      FROM (SELECT * FROM v WHERE vec_id < 20) a
      JOIN v b ON a.label <> b.label
    )
    SELECT qid, q_label, nid, n_label, sim, rank FROM (
      SELECT qid, q_label, nid, n_label, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      FROM scored
    ) t WHERE rank <= 3""",
    doc=(
        "hard-negative mining for contrastive embedding training: for "
        "each anchor, the 3 most-similar vectors with a DIFFERENT label "
        "— maximally confusing negatives, the standard dense-retrieval "
        "training-batch construction (in-batch negatives upgrade). Same "
        "broadcast-anchors × one-corpus-scan shape as ann_cosine_topk "
        "with the label inequality fused into the join predicate; at "
        "100 TB compose with the IVF cell filter to cut the scan"
    ),
    tags=("similarity-topk", "training-pipeline", "contrastive"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("q_label"), F.col("embedding").alias("qvec")
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("label").alias("n_label"), F.col("embedding").alias("nvec")
    )
    scored = c.join(F.broadcast(q), F.col("q_label") != F.col("n_label")).select(
        "qid", "q_label", "nid", "n_label",
        F.round(similarity.cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)


def _ivfpq_oracle(m: int, sub_dim: int, k_cb: int, n_queries: int, topk: int) -> str:
    """DuckDB twin of operators/similarity.ivfpq_residual_topk: exact
    decimal cell centroids → residuals → the PQ encode/argmin CTEs on
    residuals → cell-restricted ADC."""
    sub_selects = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS m, rv[{j * sub_dim + 1}:{(j + 1) * sub_dim}] AS s FROM r"
        for j in range(m)
    )
    return f"""
    WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cm AS MATERIALIZED (
      SELECT label, CAST(dim AS INT) AS dim,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 6) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mn
      FROM (SELECT label, generate_subscripts(e, 1) AS dim, unnest(e) AS x FROM v) f
      GROUP BY label, dim
    ),
    cc AS MATERIALIZED (SELECT label, list(mn ORDER BY dim) AS cvec FROM cm GROUP BY label),
    r AS MATERIALIZED (
      SELECT v.vec_id, v.label AS cell,
             list_transform(range(1, len(v.e) + 1), i -> v.e[i] - cc.cvec[i]) AS rv
      FROM v JOIN cc ON v.label = cc.label
    ),
    sub AS MATERIALIZED ({sub_selects}),
    cb AS MATERIALIZED (SELECT vec_id AS cid, m, s AS c FROM sub WHERE vec_id < {k_cb}),
    d AS MATERIALIZED (
      SELECT sub.vec_id, sub.m, cb.cid,
             round(list_sum(list_transform(range(1, {sub_dim + 1}),
                    i -> (sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i]))), 6) AS dist
      FROM sub JOIN cb ON sub.m = cb.m
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, m, cid AS code FROM (
        SELECT vec_id, m, cid, dist,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
        FROM d) t
      WHERE rn = 1
    ),
    cells AS MATERIALIZED (SELECT vec_id, cell FROM r),
    lut AS MATERIALIZED (
      SELECT d.vec_id AS qid, cells.cell AS qcell, d.m, d.cid, d.dist AS qdist
      FROM d JOIN cells ON d.vec_id = cells.vec_id
      WHERE d.vec_id < {n_queries}
    ),
    approx AS MATERIALIZED (
      SELECT lut.qid, codes.vec_id AS nid,
             CAST(SUM(CAST(lut.qdist AS DECIMAL(18,6))) AS DOUBLE) AS adist
      FROM codes
      JOIN cells ON codes.vec_id = cells.vec_id
      JOIN lut ON codes.m = lut.m AND codes.code = lut.cid AND cells.cell = lut.qcell
      WHERE codes.vec_id <> lut.qid
      GROUP BY 1, 2
    )
    SELECT qid, nid, adist, rank FROM (
      SELECT qid, nid, adist,
             row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
      FROM approx
    ) t WHERE rank <= {topk}"""


@query(
    "ann_ivfpq_topk",
    oracle=_ivfpq_oracle(_PQ_M, _PQ_SUB, _PQ_K, n_queries=10, topk=5),
    doc=(
        "IVF-PQ search (operators/similarity.ivfpq_residual_topk, Jégou "
        "et al. 2011 §V) — the production big-corpus vector index: "
        "coarse cells prune the scan to the query's cell (nprobe=1), "
        "and in-cell vectors are stored as 8-byte PQ codes of their "
        "RESIDUAL from the exact-decimal cell centroid (residuals are "
        "near-zero-mean → better quantization per codebook bit). ADC "
        "over a broadcast per-(query, cell) LUT with DECIMAL-exact "
        "partial sums; centroids and codebook broadcast everywhere. "
        "~32x less I/O on 1/cells of the corpus at 100 TB"
    ),
    tags=("similarity-ivf", "similarity-pq", "similarity-topk"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries_df = emb.where(F.col("vec_id") < 10)
    return similarity.ivfpq_residual_topk(
        emb, queries_df, k=5, m=_PQ_M, sub_dim=_PQ_SUB, codebook_k=_PQ_K
    ).select("qid", "nid", "adist", "rank")


@query(
    "ann_recall_mrr_eval",
    oracle=f"""
    WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS MATERIALIZED (SELECT * FROM v WHERE vec_id < 20),
    exact AS MATERIALIZED (
      SELECT qid, nid FROM (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY {_COS} DESC, b.vec_id) AS rank
        FROM q a JOIN v b ON a.vec_id <> b.vec_id
      ) t WHERE rank <= 5
    ),
    approx AS MATERIALIZED (
      SELECT qid, nid, rank FROM (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY {_COS} DESC, b.vec_id) AS rank
        FROM q a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
      ) t WHERE rank <= 5
    )
    SELECT e.qid,
           round(CAST(COUNT(a.nid) AS DOUBLE) / 5.0, 6) AS recall_at_5,
           round(coalesce(1.0 / MIN(a.rank), 0.0), 6) AS mrr
    FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
    GROUP BY e.qid""",
    doc=(
        "index-quality evaluation AS A QUERY: recall@5 and MRR of the "
        "IVF (cell-pruned) neighbor lists against exact brute-force "
        "cosine, per query — the engine measures its own ANN index "
        "inside the same dataflow (ground truth on a query SAMPLE, the "
        "standard offline eval at 100 TB where exhaustive truth on the "
        "full corpus is unaffordable). Composition of two existing "
        "oracle-matched lanes joined on (query, neighbor)"
    ),
    tags=("similarity-eval", "model-eval", "similarity-topk"),
)
def ann_recall_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries_df = emb.where(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, queries_df, k=5).select("qid", "nid")
    approx = similarity.ivf_topk(emb, queries_df, k=5).select(
        "qid", F.col("nid").alias("a_nid"), "rank"
    )
    joined = exact.join(
        approx,
        (exact["qid"] == approx["qid"]) & (exact["nid"] == approx["a_nid"]),
        "left",
    ).select(exact["qid"].alias("q"), "a_nid", "rank")
    return joined.groupBy(F.col("q").alias("qid")).agg(
        F.round(F.count("a_nid").cast("double") / F.lit(5.0), 6).alias("recall_at_5"),
        F.round(F.coalesce(F.lit(1.0) / F.min("rank"), F.lit(0.0)), 6).alias("mrr"),
    )


@query(
    "ann_ndcg_eval",
    oracle=f"""
    WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS MATERIALIZED (SELECT * FROM v WHERE vec_id < 20),
    exact AS MATERIALIZED (
      SELECT qid, nid, rank AS erank FROM (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY {_COS} DESC, b.vec_id) AS rank
        FROM q a JOIN v b ON a.vec_id <> b.vec_id
      ) t WHERE rank <= 5
    ),
    approx AS MATERIALIZED (
      SELECT qid, nid, rank AS arank FROM (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY {_COS} DESC, b.vec_id) AS rank
        FROM q a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
      ) t WHERE rank <= 5
    ),
    dcg AS (
      SELECT a.qid,
             SUM(CAST(round((1.0 / e.erank) / (ln(a.arank + 1.0) / ln(2.0)), 9) AS DECIMAL(28,12))) AS dcg
      FROM approx a JOIN exact e ON a.qid = e.qid AND a.nid = e.nid
      GROUP BY a.qid
    ),
    idcg AS (
      SELECT qid,
             SUM(CAST(round((1.0 / erank) / (ln(erank + 1.0) / ln(2.0)), 9) AS DECIMAL(28,12))) AS idcg
      FROM exact GROUP BY qid
    )
    SELECT i.qid,
           round(coalesce(CAST(d.dcg AS DOUBLE), 0.0), 6) AS dcg,
           round(CAST(i.idcg AS DOUBLE), 6) AS idcg,
           round(coalesce(CAST(d.dcg AS DOUBLE), 0.0) / CAST(i.idcg AS DOUBLE), 6) AS ndcg_at_5
    FROM idcg i LEFT JOIN dcg d ON i.qid = d.qid""",
    doc=(
        "nDCG@5 of the IVF neighbor lists against exact cosine truth "
        "(graded gain = 1/exact-rank, log2 position discount) — "
        "completes the ranking-eval family beside recall@5/MRR: nDCG "
        "rewards putting the BEST neighbors early, not just finding "
        "them. Per-term discounts round to 9 and accumulate as DECIMAL "
        "(ln-ratio log2 keeps both engines on the same libm shape); "
        "same sampled-ground-truth scale contract as ann_recall_mrr_eval"
    ),
    tags=("similarity-eval", "model-eval", "similarity-topk"),
)
def ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries_df = emb.where(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, queries_df, k=5).select(
        "qid", "nid", F.col("rank").alias("erank")
    )
    approx = similarity.ivf_topk(emb, queries_df, k=5).select(
        F.col("qid").alias("aqid"), F.col("nid").alias("anid"), F.col("rank").alias("arank")
    )
    dec = "DECIMAL(28,12)"
    ln2 = F.log(F.lit(2.0))
    dcg = (
        approx.join(
            exact, (F.col("aqid") == F.col("qid")) & (F.col("anid") == F.col("nid"))
        )
        .groupBy(F.col("aqid"))
        .agg(
            F.sum(
                F.round(
                    (F.lit(1.0) / F.col("erank"))
                    / (F.log(F.col("arank") + F.lit(1.0)) / ln2),
                    9,
                ).cast(dec)
            ).alias("dcg")
        )
    )
    idcg = exact.groupBy("qid").agg(
        F.sum(
            F.round(
                (F.lit(1.0) / F.col("erank")) / (F.log(F.col("erank") + F.lit(1.0)) / ln2),
                9,
            ).cast(dec)
        ).alias("idcg")
    )
    return (
        idcg.join(dcg, idcg["qid"] == dcg["aqid"], "left")
        .select(
            "qid",
            F.round(F.coalesce(F.col("dcg").cast("double"), F.lit(0.0)), 6).alias("dcg"),
            F.round(F.col("idcg").cast("double"), 6).alias("idcg"),
            F.round(
                F.coalesce(F.col("dcg").cast("double"), F.lit(0.0))
                / F.col("idcg").cast("double"),
                6,
            ).alias("ndcg_at_5"),
        )
    )


@query(
    "ann_ivf_multiprobe_topk",
    oracle=f"""
    WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cm AS MATERIALIZED (
      SELECT label, CAST(dim AS INT) AS dim,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 6) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mn
      FROM (SELECT label, generate_subscripts(e, 1) AS dim, unnest(e) AS x FROM v) f
      GROUP BY label, dim
    ),
    cc AS MATERIALIZED (SELECT label AS cell, list(mn ORDER BY dim) AS cvec FROM cm GROUP BY label),
    q AS MATERIALIZED (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
    qd AS MATERIALIZED (
      SELECT q.qid, q.qe, cc.cell,
             round(list_sum(list_transform(range(1, len(q.qe) + 1),
                    t -> (q.qe[t] - cc.cvec[t]) * (q.qe[t] - cc.cvec[t]))), 9) AS cdist
      FROM q CROSS JOIN cc
    ),
    probes AS MATERIALIZED (
      SELECT qid, qe, cell FROM (
        SELECT qid, qe, cell, cdist,
               row_number() OVER (PARTITION BY qid ORDER BY cdist, cell) AS pr
        FROM qd) t
      WHERE pr <= 2
    ),
    scored AS (
      SELECT p.qid, b.vec_id AS nid,
             round(list_sum(list_transform(range(1, len(p.qe) + 1), i -> p.qe[i] * b.e[i]))
                   / (sqrt(list_sum(list_transform(p.qe, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS sim
      FROM probes p JOIN v b ON b.label = p.cell AND b.vec_id <> p.qid
    )
    SELECT qid, nid, sim, rank FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      FROM scored
    ) t WHERE rank <= 5""",
    doc=(
        "multi-probe IVF (operators/similarity.ivf_multiprobe_topk, "
        "nprobe=2): each query searches its TWO nearest coarse cells by "
        "exact-decimal centroid distance — the recall knob for the "
        "cross-cell neighbors nprobe=1 misses, at 2/cells of the corpus "
        "scanned. Probe set = queries × nprobe rows, broadcast into the "
        "cell equi-join; recall ≥ the single-probe lane by construction"
    ),
    tags=("similarity-ivf", "similarity-topk"),
)
def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries_df = emb.where(F.col("vec_id") < 10)
    return similarity.ivf_multiprobe_topk(emb, queries_df, k=5, nprobe=2).select(
        "qid", "nid", "sim", "rank"
    )


@query(
    "embedding_standardize_dims",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    flat AS (
      SELECT vec_id, CAST(dim AS INT) AS dim, x FROM (
        SELECT vec_id, generate_subscripts(e, 1) AS dim, unnest(e) AS x FROM v) f
    ),
    stats AS (
      SELECT dim,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 9) AS DOUBLE) / COUNT(*) AS mu,
             CAST(ROUND(SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))), 9) AS DOUBLE) / COUNT(*) AS m2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM flat GROUP BY dim
    )
    SELECT f.vec_id, f.dim,
           round((f.x - s.mu) / sqrt(s.m2 - s.mu * s.mu), 6) AS z
    FROM flat f JOIN stats s ON f.dim = s.dim
    WHERE f.vec_id < 10""",
    doc=(
        "per-dimension embedding standardization (whitening-lite): "
        "z = (x − μ_d)/σ_d with decimal-exact population moments per "
        "dimension — kills the dimension-scale imbalance that skews "
        "cosine/L2 on anisotropic embedding spaces (the cheap first "
        "step of post-processing à la Mu et al. 2017 all-but-the-top). "
        "Stats relation is dim-sized and broadcasts back onto the scan; "
        "output sampled to 10 vectors × 64 dims of scalar rows"
    ),
    tags=("similarity-quantize", "vectors", "preprocessing"),
)
def embedding_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    flat = t["embeddings"].select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x")
    ).select("vec_id", (F.col("dim0") + 1).cast("int").alias("dim"), "x")
    dec = "DECIMAL(28,12)"
    stats = flat.groupBy("dim").agg(
        (F.round(F.sum(F.col("x").cast(dec)), 9).cast("double") / F.count("*")).alias("mu"),
        (F.round(F.sum(F.round(F.col("x") * F.col("x"), 12).cast(dec)), 9).cast("double") / F.count("*")).alias("m2"),
        F.count("*").cast("bigint").alias("n"),
    )
    return (
        flat.where(F.col("vec_id") < 10)
        .join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            "dim",
            F.round(
                (F.col("x") - F.col("mu")) / F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")), 6
            ).alias("z"),
        )
    )


@query(
    "embedding_outlier_flags",
    oracle="""
    WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cm AS MATERIALIZED (
      SELECT label, CAST(dim AS INT) AS dim,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 6) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mn
      FROM (SELECT label, generate_subscripts(e, 1) AS dim, unnest(e) AS x FROM v) f
      GROUP BY label, dim
    ),
    cc AS MATERIALIZED (SELECT label, list(mn ORDER BY dim) AS cvec FROM cm GROUP BY label),
    d AS MATERIALIZED (
      SELECT v.vec_id, v.label,
             round(list_sum(list_transform(range(1, len(v.e) + 1),
                    t -> (v.e[t] - cc.cvec[t]) * (v.e[t] - cc.cvec[t]))), 9) AS dist
      FROM v JOIN cc ON v.label = cc.label
    ),
    thr AS MATERIALIZED (
      -- per-label p95 of the MICRO-binned distance (round 4): smallest
      -- binned value whose cumulative count reaches ceil(0.95·n),
      -- thresholds integral as 20·cum ≥ 19·n
      SELECT label, MIN(db) AS p95 FROM (
        SELECT label, round(dist, 4) AS db,
               SUM(1) OVER (PARTITION BY label ORDER BY round(dist, 4)
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               COUNT(*) OVER (PARTITION BY label) AS n
        FROM d) t
      WHERE 20 * cum >= 19 * n
      GROUP BY label
    )
    SELECT d.vec_id, d.label, round(d.dist, 4) AS dist,
           thr.p95, (round(d.dist, 4) > thr.p95) AS is_outlier
    FROM d JOIN thr ON d.label = thr.label""",
    doc=(
        "embedding outlier flags: each vector's squared distance to its "
        "cluster's exact-decimal centroid, flagged beyond the per-"
        "cluster p95 (type-1 quantile on micro-binned distances, "
        "20·cum ≥ 19·n integer thresholding) — the mislabeled/noise "
        "pruning pass before contrastive training or SemDeDup. "
        "Centroids broadcast; the quantile rides a per-cluster window "
        "over distinct binned distances"
    ),
    tags=("vectors", "quality", "outlier", "similarity-train"),
)
def embedding_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    cents = similarity.cell_centroids(emb)
    d = (
        emb.join(F.broadcast(cents), F.col("label") == F.col("cell"))
        .select(
            "vec_id",
            "label",
            F.round(
                similarity._sq_dist(
                    F.col("embedding").cast("array<double>"), F.col("cvec")
                ),
                9,
            ).alias("dist"),
        )
    )
    db = F.round(F.col("dist"), 4)
    cw = Window.partitionBy("label").orderBy(db).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nw = Window.partitionBy("label")
    thr = (
        d.select("label", db.alias("db"), F.count("*").over(cw).alias("cum"), F.count("*").over(nw).alias("n"))
        .where(20 * F.col("cum") >= 19 * F.col("n"))
        .groupBy("label")
        .agg(F.min("db").alias("p95"))
    )
    return d.join(F.broadcast(thr), "label").select(
        "vec_id",
        "label",
        F.round("dist", 4).alias("dist"),
        "p95",
        (F.round("dist", 4) > F.col("p95")).alias("is_outlier"),
    )


@query(
    "cluster_silhouette_lite",
    oracle="""
    WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cm AS MATERIALIZED (
      SELECT label, CAST(dim AS INT) AS dim,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 6) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mn
      FROM (SELECT label, generate_subscripts(e, 1) AS dim, unnest(e) AS x FROM v) f
      GROUP BY label, dim
    ),
    cc AS MATERIALIZED (SELECT label AS cl, list(mn ORDER BY dim) AS cvec FROM cm GROUP BY label),
    d AS MATERIALIZED (
      SELECT v.vec_id, v.label, cc.cl,
             round(sqrt(round(list_sum(list_transform(range(1, len(v.e) + 1),
                    t -> (v.e[t] - cc.cvec[t]) * (v.e[t] - cc.cvec[t]))), 9)), 9) AS dist
      FROM v CROSS JOIN cc
    ),
    ab AS (
      SELECT vec_id, label,
             MIN(CASE WHEN cl = label THEN dist END) AS a,
             MIN(CASE WHEN cl <> label THEN dist END) AS b
      FROM d GROUP BY vec_id, label
    ),
    sil AS (
      SELECT label, round((b - a) / GREATEST(a, b), 9) AS s FROM ab
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
    FROM sil GROUP BY label""",
    doc=(
        "centroid-silhouette cluster-quality score per label (the "
        "simplified silhouette: a = distance to own centroid, b = "
        "distance to the nearest OTHER centroid, s = (b−a)/max(a,b) — "
        "O(n·k) instead of the O(n²) full silhouette, the standard "
        "large-scale substitute): positive means separated, ≈0 means "
        "overlapping clusters. Exact-decimal centroids broadcast; "
        "per-row distances round before the DECIMAL-summed per-cluster "
        "mean. The clustering-eval companion to the ANN recall/nDCG "
        "lanes"
    ),
    tags=("similarity-train", "model-eval", "kmeans", "vectors"),
)
def cluster_silhouette_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    cents = similarity.cell_centroids(emb).select(
        F.col("cell").alias("cl"), "cvec"
    )
    d = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "cl",
        F.round(
            F.sqrt(
                F.round(
                    similarity._sq_dist(F.col("embedding").cast("array<double>"), F.col("cvec")),
                    9,
                )
            ),
            9,
        ).alias("dist"),
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("cl") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("cl") != F.col("label"), F.col("dist"))).alias("b"),
    )
    s = F.round((F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")), 9)
    return (
        ab.select("label", s.alias("s"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("s").cast("DECIMAL(28,12)")).cast("double") / F.count("*"), 6
            ).alias("mean_silhouette"),
        )
    )
