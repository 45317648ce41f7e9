"""Round-4 scale-pattern lanes: the join/filter shapes that decide
whether a 100 TB job is feasible at all — Bloom runtime pre-filters,
cluster-scoped semantic dedup (SemDeDup), substring-span dedup (the
suffix-array result, relationally), grid-bucketed spatial radius joins,
per-source distribution drift, equi-depth histograms, and
Johnson–Lindenstrauss projection sketches.

Every lane is a thin wrapper over an operator module and carries a full
DuckDB oracle (md5-seeded hashing and fixed-order IEEE float chains keep
each one engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sinker_spark.catalog import load_tables
from sinker_spark.operators import bloom, dedup, similarity, spatial, text
from sinker_spark.queries import query
from sinker_spark.queries.helpers import mavg, mavg_expr

# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------

_BLOOM_M = 65536  # 2048 32-bit words — broadcast-tiny at any scale

_SHINGLE4_CTE = """
toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
         FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(list_transform(t, (x, i) ->
             CASE WHEN i + 3 <= len(t)
                  THEN array_to_string(t[i:i+3], ' ') END),
             s -> s IS NOT NULL)) AS shingle
  FROM toks)
"""


def _duck_pos(expr: str, off: int, m: int) -> str:
    return f"('0x' || substr(md5({expr}), {off}, 7))::BIGINT % {m}"


_BLOOM_ORACLE = f"""
WITH {_SHINGLE4_CTE},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0),
bpos AS (
  SELECT unnest([{_duck_pos('shingle', 1, _BLOOM_M)},
                 {_duck_pos('shingle', 8, _BLOOM_M)},
                 {_duck_pos('shingle', 15, _BLOOM_M)},
                 {_duck_pos('shingle', 22, _BLOOM_M)}]) AS pos
  FROM bench),
words AS (
  SELECT CAST(pos // 32 AS INT) AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
  FROM bpos GROUP BY 1),
pp AS (
  SELECT doc_id, shingle,
         {_duck_pos('shingle', 1, _BLOOM_M)} AS p0,
         {_duck_pos('shingle', 8, _BLOOM_M)} AS p1,
         {_duck_pos('shingle', 15, _BLOOM_M)} AS p2,
         {_duck_pos('shingle', 22, _BLOOM_M)} AS p3
  FROM corpus),
probe AS (
  SELECT pp.doc_id, pp.shingle
  FROM pp
  LEFT JOIN words w0 ON w0.word_idx = CAST(p0 // 32 AS INT)
  LEFT JOIN words w1 ON w1.word_idx = CAST(p1 // 32 AS INT)
  LEFT JOIN words w2 ON w2.word_idx = CAST(p2 // 32 AS INT)
  LEFT JOIN words w3 ON w3.word_idx = CAST(p3 // 32 AS INT)
  WHERE coalesce((w0.word >> CAST(p0 % 32 AS INT)) & 1 = 1, false)
    AND coalesce((w1.word >> CAST(p1 % 32 AS INT)) & 1 = 1, false)
    AND coalesce((w2.word >> CAST(p2 % 32 AS INT)) & 1 = 1, false)
    AND coalesce((w3.word >> CAST(p3 % 32 AS INT)) & 1 = 1, false)),
exact AS (
  SELECT p.doc_id, COUNT(*) AS n_overlap
  FROM probe p JOIN bench b USING (shingle) GROUP BY 1)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bloom_candidates,
       CAST(coalesce(ANY_VALUE(e.n_overlap), 0) AS BIGINT) AS n_overlap_shingles,
       coalesce(ANY_VALUE(e.n_overlap), 0) > 0 AS is_contaminated
FROM probe p LEFT JOIN exact e ON p.doc_id = e.doc_id
GROUP BY p.doc_id
"""


@query(
    "bloom_prefilter_decontaminate",
    oracle=_BLOOM_ORACLE,
    doc=(
        "decontamination behind an explicit Bloom runtime filter "
        "(operators/bloom.py): benchmark shingles → 65536-bit/4-hash word "
        "relation (2048 rows, broadcast), corpus shingles probed with K "
        "broadcast word lookups (probe side never shuffled), exact overlap "
        "join runs only on bloom-positive shingles — identical answers to "
        "the exact lane on flagged docs, with the big join's shuffle shrunk "
        "to the candidate sliver; is_contaminated=false rows are the "
        "measured false-positive cost"
    ),
    tags=("bloom", "decontamination", "runtime-filter", "training-pipeline"),
)
def bloom_prefilter_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return bloom.bloom_decontaminate(corpus, bench, n=4, m_bits=_BLOOM_M)


# ---------------------------------------------------------------------------
# SemDeDup — cluster-scoped semantic dedup
# ---------------------------------------------------------------------------

_COS_AB = (
    "round(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))"
    " / (sqrt(list_sum(list_transform(a.e, x -> x * x)))"
    " * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6)"
)


@query(
    "semantic_dedup_embeddings",
    oracle=f"""
    WITH v AS (SELECT vec_id, label AS cluster, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    shadow AS (
      SELECT a.vec_id, a.cluster, MIN(b.vec_id) AS dup_of
      FROM v a JOIN v b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
      WHERE {_COS_AB} >= 0.3
      GROUP BY a.vec_id, a.cluster)
    SELECT v.vec_id, v.cluster, s.dup_of IS NULL AS is_kept, s.dup_of
    FROM v LEFT JOIN shadow s ON v.vec_id = s.vec_id AND v.cluster = s.cluster""",
    doc=(
        "SemDeDup (operators/similarity.semantic_dedup, Abbas et al. 2023 "
        "shape): pairwise cosine only WITHIN a coarse cluster (one shuffle "
        "on the cluster id; per-cluster O(|c|²) bounded by the clustering "
        "granularity, never corpus²); greedy-by-id keep rule — a vector is "
        "dropped iff a lower-id cluster-mate sits within cos ≥ 0.3 — is "
        "deterministic and exactly SQL-expressible, no iterative fixpoint"
    ),
    tags=("dedup-semantic", "dedup-embedding", "training-pipeline"),
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return similarity.semantic_dedup(t["embeddings"], threshold=0.3)


# ---------------------------------------------------------------------------
# Substring-span dedup (suffix-array result, relationally)
# ---------------------------------------------------------------------------

_SPAN_N, _SPAN_MIN, _SPAN_DF_CAP = 8, 16, 50


@query(
    "duplicated_substring_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
                  FROM documents),
    sh AS (
      SELECT doc_id, u.i - 1 AS pos,
             array_to_string(t[u.i:u.i+{_SPAN_N - 1}], ' ') AS shingle
      FROM toks, unnest(range(1, greatest(len(t) - {_SPAN_N} + 1, 0) + 1)) AS u(i)),
    dfreq AS (SELECT shingle, COUNT(DISTINCT doc_id) AS dfq FROM sh GROUP BY 1),
    kept AS (SELECT sh.* FROM sh JOIN dfreq USING (shingle) WHERE dfq <= {_SPAN_DF_CAP}),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
             a.pos - b.pos AS diag
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
    runs AS (
      SELECT *, pos_a - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS island
      FROM m)
    SELECT id_a, id_b,
           CAST(MIN(pos_a) AS INT) AS start_a,
           CAST(MIN(pos_a) - diag AS INT) AS start_b,
           CAST(COUNT(*) + {_SPAN_N - 1} AS BIGINT) AS span_tokens
    FROM runs GROUP BY id_a, id_b, diag, island
    HAVING COUNT(*) + {_SPAN_N - 1} >= {_SPAN_MIN}""",
    doc=(
        "exact duplicated-substring spans across doc pairs "
        "(operators/dedup.duplicated_spans — the Lee et al. 2022 "
        "suffix-array result as relations): positional 8-shingles, "
        "equi-join on the shingle (the only corpus-sized shuffle, keyed on "
        "the shingle hash — never all-pairs), gaps-and-islands per "
        "(pair, diagonal) recovers each maximal shared span ≥ 16 tokens; "
        "shingles in > 50 docs dropped first — boilerplate is exactly the "
        "quadratic-fan-out key"
    ),
    tags=("dedup-span", "dedup-substring", "training-pipeline"),
)
def duplicated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    s = dedup.duplicated_spans(
        t["documents"], n=_SPAN_N, min_span=_SPAN_MIN, df_cap=_SPAN_DF_CAP
    )
    return s.select(
        "id_a", "id_b",
        F.col("start_a").cast("int").alias("start_a"),
        F.col("start_b").cast("int").alias("start_b"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
    )


# ---------------------------------------------------------------------------
# Grid-bucketed spatial radius join
# ---------------------------------------------------------------------------

_RADIUS_DEG = 2.0

_DUCK_LAT = "('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 7))::BIGINT / 268435456.0 * 120.0 - 60.0"
_DUCK_LON = "('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 7))::BIGINT / 268435456.0 * 360.0 - 180.0"


def synth_customer_points(customer: DataFrame) -> DataFrame:
    """Deterministic per-customer coordinates (md5-hash uniform): the
    engine-portable stand-in for a real geo column."""

    def _coord(prefix: str, span: float, lo: float) -> F.Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), F.col("c_custkey").cast("string"))), 1, 7),
            16, 10,
        ).cast("bigint")
        return h / F.lit(268435456.0) * F.lit(span) - F.lit(lo)

    return customer.select(
        F.col("c_custkey").alias("id"),
        _coord("lat|", 120.0, 60.0).alias("lat"),
        _coord("lon|", 360.0, 180.0).alias("lon"),
    )


@query(
    "spatial_radius_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id, {_DUCK_LAT} AS lat, {_DUCK_LON} AS lon
      FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           round(sqrt((a.lat - b.lat) * (a.lat - b.lat)
                      + (a.lon - b.lon) * (a.lon - b.lon)), 6) AS dist_deg,
           round(2.0 * 6371.0 * asin(sqrt(
               sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2))), 4)
             AS approx_km
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
          <= {_RADIUS_DEG} * {_RADIUS_DEG}""",
    doc=(
        "spatial radius self-join via grid bucketing (operators/spatial.py): "
        "cell side = radius ⇒ 3×3 neighborhood is a complete candidate "
        "cover; one side exploded ×9, equi-join on cell id — shuffle is "
        "9·|pts| keyed rows, never the all-pairs product the oracle runs; "
        "the boundary predicate uses planar-degree distance (exactly-rounded "
        "IEEE ops — can never flip between engines), great-circle km as a "
        "rounded reporting column"
    ),
    tags=("join-spatial", "join-range", "grid-bucketing"),
)
def spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pts = synth_customer_points(t["customer"])
    return spatial.radius_pairs_deg(pts, _RADIUS_DEG)


# ---------------------------------------------------------------------------
# Token-distribution drift per source
# ---------------------------------------------------------------------------


@query(
    "token_drift_by_source",
    oracle="""
    WITH toks AS (
      SELECT source AS grp, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
    gt AS (SELECT grp, tok, COUNT(*) AS c_gt FROM toks GROUP BY 1, 2),
    g AS (SELECT grp, COUNT(*) AS n_g FROM toks GROUP BY 1),
    ct AS (SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY 1),
    vn AS (SELECT COUNT(DISTINCT tok) AS v, COUNT(*) AS n FROM toks)
    SELECT grp AS source,
           CAST(ROUND(SUM(CAST(round(
               ((CAST(c_gt AS DOUBLE) + 1.0) / CAST(n_g + v AS DOUBLE))
               * ln(((CAST(c_gt AS DOUBLE) + 1.0) / CAST(n_g + v AS DOUBLE))
                    / ((CAST(c_t AS DOUBLE) + 1.0) / CAST(n + v AS DOUBLE))), 9)
             AS DECIMAL(28,12))), 6) AS DOUBLE) AS kl,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM gt JOIN ct USING (tok) JOIN g USING (grp) CROSS JOIN vn
    GROUP BY grp""",
    doc=(
        "token-distribution drift per source (operators/text."
        "token_kl_divergence): truncated KL(source ‖ corpus) with add-one "
        "smoothing over the source's observed vocabulary — two map-side-"
        "combinable count aggregations + a vocabulary-keyed join; each "
        "p·ln(p/q) term rounded then decimal-summed so the result is "
        "partitioning- and engine-independent"
    ),
    tags=("text-drift", "quality", "training-pipeline"),
)
def token_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.token_kl_divergence(t["documents"], group_col="source")


# ---------------------------------------------------------------------------
# Equi-depth histogram (ntile)
# ---------------------------------------------------------------------------


@query(
    "equi_depth_price_histogram",
    oracle=f"""
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           {mavg_expr('o_totalprice')} AS avg_price
    FROM (SELECT o_totalprice,
                 ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
          FROM orders) b
    GROUP BY bucket""",
    doc=(
        "equi-depth (equal-count) 8-bucket histogram of order totals via "
        "ntile with a deterministic tiebreak — the complement of the "
        "equi-width width_bucket lane. ntile needs a total order: fine to "
        "exact-compute at view scale; the 100 TB path computes boundary "
        "quantiles first (approx_percentile lane) and assigns buckets by "
        "range comparison, a map-only pass — documented in SCALING.md"
    ),
    tags=("histogram", "window-ntile", "stats"),
)
def equi_depth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select("o_totalprice", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            mavg("o_totalprice").alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss projection sketch
# ---------------------------------------------------------------------------

_JL_IN, _JL_OUT = 64, 8


def _jl_oracle() -> str:
    signs = similarity.random_projection_signs(_JL_IN, _JL_OUT)
    scale = 1.0 / (_JL_OUT ** 0.5)
    arms = []
    for j in range(_JL_OUT):
        chain = " + ".join(f"e[{i + 1}] * ({float(signs[j][i])!r})" for i in range(_JL_IN))
        arms.append(
            f"SELECT vec_id, {j} AS j, round(({chain}) * CAST({scale!r} AS DOUBLE), 6) AS p FROM v"
        )
    return (
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)\n"
        + "\nUNION ALL\n".join(arms)
    )


@query(
    "jl_random_projection",
    oracle=_jl_oracle(),
    doc=(
        "Johnson–Lindenstrauss sketch (operators/similarity."
        "random_projection, Achlioptas 2003 ±1 matrix): 64-dim embeddings "
        "→ 8 coordinates with a deterministic md5-seeded sign matrix folded "
        "into the projection expression — per-row multiply-add chain in a "
        "fixed IEEE order (identical in any engine), no shuffle, no UDF; "
        "the sketch feeds downstream ANN/clustering at 1/8 the width"
    ),
    tags=("similarity-sketch", "dimensionality-reduction"),
)
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return similarity.random_projection(t["embeddings"], in_dim=_JL_IN, out_dim=_JL_OUT)


# ---------------------------------------------------------------------------
# Compaction planning: cumulative-sum bin packing of small files
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 16384  # bin capacity in chars (stand-in for bytes)


@query(
    "compaction_bin_packing",
    oracle=f"""
    WITH assigned AS (
      SELECT source, doc_id, n_chars,
             CAST(floor(CAST(coalesce(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                        / {_COMPACT_TARGET}) AS BIGINT) AS bin
      FROM documents
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM assigned GROUP BY source, bin""",
    doc=(
        "lakehouse compaction planner: next-fit bin packing of small files "
        "(documents stand in, n_chars = file size) into ~16 KB output bins "
        "via an EXCLUSIVE running sum — bin = floor(cumsum_before/target), "
        "so every bin reaches capacity before the next opens and each item "
        "lands deterministically. Partitioned by source directory exactly "
        "like real table-maintenance planners (Delta OPTIMIZE/Iceberg "
        "rewrite_data_files plan per partition), so the window never "
        "crosses directories and parallelism = #partitions at 100 TB. "
        "Output: the per-bin rewrite manifest"
    ),
    tags=("compaction", "layout", "maintenance", "window"),
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = t["documents"].select(
        "source",
        "doc_id",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("double")
            / F.lit(_COMPACT_TARGET)
        )
        .cast("bigint")
        .alias("bin"),
    )
    return assigned.groupBy("source", "bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Data-skipping effectiveness: would min/max file stats prune this predicate?
# ---------------------------------------------------------------------------


@query(
    "data_skipping_estimate",
    oracle=f"""
    WITH assigned AS (
      SELECT source, n_chars,
             CAST(floor(CAST(coalesce(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                        / {_COMPACT_TARGET}) AS BIGINT) AS bin,
             doc_id
      FROM documents
    ),
    stats AS (
      SELECT source, bin,
             CAST(MIN(n_chars) AS BIGINT) AS min_chars,
             CAST(MAX(n_chars) AS BIGINT) AS max_chars,
             CAST(COUNT(*) AS BIGINT) AS n_files
      FROM assigned GROUP BY source, bin
    ),
    judged AS (
      SELECT source, bin, n_files,
             -- predicate under test: n_chars BETWEEN 400 AND 500;
             -- a file skips when its [min,max] cannot overlap it
             CASE WHEN max_chars < 400 OR min_chars > 500 THEN 1 ELSE 0 END AS skipped
      FROM stats
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(skipped) AS BIGINT) AS bins_skipped,
           round(CAST(SUM(skipped) AS DOUBLE) / COUNT(*), 6) AS skip_fraction
    FROM judged GROUP BY source""",
    doc=(
        "data-skipping effectiveness estimator: reusing the compaction "
        "planner's bins as files, compute per-file min/max stats for "
        "n_chars and judge — per source directory — what fraction of "
        "files a `BETWEEN 400 AND 500` predicate would prune via "
        "zone-map elimination (skip iff [min,max] ∩ predicate = ∅, the "
        "parquet row-group / Delta file-stats rule). The layout-quality "
        "audit to run BEFORE paying for a Z-ORDER rewrite: low skip "
        "fractions here quantify exactly what clustering would buy"
    ),
    tags=("layout", "data-skipping", "maintenance", "compaction"),
)
def data_skipping_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = t["documents"].select(
        "source",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("double")
            / F.lit(_COMPACT_TARGET)
        )
        .cast("bigint")
        .alias("bin"),
    )
    stats = assigned.groupBy("source", "bin").agg(
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.count("*").cast("bigint").alias("n_files"),
    )
    skipped = F.when((F.col("max_chars") < 400) | (F.col("min_chars") > 500), 1).otherwise(0)
    return stats.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum(skipped).cast("bigint").alias("bins_skipped"),
        F.round(F.sum(skipped).cast("double") / F.count("*"), 6).alias("skip_fraction"),
    )


# ---------------------------------------------------------------------------
# Rendezvous-hash resharding: minimal movement when the shard count grows
# ---------------------------------------------------------------------------


def _hrw_oracle(n_old: int, n_new: int) -> str:
    def hs(s: int) -> str:
        return (
            f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '{s}'), 1, 8) AS BIGINT)"
        )

    old_list = ", ".join(hs(s) for s in range(n_old))
    new_list = ", ".join(hs(s) for s in range(n_new))
    return f"""
    WITH assigned AS (
      SELECT doc_id,
             CAST(list_indexof([{old_list}], list_aggregate([{old_list}], 'max')) - 1 AS INT) AS shard_old,
             CAST(list_indexof([{new_list}], list_aggregate([{new_list}], 'max')) - 1 AS INT) AS shard_new,
             CAST(doc_id % {n_old} AS INT) AS mod_old,
             CAST(doc_id % {n_new} AS INT) AS mod_new
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END) AS BIGINT) AS moved_hrw,
           round(CAST(SUM(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS frac_hrw,
           CAST(SUM(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END) AS BIGINT) AS moved_modulo,
           round(CAST(SUM(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS frac_modulo
    FROM assigned"""


_HRW_OLD, _HRW_NEW = 8, 10


@query(
    "rendezvous_shard_rebalance",
    oracle=_hrw_oracle(_HRW_OLD, _HRW_NEW),
    doc=(
        "resharding-cost analysis with rendezvous (highest-random-"
        "weight) hashing: every doc's shard is argmax over shards of "
        "md5(key|shard), so growing 8→10 shards moves ONLY keys a new "
        "shard now wins (~2/10 of data — the consistent-hashing "
        "minimum), vs naive modulo placement which reshuffles ~90%. "
        "Both assignments and the movement fractions computed side by "
        "side — the partition-layout migration planner for stateful "
        "stores at 100 TB, where 'rebalance' means physically copying "
        "the moved fraction. Pure per-row md5 expressions, no shuffle"
    ),
    tags=("layout", "sharding", "maintenance", "scale-pattern"),
)
def rendezvous_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    def h(s: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(str(s)))), 1, 8
                ),
                16,
                10,
            )
            .cast("bigint")
        )

    old_arr = F.array(*[h(s) for s in range(_HRW_OLD)])
    new_arr = F.array(*[h(s) for s in range(_HRW_NEW)])
    assigned = t["documents"].select(
        (F.array_position(old_arr, F.array_max(old_arr)) - 1).cast("int").alias("shard_old"),
        (F.array_position(new_arr, F.array_max(new_arr)) - 1).cast("int").alias("shard_new"),
        (F.col("doc_id") % _HRW_OLD).cast("int").alias("mod_old"),
        (F.col("doc_id") % _HRW_NEW).cast("int").alias("mod_new"),
    )
    moved_h = F.sum(F.when(F.col("shard_old") != F.col("shard_new"), 1).otherwise(0))
    moved_m = F.sum(F.when(F.col("mod_old") != F.col("mod_new"), 1).otherwise(0))
    return assigned.agg(
        F.count("*").cast("bigint").alias("n"),
        moved_h.cast("bigint").alias("moved_hrw"),
        F.round(moved_h.cast("double") / F.count("*"), 6).alias("frac_hrw"),
        moved_m.cast("bigint").alias("moved_modulo"),
        F.round(moved_m.cast("double") / F.count("*"), 6).alias("frac_modulo"),
    )
