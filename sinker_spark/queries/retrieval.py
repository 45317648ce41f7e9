"""Hybrid retrieval and model-based quality lanes: BM25 ⊕ vector-ANN
fusion via reciprocal-rank fusion, and the corpus-unigram cross-entropy
(perplexity-style) document filter.

The documents and embeddings tables are id-aligned (vec_id == doc_id),
so the two retrieval modalities rank the same corpus — exactly the
hybrid-search setup Elasticsearch 8.x serves with its `rrf` retriever,
re-expressed on the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sinker_spark.catalog import load_tables
from sinker_spark.operators import relevance, similarity, text
from sinker_spark.queries import query

_TERMS = ("spark", "join", "data")
_SHORTLIST = 50
_TOPK = 20

# BM25 ranking CTEs (mirrors operators/relevance.bm25_scores — same text
# as the bm25_relevance_scores oracle) + vector ranking CTEs (cosine to
# the vec_id=0 query vector, ann_cosine_topk shape) + nano-unit RRF.
_RRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents),
lens AS (SELECT id, CAST(len(tk) AS INT) AS dl FROM toks),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(ROUND(SUM(CAST(dl AS DECIMAL(28,6))), 6) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM lens),
hits AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT id, unnest(tk) AS term FROM toks) t
  WHERE term IN {str(_TERMS)}
  GROUP BY id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
bm AS (
  SELECT id, CAST(SUM(s_micro) AS DOUBLE) / 1e6 AS score
  FROM (
    SELECT h.id,
           CAST(round(
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (h.tf * (1.2 + 1))
             / (h.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
             * 1e6) AS BIGINT) AS s_micro
    FROM hits h
    JOIN dfreq d USING (term)
    CROSS JOIN stats s
    JOIN lens l ON l.id = h.id) sc
  GROUP BY id),
bmr AS (
  SELECT id, rank FROM (
    SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank FROM bm) r
  WHERE rank <= {_SHORTLIST}),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
sims AS (
  SELECT b.vec_id AS id,
         round(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
           / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
            * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS sim
  FROM (SELECT * FROM v WHERE vec_id = 0) a
  JOIN v b ON a.vec_id <> b.vec_id),
vr AS (
  SELECT id, rank FROM (
    SELECT id, CAST(row_number() OVER (ORDER BY sim DESC, id) AS INT) AS rank FROM sims) r
  WHERE rank <= {_SHORTLIST}),
u AS (SELECT id, rank FROM bmr UNION ALL SELECT id, rank FROM vr),
fused AS (
  SELECT id, CAST(COUNT(*) AS INT) AS n_lists,
         CAST(SUM(CAST(round(1e9 / (60 + rank)) AS BIGINT)) AS DOUBLE) / 1e9 AS rrf
  FROM u GROUP BY id)
SELECT id, n_lists, rrf, fused_rank FROM (
  SELECT id, n_lists, rrf,
         CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INT) AS fused_rank
  FROM fused) f
WHERE fused_rank <= {_TOPK}
"""


@query(
    "hybrid_search_rrf",
    oracle=_RRF_ORACLE,
    doc=(
        "hybrid retrieval: BM25 lexical shortlist ⊕ cosine vector "
        "shortlist (query = vec 0) fused with reciprocal-rank fusion "
        "(operators/relevance.rrf_fuse, Cormack et al. 2009; the ES 8.x "
        "`rrf` retriever on the lake). Each modality rank-limits to 50 "
        "before fusion, so the fuse step touches shortlists, never the "
        "corpus; RRF contributions accumulate in integer nano-units — "
        "order-independent across engines/partitionings"
    ),
    tags=("relevance", "similarity-topk", "hybrid-search", "rrf"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lex = relevance.bm25_scores(t["documents"], list(_TERMS))
    wl = Window.orderBy(F.desc("score"), F.asc("id"))
    lex_r = (
        lex.withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= _SHORTLIST)
        .select("id", "rank")
    )
    emb = t["embeddings"]
    vec_r = (
        similarity.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=_SHORTLIST)
        .select(F.col("nid").alias("id"), "rank")
    )
    fused = relevance.rrf_fuse([lex_r, vec_r])
    wf = Window.orderBy(F.desc("rrf"), F.asc("id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .where(F.col("fused_rank") <= _TOPK)
        .select("id", "n_lists", "rrf", "fused_rank")
    )


@query(
    "doc_cross_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
    corpus AS (SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
           ROUND(-(CAST(SUM(lnq) AS DOUBLE) / 1e9) / CAST(COUNT(*) AS DOUBLE), 6)
             AS cross_entropy
    FROM (
      SELECT doc_id,
             CAST(round(ln(CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS lnq
      FROM toks JOIN corpus USING (tok) CROSS JOIN tot) terms
    GROUP BY doc_id""",
    doc=(
        "perplexity-style quality filter (operators/text."
        "unigram_cross_entropy, CCNet shape with the corpus as LM): "
        "per-document cross-entropy under corpus unigram frequencies — "
        "high = off-distribution, review/drop. Per-token ln q accumulates "
        "in integer nano-units (order-independent); vocabulary-keyed "
        "count + join, doc-keyed rollup — two map-side-combinable shuffles"
    ),
    tags=("text-quality", "perplexity", "training-pipeline"),
)
def doc_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.unigram_cross_entropy(t["documents"])


def _mmr_oracle(k: int, lam: float, shortlist: int) -> str:
    """DuckDB twin of operators/similarity.mmr_rerank: the k greedy
    selection steps are UNROLLED into chained materialized CTEs (greedy
    argmax is sequential, but a FIXED k is just k nested queries). Each
    step scores the remaining shortlist with the identical IEEE
    expression — round(lam*rel − (1−lam)·max_cos_to_selected, 6), raw
    (unrounded) cosines under the max exactly as the Spark side computes
    them — and picks the (mmr desc, id) argmax. Redundancy penalties use
    a correlated MAX over the ≤k-row selected set."""
    cos_raw = (
        "(list_sum(list_transform(range(1, len(c.e) + 1), i -> c.e[i] * s.e[i]))"
        " / (sqrt(list_sum(list_transform(c.e, x -> x * x)))"
        " * sqrt(list_sum(list_transform(s.e, x -> x * x)))))"
    )
    parts = [
        f"""
    WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS MATERIALIZED (SELECT e FROM v WHERE vec_id = 0),
    short AS MATERIALIZED (
      SELECT id, rel, e FROM (
        SELECT b.vec_id AS id,
               round(list_sum(list_transform(range(1, len(b.e) + 1), i -> b.e[i] * q.e[i]))
                     / (sqrt(list_sum(list_transform(b.e, x -> x * x)))
                        * sqrt(list_sum(list_transform(q.e, x -> x * x)))), 6) AS rel,
               b.e,
               row_number() OVER (ORDER BY round(list_sum(list_transform(range(1, len(b.e) + 1), i -> b.e[i] * q.e[i]))
                     / (sqrt(list_sum(list_transform(b.e, x -> x * x)))
                        * sqrt(list_sum(list_transform(q.e, x -> x * x)))), 6) DESC, b.vec_id) AS rk
        FROM v b CROSS JOIN q WHERE b.vec_id <> 0) t
      WHERE rk <= {shortlist}
    ),
    sel0 AS MATERIALIZED (SELECT id, rel, e, 0 AS rank, 0.0 AS mmr FROM short WHERE FALSE)"""
    ]
    prev = "sel0"
    for i in range(1, k + 1):
        parts.append(
            f"""
    cand{i} AS MATERIALIZED (
      SELECT c.id, c.rel, c.e,
             round({lam} * c.rel - (1.0 - {lam}) *
                   coalesce((SELECT MAX({cos_raw}) FROM {prev} s), 0.0), 6) AS mmr
      FROM short c WHERE c.id NOT IN (SELECT id FROM {prev})
    ),
    pick{i} AS MATERIALIZED (
      SELECT id, rel, e, {i} AS rank, mmr FROM cand{i} ORDER BY mmr DESC, id LIMIT 1
    ),
    sel{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i})"""
        )
        prev = f"sel{i}"
    return (
        ",".join(parts)
        + f"\n    SELECT CAST(rank AS INT) AS rank, id, rel, mmr FROM {prev}"
    )


@query(
    "mmr_diversified_topk",
    oracle=_mmr_oracle(k=5, lam=0.7, shortlist=30),
    doc=(
        "MMR diversified rerank (operators/similarity.mmr_rerank): top-5 "
        "from the 30-candidate cosine shortlist for query vec 0, greedily "
        "trading relevance against redundancy (λ=0.7). Sequential by "
        "definition → k bounded driver iterations over the shortlist, "
        "selected vectors folded as literals (no join per step), one row "
        "collected per step. Oracle-matched by UNROLLING the 5 greedy "
        "steps into chained DuckDB CTEs (correlated MAX redundancy "
        "penalty per step); also cross-checked against a pure-python "
        "greedy reference (tests/test_scale_patterns.py)"
    ),
    tags=("similarity-rerank", "mmr", "diversity"),
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    shortlist = (
        similarity.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=30)
        .join(emb.select(F.col("vec_id").alias("nid"), "embedding"), "nid")
        .select(F.col("nid").alias("id"), F.col("sim").alias("rel"), F.col("embedding").alias("e"))
    )
    picked = similarity.mmr_rerank(shortlist, k=5, lam=0.7)
    return spark.createDataFrame(picked, "rank int, id bigint, rel double, mmr double")


@query(
    "inverted_index_postings",
    oracle="""
    WITH tk AS (
      SELECT doc_id, tok.pos AS pos, tok.t AS token FROM (
        SELECT doc_id,
               unnest(list_filter(list_transform(string_split(text, ' '),
                                                 (t, i) -> {'pos': i - 1, 't': t}),
                                  x -> x.t <> '')) AS tok
        FROM documents) u
    ),
    postings AS (
      SELECT token, doc_id,
             CAST(COUNT(*) AS BIGINT) AS tf,
             string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions
      FROM tk GROUP BY token, doc_id
    ),
    docfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY token)
    SELECT p.token, p.doc_id, p.tf, p.positions, d.df
    FROM postings p JOIN docfreq d ON p.token = d.token""",
    doc=(
        "positional inverted index built lake-side: (token, doc_id) "
        "postings with term frequency, sorted position list, and document "
        "frequency — the structure the reference delegates to the "
        "Elasticsearch sink (reference sinker.py:74-86 index setup), "
        "re-expressed as two shuffles (posexplode → (token,doc) agg → "
        "token df join). At 100 TB postings partition by token — the "
        "natural layout for BM25/phrase queries — and df is "
        "vocabulary-sized, broadcastable back onto the postings"
    ),
    tags=("retrieval", "inverted-index", "text-search", "B9"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tk = (
        t["documents"]
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .where(F.col("token") != "")
    )
    postings = tk.groupBy("token", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.array_join(F.sort_array(F.collect_list(F.col("pos"))).cast("array<string>"), ",").alias(
            "positions"
        ),
    )
    docfreq = postings.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    return postings.join(docfreq, "token").select("token", "doc_id", "tf", "positions", "df")


@query(
    "token_pmi_pairs",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY tok),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
      HAVING COUNT(*) >= 20
    )
    SELECT p.tok_a, p.tok_b, p.c_ab, da.c AS c_a, db.c AS c_b,
           round(ln((CAST(nd.n AS DOUBLE) * p.c_ab)
                    / (CAST(da.c AS DOUBLE) * db.c)), 6) AS pmi
    FROM pairs p
    JOIN df da ON p.tok_a = da.tok
    JOIN df db ON p.tok_b = db.tok
    CROSS JOIN nd""",
    doc=(
        "document-level pointwise mutual information of token pairs "
        "(PMI = ln(N·c_ab/(c_a·c_b)), the classic collocation/embedding "
        "statistic): distinct tokens per doc, co-occurrence via an "
        "in-doc self-join — O(doc_len²) per document, bounded by the "
        "doc-length cap rather than corpus size — then integer counts "
        "all the way to one final ln (rounded 6; 1-ulp libm drift "
        "cannot cross the rounding grain at these magnitudes). "
        "Support-thresholded (c_ab ≥ 20) so the pair relation stays "
        "vocabulary-, not corpus-, sized. Feeds co-occurrence "
        "embeddings, collocation detection, topic seeds"
    ),
    tags=("text-stats", "pmi", "collocation", "training-pipeline"),
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    dt = (
        t["documents"]
        .select("doc_id", F.explode(text.tokens("text")).alias("tok"))
        .distinct()
    )
    nd = dt.agg(F.countDistinct("doc_id").cast("bigint").alias("n"))
    df_ = dt.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    a = dt.select("doc_id", F.col("tok").alias("tok_a"))
    b = dt.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .where(F.col("c_ab") >= 20)
    )
    da = df_.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    db = df_.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    out = (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(nd))
    )
    pmi = F.round(
        F.log(
            (F.col("n").cast("double") * F.col("c_ab"))
            / (F.col("c_a").cast("double") * F.col("c_b"))
        ),
        6,
    )
    return out.select("tok_a", "tok_b", "c_ab", "c_a", "c_b", pmi.alias("pmi"))


@query(
    "ctfidf_cluster_terms",
    oracle="""
    WITH tok AS (
      SELECT e.label, unnest(list_filter(string_split(d.text, ' '), t -> t <> '')) AS term
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    tf AS (SELECT label, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY label, term),
    ft AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS f FROM tf GROUP BY term),
    a AS (SELECT CAST(SUM(tf) AS DOUBLE) / CAST(COUNT(DISTINCT label) AS DOUBLE) AS avg_class_tokens FROM tf)
    SELECT label, term, tf, score, rank FROM (
      SELECT tf.label, tf.term, tf.tf,
             round(tf.tf * ln(1.0 + a.avg_class_tokens / ft.f), 6) AS score,
             row_number() OVER (PARTITION BY tf.label
                                ORDER BY round(tf.tf * ln(1.0 + a.avg_class_tokens / ft.f), 6) DESC, tf.term) AS rank
      FROM tf JOIN ft ON tf.term = ft.term CROSS JOIN a
    ) t WHERE rank <= 5""",
    doc=(
        "c-TF-IDF topic terms (the BERTopic class-based TF-IDF): top-5 "
        "characteristic terms per embedding cluster — class term "
        "frequency × ln(1 + avg-class-tokens / corpus term frequency) — "
        "bridging the vector lane (cluster labels) and the text lane "
        "(term stats) through the aligned doc/vec ids. Integer counts "
        "up to one rounded ln; term relation is vocabulary×classes "
        "sized; the per-class rank is a tiny window. The "
        "topic-labeling step after any clustering/SemDeDup pass"
    ),
    tags=("topic-modeling", "text-stats", "similarity-train", "training-pipeline"),
)
def ctfidf_cluster_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tok = (
        t["documents"]
        .join(t["embeddings"], F.col("doc_id") == F.col("vec_id"))
        .select("label", F.explode(text.tokens("text")).alias("term"))
    )
    tf = tok.groupBy("label", "term").agg(F.count("*").cast("bigint").alias("tf"))
    ft = tf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("f"))
    a = tf.agg(
        (F.sum("tf").cast("double") / F.countDistinct("label").cast("double")).alias(
            "avg_class_tokens"
        )
    )
    scored = (
        tf.join(F.broadcast(ft), "term")
        .crossJoin(F.broadcast(a))
        .select(
            "label",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(1.0) + F.col("avg_class_tokens") / F.col("f")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 5)


@query(
    "zipf_slope_tokens",
    oracle="""
    WITH tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents) u
      GROUP BY tok
    ),
    ranked AS (
      SELECT round(ln(CAST(row_number() OVER (ORDER BY f DESC, tok) AS DOUBLE)), 9) AS lx,
             round(ln(CAST(f AS DOUBLE)), 9) AS ly
      FROM tf
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(lx AS DECIMAL(28,12))) AS sx,
             SUM(CAST(ly AS DECIMAL(28,12))) AS sy,
             SUM(CAST(round(lx * ly, 9) AS DECIMAL(28,12))) AS sxy,
             SUM(CAST(round(lx * lx, 9) AS DECIMAL(28,12))) AS sxx
      FROM ranked
    )
    SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM m""",
    doc=(
        "Zipf power-law fit of the token frequency distribution: OLS "
        "slope of ln(freq) on ln(rank) — natural corpora sit near −1, "
        "so the slope is a one-number naturalness/synthetic-data QA "
        "signal (this token-soup corpus reads much flatter, which is "
        "exactly what the check should flag). Rank from one "
        "vocabulary-sized window; logs round to 9 then accumulate as "
        "DECIMAL so the regression is engine-exact"
    ),
    tags=("text-stats", "zipf", "quality", "stats"),
)
def zipf_slope_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tf = (
        t["documents"]
        .select(F.explode(text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("tok"))
    ranked = tf.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 9).alias("lx"),
        F.round(F.log(F.col("f").cast("double")), 9).alias("ly"),
    )
    dec = "DECIMAL(28,12)"
    m = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("lx").cast(dec)).alias("sx"),
        F.sum(F.col("ly").cast(dec)).alias("sy"),
        F.sum(F.round(F.col("lx") * F.col("ly"), 9).cast(dec)).alias("sxy"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 9).cast(dec)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return m.select(
        "n",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
    )


@query(
    "heaps_law_vocab_growth",
    oracle="""
    WITH first_seen AS (
      SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents) u
      GROUP BY tok
    ),
    new_per_doc AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_terms
      FROM first_seen GROUP BY first_doc
    ),
    tokens_per_doc AS (
      SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_toks
      FROM documents
    ),
    growth AS (
      SELECT round(ln(CAST(SUM(t.n_toks) OVER w AS DOUBLE)), 9) AS lx,
             round(ln(CAST(SUM(coalesce(n.new_terms, 0)) OVER w AS DOUBLE)), 9) AS ly
      FROM tokens_per_doc t LEFT JOIN new_per_doc n ON t.doc_id = n.doc_id
      WINDOW w AS (ORDER BY t.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(lx AS DECIMAL(28,12))) AS sx, SUM(CAST(ly AS DECIMAL(28,12))) AS sy,
             SUM(CAST(round(lx * ly, 9) AS DECIMAL(28,12))) AS sxy,
             SUM(CAST(round(lx * lx, 9) AS DECIMAL(28,12))) AS sxx
      FROM growth
    )
    SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS heaps_beta
    FROM m""",
    doc=(
        "Heaps'-law vocabulary-growth fit: OLS slope β of ln(vocab size) "
        "on ln(tokens seen) along the doc_id corpus order — natural text "
        "sits at β≈0.4-0.6; a tiny fixed vocabulary (this synthetic "
        "corpus) reads near 0, which is the synthetic-data tell the QA "
        "check exists to catch. First occurrences via one token groupBy "
        "(min doc), growth via one ordered cumulative window over DOC "
        "counts (doc-bounded, not token-bounded); logs round to 9 into "
        "DECIMAL sums — engine-exact like the Zipf twin"
    ),
    tags=("text-stats", "heaps", "quality", "stats"),
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select("doc_id", F.explode(text.tokens("text")).alias("tok"))
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").cast("bigint").alias("first_doc"))
    new_per_doc = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("new_terms")
    )
    tokens_per_doc = t["documents"].select(
        "doc_id", F.size(text.tokens("text")).cast("bigint").alias("n_toks")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    growth = (
        tokens_per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            F.round(F.log(F.sum("n_toks").over(w).cast("double")), 9).alias("lx"),
            F.round(
                F.log(F.sum(F.coalesce("new_terms", F.lit(0))).over(w).cast("double")), 9
            ).alias("ly"),
        )
    )
    dec = "DECIMAL(28,12)"
    m = growth.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("lx").cast(dec)).alias("sx"),
        F.sum(F.col("ly").cast(dec)).alias("sy"),
        F.sum(F.round(F.col("lx") * F.col("ly"), 9).cast(dec)).alias("sxy"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 9).cast(dec)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    beta = (nd * F.col("sxy").cast("double") - sx * sy) / (
        nd * F.col("sxx").cast("double") - sx * sx
    )
    return m.select("n", F.round(beta, 6).alias("heaps_beta"))


@query(
    "doc_bigram_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(t)), j -> {'w1': t[j], 'w2': t[j + 1]})) AS pr
        FROM toks WHERE len(t) >= 2) u
    ),
    model AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
    uni AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM model GROUP BY w1),
    vocab AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM model),
    scored AS (
      SELECT b.doc_id,
             CAST(round(-ln((CAST(m.c12 AS DOUBLE) + 1.0) / (u.c1 + vocab.v)), 12) AS DECIMAL(28,12)) AS nll
      FROM bg b
      JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
      JOIN uni u ON b.w1 = u.w1
      CROSS JOIN vocab
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS cross_entropy,
           round(exp(CAST(SUM(nll) AS DOUBLE) / COUNT(*)), 4) AS perplexity
    FROM scored GROUP BY doc_id""",
    doc=(
        "per-document bigram perplexity under the corpus's own add-one-"
        "smoothed bigram model: the fluency/outlier score CCNet-style "
        "pipelines compute with a KenLM — here the LM itself is trained "
        "in the same dataflow (two count aggregations). High-perplexity "
        "docs are the weird ones to route to review/filtering. Integer "
        "counts → one rounded ln per bigram → DECIMAL per-doc sums: "
        "engine-exact; the model relation is bigram-vocabulary-sized "
        "and joins on its natural key. Extends the unigram "
        "cross-entropy lane to sequence structure"
    ),
    tags=("text-stats", "perplexity", "quality", "training-pipeline"),
)
def doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select("doc_id", text.tokens("text").alias("t")).where(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pr"),
    ).select("doc_id", "pr.w1", "pr.w2")
    model = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c12"))
    uni = model.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vocab = model.agg(F.countDistinct("w2").cast("bigint").alias("v"))
    nll = F.round(
        -F.log((F.col("c12").cast("double") + F.lit(1.0)) / (F.col("c1") + F.col("v"))), 12
    ).cast("DECIMAL(28,12)")
    scored = (
        bg.join(model, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", nll.alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("cross_entropy"),
        F.round(F.exp(F.sum("nll").cast("double") / F.count("*")), 4).alias("perplexity"),
    )


@query(
    "source_vocab_jaccard",
    oracle="""
    WITH sv AS (
      SELECT DISTINCT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sv GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM sv a JOIN sv b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
           round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.src_a = sa.source
    JOIN sizes sb ON i.src_b = sb.source""",
    doc=(
        "corpus-diversity matrix: vocabulary Jaccard similarity between "
        "every source pair — near-1 pairs signal mirrored/duplicated "
        "crawl sources worth deduplicating at the SOURCE level before "
        "any per-document pass. Intersections via one token equi-join "
        "of the distinct (source, token) relation (vocabulary-bounded); "
        "all counts integral to the final ratio"
    ),
    tags=("text-stats", "dedup-source", "training-pipeline", "join-self"),
)
def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sv = (
        t["documents"]
        .select("source", F.explode(text.tokens("text")).alias("tok"))
        .distinct()
    )
    sizes = sv.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a = sv.select(F.col("source").alias("src_a"), "tok")
    b = sv.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_inter", "n_a", "n_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
