"""Training-data pipeline queries over ``documents`` — dedup, text
analysis, fingerprinting (BASELINE.json extension operators). Thin
wrappers over :mod:`sinker_spark.operators.dedup` / ``operators.text``;
every md5-based pipeline stage is engine-portable, so even the full
MinHash→LSH→Jaccard pipeline has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables
from sinker_spark.operators import dedup, text
from sinker_spark.queries import query

_STOP_EN = ", ".join(f"'{w}'" for w in text.LANG_LEXICONS["en"])


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
    FROM documents""",
    doc="exact dedup: content-hash groups, min-id canonical (operators/dedup.exact_dedup)",
    tags=("dedup-exact",),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return dedup.exact_dedup(t["documents"])


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens,
           n_chars AS n_chars_meta
    FROM documents""",
    doc="token counting: whitespace tokens + char counts (operators/text.token_count)",
    tags=("text-tokens",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.length("text").alias("n_chars"),
        text.token_count("text").alias("n_tokens"),
        F.col("n_chars").alias("n_chars_meta"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(length(text) AS INT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS n_punct,
             CAST(len(list_filter(string_split(text, ' '),
                      t -> t <> '' AND list_contains([{_STOP_EN}], lower(t)))) AS INT) AS n_stopwords
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
           round(CASE WHEN n_tokens > 0
                 THEN CAST(n_chars - n_tokens + 1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 ELSE 0.0 END, 6) AS avg_token_len,
           round(CASE WHEN n_tokens > 0
                 THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio,
           round(CASE WHEN n_chars > 0
                 THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END, 6) AS punct_ratio,
           round(1.0 * (CASE WHEN n_tokens > 0
                        THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END)
                 - 0.5 * (CASE WHEN n_chars > 0
                          THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END)
                 + 0.01 * least(CAST(n_tokens AS DOUBLE), 100.0), 6) AS quality_score
    FROM feat""",
    doc="quality scoring: length/punct/stopword features + composite score (operators/text.quality_features)",
    tags=("text-quality",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.quality_features(t["documents"])


_LANG_CASES = "\n".join(
    f"CAST(len(list_filter(string_split(text, ' '), t -> t <> '' AND "
    f"list_contains([{', '.join(chr(39) + w + chr(39) for w in lex)}], lower(t)))) AS INT) AS hits_{lang},"
    for lang, lex in sorted(text.LANG_LEXICONS.items())
)


@query(
    "language_id_heuristic",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id,
             {_LANG_CASES}
      FROM documents
    )
    SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
           CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) > 0
                 AND (CAST(hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) AS INT)
                    + CAST(hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) AS INT)
                    + CAST(hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) AS INT)
                    + CAST(hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr) AS INT)) = 1
                THEN CASE greatest(hits_de, hits_en, hits_es, hits_fr)
                          WHEN hits_de THEN 'de' WHEN hits_en THEN 'en'
                          WHEN hits_es THEN 'es' ELSE 'fr' END
                ELSE 'und' END AS pred_lang
    FROM hits""",
    doc="language ID: per-language function-word hit argmax, unique-winner-or-'und' (operators/text.language_id)",
    tags=("text-langid",),
)
def language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.language_id(t["documents"])


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS fingerprint
    FROM documents""",
    doc="document fingerprinting: md5 of canonicalized text (operators/text.fingerprint)",
    tags=("text-fingerprint",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.fingerprint(t["documents"])


# oracle generated from the SAME coefficients as operators/dedup.py so the
# two can never drift
_MINS = ",\n         ".join(
    f"MIN(({a} * h + {b}) % {dedup.MINHASH_P}) AS m{i}"
    for i, (a, b) in enumerate(dedup.minhash_coeffs(16))
)
_SIG = "[" + ", ".join(f"m{i}" for i in range(16)) + "]"

_MINHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
  FROM toks
),
minh AS (
  SELECT doc_id,
         {_MINS}
  FROM (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h FROM sh) b
  GROUP BY doc_id
),
sigs AS (SELECT doc_id, {_SIG} AS sig FROM minh),
banded AS (
  SELECT doc_id, band,
         md5(CAST(band AS VARCHAR) || '|' ||
             array_to_string(sig[band*4+1 : band*4+4], ',')) AS band_key
  FROM sigs, (SELECT unnest(range(4)) AS band) bands
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT i.id_a, i.id_b,
         round(CAST(i.n_inter AS DOUBLE)
               / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE), 6) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
) v WHERE jaccard >= 0.5
"""  # noqa: E501


@query(
    "minhash_near_dup_pairs",
    oracle=_MINHASH_ORACLE,
    doc="MinHash(16)+LSH(4 bands)→Jaccard-verify near-dup pipeline (operators/dedup.minhash_near_dups); md5-seeded hashing keeps it engine-portable — candidate join is O(docs·bands), never O(docs²)",
    tags=("dedup-minhash",),
)
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return dedup.minhash_near_dups(t["documents"], threshold=0.5)


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
dlen AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round((CAST(tf.tf AS DOUBLE) / CAST(dlen.n_tok AS DOUBLE))
               * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dlen USING (doc_id) JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tfidf, rank FROM (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
  FROM scored
) t WHERE rank <= 3
"""


@query(
    "tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    doc="TF-IDF top-3 terms per document: tf + doc-frequency + corpus-size joins, all map-side-combinable aggregations; df table is tiny (vocabulary) → broadcast back",
    tags=("text-tfidf",),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select("doc_id", text.tokens("text").alias("tk"))
        .select("doc_id", F.explode("tk").alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    df_t = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = t["documents"].count()
    scored = (
        tf.join(dlen, "doc_id")
        .join(F.broadcast(df_t), "token")
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tf").cast("double") / F.col("n_tok").cast("double"))
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)


_NGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
  FROM toks
),
keep AS (  -- drop stop-shingles: document frequency > 50 adds O(df^2) pairs
           -- and near-zero Jaccard discrimination
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50
),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT i.id_a, i.id_b,
         round(CAST(i.n_inter AS DOUBLE)
               / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE), 6) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
) v WHERE jaccard >= 0.3
"""


@query(
    "ngram_jaccard_pairs",
    oracle=_NGRAM_ORACLE,
    doc="exhaustive n-gram Jaccard near-dup pairs (no LSH): shingle-join candidate generation with stop-shingle pruning (df>50 dropped — quadratic fan-out, negligible discrimination); the LSH-accelerated variant is minhash_near_dup_pairs",
    tags=("dedup-ngram",),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sh = dedup.shingle_rows(t["documents"], "doc_id", "text", 3)
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    shf = sh.join(df_counts.where(F.col("df") <= 50).select("shingle"), "shingle")
    sizes = shf.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shf.select(F.col("doc_id").alias("id_a"), "shingle")
    b = shf.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("n_inter").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.3)
    )


@query(
    "simhash_signatures",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
      FROM documents
    ),
    h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h60 FROM tok),
    votes AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (h60 >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(range(0, 60)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id""",
    doc="SimHash 60-bit signatures via md5 bit votes (operators/dedup.simhash64) — oracle replays the identical md5→bit-vote→majority construction in DuckDB ('0x'||hex cast = Spark conv(hex,16,10)), so the bit-twiddling is cross-engine verified end to end; also checked against a pure-Python reference in tests/test_operators.py",
    tags=("dedup-simhash",),
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return dedup.simhash64(t["documents"])


# transitive closure over the minhash pair set (embedded as a derived
# table) → component = min reachable doc id; WITH RECURSIVE does the
# iteration the Spark side runs as a label-propagation loop
_CLUSTER_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT id_a AS u, id_b AS v FROM ({_MINHASH_ORACLE}) p
  UNION
  SELECT id_b AS u, id_a AS v FROM ({_MINHASH_ORACLE}) p
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach AS (
  SELECT node AS a, node AS b FROM nodes
  UNION
  SELECT r.a, e.v AS b
  FROM reach r JOIN edges e ON r.b = e.u
)
SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a
"""


@query(
    "near_dup_clusters",
    oracle=_CLUSTER_ORACLE,
    doc="iterative connected components (operators/graph.connected_components) turning MinHash near-dup PAIRS into duplicate CLUSTERS (component = min doc id); oracle via recursive-CTE transitive closure",
    tags=("dedup-clusters", "iterative"),
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir)
    pairs = dedup.minhash_near_dups(t["documents"], threshold=0.5)
    return connected_components(pairs)


@query(
    "dedup_canonical_assignment",
    oracle=f"""
    WITH clusters AS ({_CLUSTER_ORACLE.strip()})
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS canonical_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN clusters c ON c.node = d.doc_id""",
    doc="the dedup pipeline's final answer: every document mapped to its near-dup cluster canonical (min id; singletons map to themselves) with a keep/drop decision",
    tags=("dedup-decision",),
)
def dedup_canonical_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir)
    pairs = dedup.minhash_near_dups(t["documents"], threshold=0.5)
    clusters = connected_components(pairs)
    return (
        t["documents"]
        .select("doc_id")
        .join(clusters, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("canonical_id"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("keep"),
        )
    )


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS INT) AS payload_bytes,
           md5(text) AS payload_md5,
           upper(CAST(hex(CAST(substring(text, 1, 8) AS BLOB)) AS VARCHAR)) AS head_hex
    FROM documents""",
    doc="multimodal plumbing: opaque-binary payload metadata (byte length, content hash, head bytes); the decode stage itself is the pandas-UDF path in operators/multimodal.py",
    tags=("multimodal",),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.octet_length("text").alias("payload_bytes"),
        F.md5("text").alias("payload_md5"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 8), "utf-8"))).alias("head_hex"),
    )


@query(
    "text_bpe_token_estimate",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_ws_tokens,
           CAST(len(list_filter(string_split_regex(
                 regexp_replace(regexp_replace(text, '([a-zA-Z])([0-9])', '\1 \2', 'g'),
                                '([0-9])([a-zA-Z])', '\1 \2', 'g'), '\s+'),
               t -> t <> '')) AS INT) AS n_bpe_tokens
    FROM documents""",
    doc="BPE-proxy token estimation (operators/text.bpe_ish_token_count): whitespace count plus letter/digit-seam subword splits; capture-group regex runs identically on Java regex and RE2",
    tags=("text-tokens", "text-bpe"),
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        text.token_count("text").alias("n_ws_tokens"),
        text.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


@query(
    "sample_stratified_per_bucket",
    oracle="""
    SELECT doc_id, len_bucket, rn AS sample_rank FROM (
      SELECT doc_id,
             CAST(floor(length(text) / 100) AS BIGINT) AS len_bucket,
             row_number() OVER (
               PARTITION BY CAST(floor(length(text) / 100) AS BIGINT)
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) s
    WHERE rn <= 5""",
    doc="stratified sampling for training-set curation: up to 5 docs per length stratum, ordered by a salted md5 of the id — deterministic, partition-count-independent, engine-portable (vs sample()'s per-engine RNG); one shuffle on the stratum key, rank-limit pushed into the per-partition sort",
    tags=("sampling", "training-pipeline"),
)
def sample_stratified_per_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    bucket = F.floor(F.length("text") / 100).cast("bigint")
    order_key = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("len_bucket").orderBy(order_key, F.col("doc_id"))
    return (
        t["documents"]
        .select("doc_id", bucket.alias("len_bucket"))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 5)
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id AS id,
           CAST(r.i - 1 AS INT) AS frame_no,
           CAST(d.offs[CAST(r.i AS INT)] AS INT) AS byte_offset
    FROM (SELECT doc_id,
                 generate_series(0, greatest(octet_length(CAST(text AS BLOB)) - 1, 0), 64)[1:8] AS offs
          FROM documents) d,
         range(1, 9) r(i)
    WHERE r.i <= len(d.offs)""",
    doc=(
        "multimodal frame sampling (operators/multimodal.frame_sample): "
        "evenly spaced byte offsets per payload via sequence+posexplode — "
        "the explode-to-frames shape of video frame extraction, pure Spark "
        "expressions so it gets a full oracle (codec stages are the "
        "mapInPandas path, tests/test_operators.py)"
    ),
    tags=("multimodal", "frame-sample"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.multimodal import attach_binary_payload, frame_sample

    t = load_tables(spark, sf_dir)
    payload = attach_binary_payload(t["documents"], "doc_id", "text", "text/plain")
    return frame_sample(payload, every_n_bytes=64, max_frames=8)


@query(
    "text_repetition_signals",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    base AS (
      SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
             ROUND(CASE WHEN len(t) > 0
                        THEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                        ELSE 0.0 END, 6) AS uniq_token_ratio,
             list_filter(list_transform(t, (x, i) ->
                 CASE WHEN i < len(t) THEN x || ' ' || t[i + 1] END),
                 s -> s IS NOT NULL) AS bg
      FROM toks),
    cnt AS (
      SELECT doc_id, bgx, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(bg) AS bgx FROM base) GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, SUM(c) AS total, MAX(c) AS top,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
      FROM cnt GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens, b.uniq_token_ratio,
           ROUND(COALESCE(CAST(a.top AS DOUBLE) / CAST(a.total AS DOUBLE), 0.0), 6)
             AS top_bigram_frac,
           ROUND(COALESCE(CAST(a.dup AS DOUBLE) / CAST(a.total AS DOUBLE), 0.0), 6)
             AS dup_bigram_frac
    FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id""",
    doc=(
        "Gopher-style repetition signals (operators/text.repetition_signals): "
        "unique-token ratio shuffle-free per row, top-/duplicated-bigram "
        "occurrence fractions via one doc-keyed shuffle — the boilerplate/"
        "template-spam filter lane of a training-data quality pipeline"
    ),
    tags=("text-quality", "text-repetition", "training-pipeline"),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.repetition_signals(t["documents"])


@query(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(list_transform(t, (x, i) ->
                 CASE WHEN i + 3 <= len(t)
                      THEN array_to_string(t[i:i+3], ' ') END),
                 s -> s IS NOT NULL))) AS shingle
      FROM toks),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0)
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap_shingles
    FROM corpus c JOIN bench b USING (shingle)
    GROUP BY c.doc_id""",
    doc=(
        "benchmark decontamination (operators/text.ngram_decontaminate): "
        "corpus docs sharing any 4-token shingle with the held-out split "
        "(doc_id % 20 = 0 plays the benchmark), overlap-shingle counts "
        "via a shingle equi-join — cost ∝ matches, never corpus × bench"
    ),
    tags=("decontamination", "dedup-ngram", "training-pipeline"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return text.ngram_decontaminate(corpus, bench, n=4)


_PII_SYNTH_SPARK = (
    "concat(substring(text, 1, 40), ' contact user', CAST(doc_id AS STRING), "
    "'@mail.example.org or call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), "
    "' from host 10.', CAST(doc_id % 256 AS STRING), '.0.', CAST((doc_id * 7) % 256 AS STRING))"
)
_PII_SYNTH_DUCK = _PII_SYNTH_SPARK.replace("AS STRING", "AS VARCHAR")
_PII_EMAIL, _PII_PHONE, _PII_IPV4 = (p for _, p in text.PII_PATTERNS)


@query(
    "pii_scrub_battery",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id, {_PII_SYNTH_DUCK} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS INT) AS n_ipv4,
           (len(regexp_extract_all(text, '{_PII_EMAIL}'))
            + len(regexp_extract_all(text, '{_PII_PHONE}'))
            + len(regexp_extract_all(text, '{_PII_IPV4}'))) > 0 AS has_pii,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IPV4>', 'g') AS scrubbed
    FROM synth""",
    doc=(
        "PII detect+mask battery for training-data curation (operators/"
        "text.pii_scrub): deterministic synthetic email/phone/IPv4 injected "
        "per doc, counted with regexp_count and masked with typed tokens — "
        "RE2-compatible patterns run verbatim on both engines; map-only pass"
    ),
    tags=("text-pii", "training-pipeline", "functions-string"),
)
def pii_scrub_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    synth = t["documents"].select("doc_id", F.expr(_PII_SYNTH_SPARK).alias("text"))
    return text.pii_scrub(synth)


@query(
    "split_train_val_test",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
                AS BIGINT) AS split_hash,
           CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 < 90
                THEN 'train'
                WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 < 95
                THEN 'val' ELSE 'test' END AS split
    FROM documents""",
    doc=(
        "train/val/test split assignment by salted content-stable hash "
        "(90/5/5): the standard leakage-free dataset split — a pure per-row "
        "map, reproducible across runs/engines/cluster sizes, no shuffle"
    ),
    tags=("training-pipeline", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 7), 16, 10)
        .cast("bigint") % 100
    )
    return t["documents"].select(
        "doc_id",
        h.alias("split_hash"),
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias("split"),
    )


@query(
    "shuffle_export_shards",
    oracle="""
    SELECT doc_id, shard, row_number() OVER (
             PARTITION BY shard
             ORDER BY md5('shuf42:' || CAST(doc_id AS VARCHAR)), doc_id) AS rank_in_shard
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5('shuf42:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 8
                  AS BIGINT) AS shard
      FROM documents)""",
    doc=(
        "deterministic dataset shuffle for training export: seeded-hash "
        "shard assignment + in-shard hash order — the scalable form (one "
        "partitioned window, never a global sort; shards write in parallel "
        "and the full order is reproducible from the seed alone)"
    ),
    tags=("training-pipeline", "shuffle-export", "window-rank"),
)
def shuffle_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    key = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring(key, 1, 7), 16, 10).cast("bigint") % 8).alias("shard")
    w = Window.partitionBy("shard").orderBy(key, F.col("doc_id"))
    return (
        t["documents"]
        .select("doc_id", shard)
        .withColumn("rank_in_shard", F.row_number().over(w))
    )


@query(
    "seqpack_token_bins",
    oracle="""
    SELECT doc_id, lang, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS bin_id
    FROM (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents)""",
    doc=(
        "sequence packing for context-window training: running-token-sum "
        "bin assignment (512-token budget) per language stream — one "
        "partitioned window over exclusive cumulative sums; bins then pack "
        "in parallel downstream (greedy-sequential packing doesn't shard; "
        "this streaming-order variant does)"
    ),
    tags=("training-pipeline", "seq-packing", "window-frame"),
)
def seqpack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    base = t["documents"].select(
        "doc_id", "lang", text.token_count("text").cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.withColumn("bin_id", F.floor(prior / 512).cast("bigint"))


@query(
    "chunk_dedup_clean",
    oracle="""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i*10+1 : i*10+10], ' ') AS chunk
      FROM base, unnest(range(0, CAST(ceil(len(toks)/10.0) AS INT))) AS t(i)
      WHERE len(toks) > 0
    ),
    ranked AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup_chunks,
           coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS clean_text
    FROM ranked GROUP BY doc_id""",
    doc=(
        "chunk-level exact dedup (operators/text.chunk_dedup): consecutive "
        "10-token chunks, global first-occurrence wins (ordered by doc_id, "
        "pos), cleaned text rebuilt from survivors — the distributed shape "
        "of substring-level training-data dedup (Lee et al. 2022); two "
        "bounded shuffles, no all-pairs"
    ),
    tags=("dedup-chunk", "training-pipeline"),
)
def chunk_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.chunk_dedup(t["documents"], chunk_tokens=10)


@query(
    "domain_mix_resample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
                         WHEN 'src2' THEN 0.0 ELSE 1.0 END AS wt,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
               / 16777216.0 AS u
      FROM documents
    ),
    n AS (
      SELECT doc_id, source,
             CAST(floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS INT)
               AS n_copies
      FROM w
    )
    SELECT doc_id, source, CAST(r.replica AS INT) AS replica
    FROM n, unnest(range(1, n_copies + 1)) AS r(replica)
    WHERE n_copies > 0""",
    doc=(
        "domain-mixture resampling (operators/curation.weighted_resample): "
        "src0 upsampled 2.5x, src1 downsampled 0.5x, src2 dropped, rest "
        "kept — floor(w) replicas + one md5-Bernoulli extra, expected "
        "multiplicity exactly w, deterministic across engines and cluster "
        "layouts; pure per-row map, zero shuffle"
    ),
    tags=("sampling", "curation", "training-pipeline"),
)
def domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.curation import weighted_resample

    t = load_tables(spark, sf_dir)
    out = weighted_resample(
        t["documents"], {"src0": 2.5, "src1": 0.5, "src2": 0.0}, default_weight=1.0
    )
    return out.select("doc_id", "source", "replica")


@query(
    "token_budget_per_source",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS pri
      FROM documents
    ),
    running AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM ranked
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM running WHERE cum_tokens <= 400""",
    doc=(
        "per-source token budget (operators/curation.token_budget_cap): "
        "md5-priority order, keep while the inclusive running token total "
        "<= 400 — the 'cap this domain at N tokens' recipe step, "
        "deterministic on any cluster; one shuffle (the per-source "
        "running-sum window)"
    ),
    tags=("sampling", "curation", "training-pipeline"),
)
def token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.curation import token_budget_cap

    t = load_tables(spark, sf_dir)
    return token_budget_cap(t["documents"], budget_tokens=400)


@query(
    "bm25_relevance_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    lens AS (SELECT id, CAST(len(tk) AS INT) AS dl FROM toks),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(ROUND(SUM(CAST(dl AS DECIMAL(28,6))), 6) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM lens
    ),
    hits AS (
      SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT id, unnest(tk) AS term FROM toks) t
      WHERE term IN ('spark', 'join', 'data')
      GROUP BY id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT h.id, h.term,
             CAST(round(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (h.tf * (1.2 + 1))
               / (h.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
               * 1e6) AS BIGINT) AS s_micro
      FROM hits h
      JOIN dfreq d USING (term)
      CROSS JOIN stats s
      JOIN lens l ON l.id = h.id
    )
    SELECT id, CAST(COUNT(*) AS INT) AS n_terms_hit,
           CAST(SUM(s_micro) AS DOUBLE) / 1e6 AS score
    FROM scored GROUP BY id""",
    doc=(
        "Lucene-flavored BM25 over the documents corpus for query terms "
        "('spark','join','data') — the sink-side (Elasticsearch) relevance "
        "model re-expressed on the lake (operators/relevance.bm25_scores). "
        "Per-term scores accumulate as integer micro-units so the sum is "
        "order-independent across engines and partitionings; corpus stats "
        "and per-term df broadcast into the scoring join"
    ),
    tags=("relevance", "bm25", "text-search"),
)
def bm25_relevance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.relevance import bm25_scores

    t = load_tables(spark, sf_dir)
    return bm25_scores(t["documents"], ["spark", "join", "data"])


@query(
    "curation_pipeline_end_to_end",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    quality AS (
      SELECT doc_id, text, t, len(t) AS n_tokens FROM base WHERE len(t) >= 25),
    canon AS (
      SELECT doc_id, text, t, n_tokens FROM (
        SELECT doc_id, text, t, n_tokens,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS cid
        FROM quality) x WHERE doc_id = cid),
    corpus AS (SELECT * FROM canon WHERE doc_id % 20 <> 0),
    sh_c AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(list_transform(t, (x, i) ->
                 CASE WHEN i + 3 <= len(t)
                      THEN array_to_string(t[i:i+3], ' ') END),
                 s -> s IS NOT NULL))) AS shingle
      FROM corpus),
    bench AS (
      SELECT DISTINCT unnest(list_distinct(list_filter(list_transform(t, (x, i) ->
                 CASE WHEN i + 3 <= len(t)
                      THEN array_to_string(t[i:i+3], ' ') END),
                 s -> s IS NOT NULL))) AS shingle
      FROM base WHERE doc_id % 20 = 0),
    contaminated AS (
      SELECT DISTINCT c.doc_id FROM sh_c c JOIN bench b USING (shingle)),
    clean AS (
      SELECT corpus.doc_id, corpus.n_tokens FROM corpus
      LEFT JOIN contaminated ct ON corpus.doc_id = ct.doc_id
      WHERE ct.doc_id IS NULL)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
    FROM (SELECT doc_id, n_tokens,
                 ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 AS h
          FROM clean) z""",
    doc=(
        "the full curation recipe as ONE verified unit: quality gate "
        "(>=25 tokens) -> exact-dedup canonical survivors -> benchmark "
        "decontamination (drop docs sharing any 4-shingle with the "
        "held-out doc_id%20 split) -> leakage-free hash split assignment. "
        "Composes operators/text + operators/dedup exactly as a user "
        "would; every stage is the bounded-shuffle shape documented in "
        "SCALING.md, and the composition is oracle-matched end to end"
    ),
    tags=("training-pipeline", "curation", "dedup-exact", "decontamination", "split"),
)
def curation_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    n_tok = F.size(text.tokens("text"))
    quality = docs.select("doc_id", "text", n_tok.alias("n_tokens")).where(
        F.col("n_tokens") >= 25
    )
    w = Window.partitionBy(F.md5("text"))
    canon = (
        quality.withColumn("cid", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("cid"))
        .drop("cid")
    )
    corpus = canon.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    overlap = text.ngram_decontaminate(corpus, bench, n=4).select("doc_id")
    clean = corpus.join(overlap, "doc_id", "left_anti")
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 7),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return clean.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias("split"),
    )


@query(
    "feature_hashing_vectors",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    dims AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 4) AS INT) % 16 AS dim,
             COUNT(*) AS cnt
      FROM tok GROUP BY doc_id, dim
    )
    SELECT doc_id,
           array_to_string(list_transform(range(0, 16),
             d -> CAST(coalesce(list_sum(list_transform(
                    list_filter(list_zip(dims_l, cnts_l), p -> p[1] = d),
                    p -> p[2])), 0) AS VARCHAR)), ',') AS tf_vec,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, list(dim) AS dims_l, list(cnt) AS cnts_l, SUM(cnt) AS n_tokens
      FROM dims GROUP BY doc_id
    ) g""",
    doc=(
        "feature-hashing (hashing-trick) term-frequency vectors: every "
        "token md5-hashes into one of 16 fixed dimensions — the classic "
        "vocabulary-free featurizer (no dictionary state, collision-"
        "tolerant, identical on any cluster); one (doc, dim) aggregation "
        "shuffle, vector serialized to CSV ints (engine-identical). "
        "Bridges the text lanes to the vector/ANN lanes at 100 TB scale"
    ),
    tags=("text-features", "hashing-trick", "training-pipeline"),
)
def feature_hashing_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    dims = (
        t["documents"]
        .select("doc_id", F.explode(text.tokens("text")).alias("tok"))
        .select(
            "doc_id",
            (F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int") % 16).alias("dim"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = dims.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("dim", "cnt"))).alias("m"),
        F.sum("cnt").alias("n_tokens"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda d: F.coalesce(F.element_at(F.col("m"), d), F.lit(0)).cast("string"),
    )
    return per_doc.select(
        "doc_id",
        F.array_join(vec, ",").alias("tf_vec"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


@query(
    "weighted_sample_ares",
    oracle="""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             pow(CAST(CAST('0x' || substr(md5('ares:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE)
                   / CAST(16777216.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, rank FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY priority DESC, doc_id) AS rank
      FROM pri
    ) t WHERE rank <= 3""",
    doc=(
        "weighted reservoir sampling (Efraimidis-Spirakis A-Res): "
        "priority = u^(1/w) with a deterministic md5 uniform and weight "
        "w = doc length — top-3 per source by priority IS a weighted "
        "sample without replacement, reproducible on any cluster (the "
        "float priority is identical IEEE ops on identical inputs in "
        "both engines). One rank-limited window per stratum — the "
        "weighted counterpart of the md5-mod uniform sampler"
    ),
    tags=("sampling", "curation", "training-pipeline"),
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ares:"), F.col("doc_id").cast("string"))), 1, 6), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(16777216.0).cast("double")
    )
    pri = (
        t["documents"]
        .where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.pow(u, F.lit(1.0).cast("double") / F.col("n_chars").cast("double")).alias("priority"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        pri.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), "rank")
    )


_GOPHER_STOPS = ", ".join(f"'{w}'" for w in text.GOPHER_STOPWORDS)


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_words,
             round(CASE WHEN len(toks) > 0
                   THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 6) AS mean_word_len,
             CAST(coalesce(list_max(list_transform(toks, t -> length(t))), 0) AS INT) AS max_word_len,
             round(CASE WHEN len(toks) > 0
                   THEN CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 6) AS alpha_word_ratio,
             CAST(len(list_intersect(list_distinct(list_transform(toks, t -> lower(t))),
                                     [{_GOPHER_STOPS}])) AS INT) AS n_distinct_stopwords
      FROM w
    )
    SELECT doc_id, n_words, mean_word_len, max_word_len, alpha_word_ratio, n_distinct_stopwords,
           (n_words >= 25 AND n_words <= 80) AS ok_word_count,
           (mean_word_len >= 3.0 AND mean_word_len <= 6.0) AS ok_mean_word_len,
           (max_word_len <= 20) AS ok_max_word_len,
           (alpha_word_ratio >= 0.8) AS ok_alpha_ratio,
           (n_distinct_stopwords >= 1) AS ok_stopwords,
           ((n_words >= 25 AND n_words <= 80) AND (mean_word_len >= 3.0 AND mean_word_len <= 6.0)
            AND (max_word_len <= 20) AND (alpha_word_ratio >= 0.8)
            AND (n_distinct_stopwords >= 1)) AS passes
    FROM feat""",
    doc=(
        "Gopher-style hard quality gates (operators/text.gopher_rules, Rae "
        "et al. 2021 §A1.1): word-count bounds, mean-word-length band, "
        "longest-word cap, alphabetic-word-ratio floor, a distinct "
        "function-word floor — measured features + per-rule booleans + the "
        "conjunction. The rule-filter stage of a training-data pipeline; "
        "pure per-row Catalyst expressions, pipelines with the 100 TB scan"
    ),
    tags=("text-quality", "training-pipeline", "gopher-rules"),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.gopher_rules(t["documents"])


def _bpe_oracle(merges: int) -> str:
    """DuckDB twin of operators/text.bpe_train: the fixed merge count is
    unrolled into chained materialized CTEs; the greedy left-to-right
    pair merge is the IDENTICAL string-accumulator fold (list_reduce vs
    Spark F.aggregate), and pair statistics are integer-weighted so every
    argmax matches exactly."""
    parts = [
        """
    WITH v AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents) u
      GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT word, freq,
             list_append(list_transform(range(1, length(word) + 1),
                                        i -> substr(word, CAST(i AS INT), 1)), '</w>') AS syms
      FROM v
    )"""
    ]
    prev = "w0"
    fold = (
        "list_reduce(list_prepend('', syms), (acc, x) -> "
        "CASE WHEN acc = '' THEN x "
        "WHEN x = best{i}.b AND (acc = best{i}.a OR (length(acc) > length(best{i}.a) "
        "AND substr(acc, length(acc) - length(best{i}.a), length(best{i}.a) + 1) = ' ' || best{i}.a)) "
        "THEN substr(acc, 1, length(acc) - length(best{i}.a)) || best{i}.a || best{i}.b "
        "ELSE acc || ' ' || x END)"
    )
    for i in range(1, merges + 1):
        parts.append(
            f"""
    p{i} AS MATERIALIZED (
      SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_count FROM (
        SELECT freq, pr.a AS a, pr.b AS b FROM (
          SELECT freq, unnest(list_transform(range(1, len(syms)),
                              j -> {{'a': syms[j], 'b': syms[j + 1]}})) AS pr
          FROM {prev}) x) u
      GROUP BY a, b
    ),
    best{i} AS MATERIALIZED (
      SELECT a, b, pair_count FROM p{i} ORDER BY pair_count DESC, a, b LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT word, freq, string_split({fold.replace('{i}', str(i))}, ' ') AS syms
      FROM {prev} CROSS JOIN best{i}
    )"""
        )
        prev = f"w{i}"
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS step, a, b, a || b AS merged, pair_count FROM best{i}"
        for i in range(1, merges + 1)
    )
    return ",".join(parts) + "\n    " + selects


@query(
    "bpe_train_merges",
    oracle=_bpe_oracle(merges=6),
    doc=(
        "BPE tokenizer training (operators/text.bpe_train, Sennrich et "
        "al. 2016): the first 6 learned merge rules over the documents "
        "corpus — corpus → word-frequency table once (the only "
        "corpus-sized job at 100 TB), then per round an integer-weighted "
        "adjacent-pair count, a deterministic (count desc, pair) argmax, "
        "and a broadcast greedy left-to-right merge fold over the "
        "vocabulary. Oracle-matched by unrolling the 6 rounds into "
        "chained CTEs running the identical fold via list_reduce"
    ),
    tags=("text-tokenize", "bpe", "training-pipeline", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.bpe_train(t["documents"], merges=6)


_CHUNK_SIZE, _CHUNK_STRIDE = 10, 8


@query(
    "rag_chunk_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, t, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS start
      FROM toks
    )
    SELECT doc_id,
           CAST(start / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(start AS INT) AS start_tok,
           CAST(least(start + {_CHUNK_SIZE}, len(t)) AS INT) AS end_tok,
           array_to_string(t[start + 1 : least(start + {_CHUNK_SIZE}, len(t))], ' ') AS chunk_text,
           md5(CAST(doc_id AS VARCHAR) || '|' || CAST(CAST(start / {_CHUNK_STRIDE} AS INT) AS VARCHAR)) AS chunk_id
    FROM spans
    WHERE start = 0 OR len(t) - start > {_CHUNK_SIZE} - {_CHUNK_STRIDE}""",
    doc=(
        "RAG/training chunking: sliding windows of 10 tokens with "
        "stride 8 (2-token overlap preserves context across cuts), "
        "emitting stable md5 chunk ids and token-offset spans — the "
        "document→chunk explode every retrieval-augmented or "
        "long-context training pipeline runs before embedding. Tail "
        "windows already fully contained in their predecessor are "
        "suppressed. Pure per-row sequence explode: no shuffle, "
        "pipelines with the 100 TB scan; chunk count ≈ n_tokens/stride"
    ),
    tags=("chunking", "rag", "training-pipeline", "B9"),
)
def rag_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select("doc_id", text.tokens("text").alias("t"))
    n = F.size("t")
    spans = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE))).alias("start"),
    ).where(
        (F.col("start") == 0)
        | (F.size("t") - F.col("start") > _CHUNK_SIZE - _CHUNK_STRIDE)
    )
    end = F.least(F.col("start") + _CHUNK_SIZE, F.size("t"))
    idx = (F.col("start") / _CHUNK_STRIDE).cast("int")
    return spans.select(
        "doc_id",
        idx.alias("chunk_idx"),
        F.col("start").cast("int").alias("start_tok"),
        end.cast("int").alias("end_tok"),
        F.array_join(
            F.slice("t", F.col("start") + 1, end - F.col("start")), " "
        ).alias("chunk_text"),
        F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), idx.cast("string"))).alias("chunk_id"),
    )


@query(
    "effective_language_diversity",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    m AS (
      SELECT source,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(SUM(n * n) AS BIGINT) AS sumsq,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM c GROUP BY source
    )
    SELECT source, n_langs, total,
           round(CAST(sumsq AS DOUBLE) / (CAST(total AS DOUBLE) * total), 6) AS simpson,
           round((CAST(total AS DOUBLE) * total) / sumsq, 6) AS effective_langs
    FROM m""",
    doc=(
        "corpus language diversity per source: Simpson concentration "
        "Σp² and its inverse — the EFFECTIVE number of languages (10 "
        "equal languages → 10.0; one dominant → ~1) — the "
        "mixture-balance readout a multilingual training pipeline "
        "checks before setting sampling temperatures. Integer counts "
        "and squares (Σn²/N²) until the final divisions; one "
        "map-side-combined aggregation per level"
    ),
    tags=("text-stats", "diversity", "training-pipeline", "B15"),
)
def effective_language_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["documents"].groupBy("source", "lang").agg(F.count("*").cast("bigint").alias("n"))
    m = c.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sumsq"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    return m.select(
        "source",
        "n_langs",
        "total",
        F.round(
            F.col("sumsq").cast("double") / (F.col("total").cast("double") * F.col("total")), 6
        ).alias("simpson"),
        F.round(
            (F.col("total").cast("double") * F.col("total")) / F.col("sumsq"), 6
        ).alias("effective_langs"),
    )
