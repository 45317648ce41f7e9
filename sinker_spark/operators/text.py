"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built from JVM-side ``pyspark.sql.functions``
expressions (whole-stage codegen, zero Python in the row loop); there are
deliberately no Python UDFs here. Each operator is a DataFrame→DataFrame
function usable on a 100 TB ``documents`` table: everything is a pure
per-row ``select`` (no shuffle at all) except where noted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lexicons for the language-ID heuristic. Real
# deployments swap in fastText & friends via the multimodal UDF path; the
# heuristic itself (per-language function-word hit-rate argmax) is the
# classic n-gram/function-word approach and runs entirely JVM-side.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "for", "with", "as"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de": ("der", "die", "und", "das", "von", "den", "mit", "ist", "im", "des"),
}

PUNCT_RE = r"[.,!?;:]"


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization → array<string> (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """Sub-word-ish token count: split on whitespace AND at letter/digit
    boundaries (a cheap BPE proxy: 'spark2024' → 2 pieces). Written with
    capture-group replaces (not lookaround) so the identical expression
    runs on RE2-based engines (DuckDB oracle) — two passes: letter→digit
    then digit→letter seams."""
    c = F.col(col) if isinstance(col, str) else col
    seamed = F.regexp_replace(
        F.regexp_replace(c, r"([a-zA-Z])([0-9])", r"$1 $2"), r"([0-9])([a-zA-Z])", r"$1 $2"
    )
    pieces = F.split(seamed, r"\s+")
    return F.size(F.filter(pieces, lambda t: t != ""))


def stopword_hits(col: str | Column, lexicon: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, F.lower(t))))


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score.

    Pure projection — no shuffle; at 100 TB this is a single map stage
    fused into the parquet scan by whole-stage codegen. Tokenization is
    staged through a projected column so it runs once per row (lambda
    expressions are not CSE'd — see operators/dedup.shingles).
    """
    df = df.select(F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks"))
    arr = F.array(*[F.lit(w) for w in LANG_LEXICONS["en"]])
    n_chars = F.length(text_col)
    n_tok = F.size("__toks")
    n_punct = n_chars - F.length(F.regexp_replace(text_col, PUNCT_RE, ""))
    n_stop = F.size(F.filter("__toks", lambda t: F.array_contains(arr, F.lower(t))))
    tok_d = n_tok.cast("double")
    avg_tok_len = F.when(n_tok > 0, (n_chars - n_tok + 1).cast("double") / tok_d).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / tok_d).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    # classic Gopher-style heuristics, composed left-to-right so the
    # arithmetic is engine-reproducible
    score = (
        F.lit(1.0) * stop_ratio
        - F.lit(0.5) * punct_ratio
        + F.lit(0.01) * F.least(tok_d, F.lit(100.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language function-word hits
    (ties and zero-hit docs → 'und'). Deterministic and shuffle-free."""
    hits = {lang: stopword_hits(text_col, lex) for lang, lex in LANG_LEXICONS.items()}
    langs = sorted(hits)
    best = F.greatest(*[hits[lg] for lg in langs])
    # count how many languages achieve the max; unique winner required
    n_best = sum((hits[lg] == best).cast("int") for lg in langs)
    pred = F.when((best > 0) & (n_best == 1),
                  F.coalesce(*[F.when(hits[lg] == best, F.lit(lg)) for lg in langs])
                  ).otherwise(F.lit("und"))
    return df.select(F.col(id_col), *[hits[lg].alias(f"hits_{lg}") for lg in langs], pred.alias("pred_lang"))


def repetition_signals(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: unique-token ratio
    (per-row, shuffle-free) plus top-bigram and duplicated-bigram
    occurrence fractions (explode → count per (doc, bigram) → per-doc
    rollup: one shuffle keyed by doc id, the scalable path for arbitrarily
    long documents — an all-pairs HOF scan would be O(tokens²) per row).
    High top_bigram_frac / dup_bigram_frac mark boilerplate and
    degenerate repetition; low uniq_token_ratio marks template spam.
    """
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n_tok = F.size(t)
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    uniq_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(t)).cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    base = staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(uniq_ratio, 6).alias("uniq_token_ratio"),
        bigrams.alias("__bigrams"),
    )
    per_doc = (
        base.select(F.col(id_col), F.explode("__bigrams").alias("bg"))
        .groupBy(id_col, "bg")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("__total"),
            F.max("count").alias("__top"),
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(F.lit(0))).alias("__dup"),
        )
    )
    frac = lambda num: F.round(  # noqa: E731 - tiny local combinator
        F.coalesce(num.cast("double") / F.col("__total").cast("double"), F.lit(0.0)), 6
    )
    return (
        base.drop("__bigrams")
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "uniq_token_ratio",
            frac(F.col("__top")).alias("top_bigram_frac"),
            frac(F.col("__dup")).alias("dup_bigram_frac"),
        )
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    n-token shingle with any benchmark document, with the overlap count —
    the standard held-out-set contamination check run before training.

    Shape: shingle both sides (distinct per doc), equi-join on the shingle
    string, count per corpus doc. Cost ∝ shingle-join matches, never
    corpus × benchmark; at 100 TB the join shuffles on the shingle hash
    (or broadcasts the benchmark side — typically millions of shingles,
    well under broadcast limits — which AQE picks by size).
    """
    from sinker_spark.operators.dedup import shingle_rows

    c = shingle_rows(corpus, id_col, text_col, n)
    b = shingle_rows(benchmark, id_col, text_col, n).select("shingle").distinct()
    return (
        c.join(b, "shingle")
        .groupBy(id_col)
        .agg(F.count("shingle").alias("n_overlap_shingles"))
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of casefolded, punctuation-stripped,
    whitespace-collapsed text — the canonical-form hash used for exact
    dedup across trivially-different copies."""
    norm = F.regexp_replace(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", ""), r" +", " ")
    return df.select(F.col(id_col), F.md5(F.trim(norm)).alias("fingerprint"))


# PII patterns are RE2-compatible (character classes only — no
# lookaround, no backreferences) so the IDENTICAL pattern strings run
# verbatim in RE2-based engines (the DuckDB oracle) and in Java regex.
# Masking order matters: emails first (their local part may contain '+'
# and digits), then phones, then IPv4 (pure digits/dots, can't collide
# with the other two once they're masked).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("phone", "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}"),
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII detection + masking for training-data curation: per-document
    match counts for each PII class plus the scrubbed text with every
    match replaced by a typed mask token (``<EMAIL>`` …). Pure per-row
    JVM regex (regexp_count / regexp_replace) — no shuffle, no Python in
    the row loop; at 100 TB this is a map-only pass that pipelines with
    whatever scan produced the text."""
    c = F.col(text_col)
    counts = [F.regexp_count(c, F.lit(pat)).alias(f"n_{name}") for name, pat in PII_PATTERNS]
    scrubbed = c
    for name, pat in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    total = sum(F.regexp_count(c, F.lit(p)) for _, p in PII_PATTERNS)
    return df.select(
        F.col(id_col),
        *counts,
        (total > 0).alias("has_pii"),
        scrubbed.alias("scrubbed"),
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 10,
) -> DataFrame:
    """Chunk-level exact dedup — the distributed shape of substring-level
    training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): split every document into consecutive
    ``chunk_tokens``-token chunks, keep only the globally-first occurrence
    of each distinct chunk (first by ``(doc_id, position)``), and rebuild
    the cleaned text from the survivors.

    Output: ``(id, n_chunks, n_dup_chunks, clean_text)``.

    Scale shape: ~n_tokens/chunk_tokens rows flow through exactly two
    hash shuffles — one on the chunk value for the first-occurrence
    window, one back on the document id for reassembly. No all-pairs
    comparison anywhere; a suffix-array pass (the paper's exact
    algorithm) is not cluster-friendly, while this chunked variant is
    embarrassingly partition-parallel at 100 TB.
    """
    from pyspark.sql import Window

    ct = chunk_tokens
    base = df.select(F.col(id_col), tokens(text_col).alias("toks")).where(F.size("toks") > 0)
    chunks = (
        base.select(
            id_col,
            "toks",
            F.explode(
                F.sequence(F.lit(0), (F.ceil(F.size("toks") / F.lit(float(ct)))).cast("int") - 1)
            ).alias("pos"),
        )
        .select(
            id_col,
            "pos",
            F.array_join(F.slice("toks", F.col("pos") * ct + 1, ct), " ").alias("chunk"),
        )
    )
    w = Window.partitionBy("chunk").orderBy(id_col, "pos")
    ranked = chunks.select(id_col, "pos", "chunk", F.row_number().over(w).alias("rn"))
    return ranked.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("int").alias("n_dup_chunks"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("rn") == 1, F.struct("pos", "chunk")))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
    )


def token_kl_divergence(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_term: int = 9,
) -> DataFrame:
    """Token-distribution drift per group: truncated KL divergence
    KL(p_group || p_corpus) over the group's observed vocabulary, with
    add-one smoothing on both sides — the mixture-drift monitor a
    training pipeline runs per source/snapshot to catch a crawl slice
    going off-distribution.

    Determinism: each term p·ln(p/q) is rounded to ``round_term``
    digits and accumulated in exact DECIMAL, so the sum is independent
    of partitioning AND engine (a raw double sum is neither).

    Scale shape: two map-side-combinable aggregations (per-group token
    counts, corpus token counts); the tok-keyed join is vocabulary-sized
    on both sides (hash-distributed; AQE broadcasts the corpus counts
    when they fit). No row ever leaves the JVM."""
    toks = df.select(F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("tok"))
    grp_tok = toks.groupBy("grp", "tok").agg(F.count("*").alias("c_gt"))
    grp_tot = toks.groupBy("grp").agg(F.count("*").alias("n_g"))
    corpus_tok = toks.groupBy("tok").agg(F.count("*").alias("c_t"))
    vocab = toks.select(F.count_distinct("tok").alias("v"), F.count("*").alias("n"))
    p = F.col("c_gt").cast("double") + F.lit(1.0)
    q = F.col("c_t").cast("double") + F.lit(1.0)
    pn = (F.col("n_g") + F.col("v")).cast("double")
    qn = (F.col("n") + F.col("v")).cast("double")
    term = F.round((p / pn) * F.log((p / pn) / (q / qn)), round_term)
    return (
        grp_tok.join(corpus_tok, "tok")
        .join(F.broadcast(grp_tot), "grp")
        .crossJoin(F.broadcast(vocab))
        .groupBy("grp")
        .agg(
            F.round(F.sum(term.cast("DECIMAL(28,12)")), 6).cast("double").alias("kl"),
            F.count("*").alias("n_terms"),
        )
        .select(F.col("grp").alias(group_col), "kl", "n_terms")
    )


def unigram_cross_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy under the corpus unigram model — the
    perplexity-style quality filter (CCNet / Wenzek et al. 2020 shape,
    with the corpus itself as the LM): documents whose token
    distribution is "surprising" relative to the corpus score high and
    get reviewed/dropped. H(d) = −(1/n_d) Σ_tok ln q(tok), q = corpus
    unigram frequency (every doc token is in the corpus by construction,
    so no smoothing term is needed).

    Determinism: per-token ln q is rounded to nano-units and summed as
    BIGINT (order-independent), one float division at the end.

    Scale shape: token explode → vocabulary-keyed count agg →
    vocabulary-keyed join back (AQE broadcasts the counts when they
    fit) → doc-keyed agg. Two map-side-combinable shuffles, no Python."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    corpus = toks.groupBy("tok").agg(F.count("*").alias("c_t"))
    total = toks.select(F.count("*").alias("n"))
    lnq_nano = F.round(
        F.log(F.col("c_t").cast("double") / F.col("n").cast("double")) * F.lit(1e9)
    ).cast("bigint")
    return (
        toks.join(corpus, "tok")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), lnq_nano.alias("lnq"))
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("n_tokens"), F.sum("lnq").alias("s"))
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(
                -(F.col("s").cast("double") / F.lit(1e9)) / F.col("n_tokens").cast("double"), 6
            ).alias("cross_entropy"),
        )
    )


# The eight function words Gopher's "stop word" rule checks for (Rae et
# al. 2021, Table A1 — document must contain at least 2 of them).
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 25,
    max_words: int = 80,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 6.0,
    max_word_len: int = 20,
    min_alpha_word_ratio: float = 0.8,
    min_distinct_stopwords: int = 1,
) -> DataFrame:
    """Gopher-style quality RULES (Rae et al. 2021 §A1.1): per-document
    hard pass/fail gates — word-count bounds, mean-word-length band,
    longest-word cap, fraction-of-words-with-an-alphabetic-char floor,
    and a minimum count of distinct function words. Emits the measured
    features, one boolean per rule, and the conjunction ``passes``.

    Thresholds default to this corpus' regime (10-99 word synthetic
    docs — e.g. the function-word floor is 1 because the synthetic
    vocabulary carries only 'the'); production uses Gopher's published
    50/100k/2-stopword values. Pure per-row
    Catalyst array expressions — no shuffle, no UDF, pipelines with the
    scan at 100 TB."""
    toks = tokens(text_col)
    n = F.size(toks)
    nd = n.cast("double")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    mean_len = F.round(F.when(n > 0, sum_len.cast("double") / nd).otherwise(0.0), 6)
    max_len = F.coalesce(F.array_max(F.transform(toks, lambda t: F.length(t))), F.lit(0))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    alpha_ratio = F.round(F.when(n > 0, n_alpha.cast("double") / nd).otherwise(0.0), 6)
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(F.transform(toks, lambda t: F.lower(t))), stops)
    )
    out = df.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        max_len.alias("max_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.alias("n_distinct_stopwords"),
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_max_word_len": F.col("max_word_len") <= max_word_len,
        "ok_alpha_ratio": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
        "ok_stopwords": F.col("n_distinct_stopwords") >= min_distinct_stopwords,
    }
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    passes = None
    for name in rules:
        c = F.col(name)
        passes = c if passes is None else (passes & c)
    return out.withColumn("passes", passes)


def _bpe_merge_step(acc, x):
    """One fold step of the greedy left-to-right pair merge: ``acc`` is
    the space-joined merged prefix, ``x`` the next symbol; outer columns
    ``a``/``b`` (the pair being merged) are captured from the joined
    best-pair row. Greedy non-overlap falls out of the fold: once a pair
    merges, the new trailing symbol is ``a||b`` ≠ ``a``."""
    suffix_ok = (F.length(acc) > F.length(F.col("a"))) & (
        F.substring(
            acc,
            (F.length(acc) - F.length(F.col("a"))).cast("int"),
            (F.length(F.col("a")) + 1).cast("int"),
        )
        == F.concat(F.lit(" "), F.col("a"))
    )
    return (
        F.when(acc == "", x)
        .when(
            (x == F.col("b")) & ((acc == F.col("a")) | suffix_ok),
            F.concat(
                F.substring(acc, F.lit(1), (F.length(acc) - F.length(F.col("a"))).cast("int")),
                F.col("a"),
                F.col("b"),
            ),
        )
        .otherwise(F.concat(acc, F.lit(" "), x))
    )


def bpe_train(df: DataFrame, merges: int = 6, text_col: str = "text") -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016) as pure
    dataflow → the learned merge table (step, a, b, merged, pair_count).

    The corpus compresses to a WORD-FREQUENCY table first (BPE's classic
    trick: pair statistics only need each distinct word once, weighted),
    so every iteration runs on a vocabulary-sized relation regardless of
    corpus size — at 100 TB the one corpus-sized job is the initial word
    count; the loop touches |vocab| rows per round. Each round:

    1. pair counts: explode adjacent symbol pairs, SUM(freq) — integer
       weights, so the argmax is exact and engine-independent,
    2. best pair: global (count desc, a, b) argmax — one row,
    3. merge: broadcast the best pair and fold every word's symbol
       sequence through a greedy left-to-right string-accumulator merge
       (identical lambda in the DuckDB oracle via list_reduce).

    No driver-side data beyond Spark's own 1-row limit plans; the merge
    table unions k single-row relations. Words are whitespace tokens,
    symbols start as characters + a '</w>' end marker."""
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i.cast("int"), F.lit(1).cast("int")),
        ),
        F.array(F.lit("</w>")),
    )
    words = vocab.select("word", "freq", syms.alias("syms")).localCheckpoint(eager=True)
    merge_rows = None
    for step_i in range(1, merges + 1):
        pairs = words.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("pr"),
        )
        counts = pairs.groupBy("pr.a", "pr.b").agg(
            F.sum("freq").cast("bigint").alias("pair_count")
        )
        best = (
            counts.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = best.select(
            F.lit(step_i).cast("int").alias("step"),
            "a",
            "b",
            F.concat("a", "b").alias("merged"),
            "pair_count",
        )
        merge_rows = row if merge_rows is None else merge_rows.unionByName(row)
        words = (
            words.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                "word",
                "freq",
                F.split(F.aggregate("syms", F.lit(""), _bpe_merge_step), " ").alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
    return merge_rows
