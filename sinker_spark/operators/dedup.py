"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these over naive pairwise comparison):

- ``exact``: one shuffle on a 128-bit content hash; the canonical-row
  choice (min id per group) is a window/agg over that same partitioning.
- ``minhash_lsh``: docs → shingle sets → k min-hashes → banded signature
  keys. Candidate pairs come from an equi-join on band keys, so the
  shuffle is O(docs·bands), never O(docs²). Verification (true Jaccard)
  runs only on candidates. All hashing is md5-based and engine-portable,
  so the full pipeline has a DuckDB oracle.
- ``simhash``: 64-bit signature from per-token hash bit-votes; near-dup
  candidates = equal 16-bit bands (Hamming-adjacent docs collide on ≥1
  band w.h.p.); verification via bit_count(xor) ≤ radius.
- n-gram Jaccard: the verification kernel, exposed standalone.

Python never touches rows: every step is Catalyst expressions
(higher-order array functions + md5/xor/bit_count), whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sinker_spark.operators.text import tokens


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Mark each row canonical (kept) or duplicate: canonical = min id per
    md5(text) group. Single hash-partitioned window, no data explosion."""
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_canonical", (F.col(id_col) == F.col("canonical_id")))
        .select(id_col, "content_hash", "canonical_id", "is_canonical")
    )


def shingles(toks: F.Column, n: int = 3) -> F.Column:
    """Distinct n-token shingles from a token-array column.

    Takes a *column reference* (not the tokenize expression): Catalyst
    does not CSE expressions inside lambdas, so building shingles directly
    over ``tokens(text)`` re-runs split+filter for every element_at —
    O(tokens²) per document. Staged through a projected column the
    tokenization runs once per row."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]))
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows — docs with < n tokens produce no rows."""
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return staged.select(F.col(id_col), F.explode(shingles(F.col("__toks"), n)).alias("shingle"))


# MinHash arithmetic: one base hash per shingle (28 bits of its md5) run
# through k independent linear hash functions h_i(x) = (a_i·x + b_i) mod P.
# Engine-portable (md5 + integer arithmetic) and ~k× cheaper than hashing
# k seeded strings per shingle; all k mins reduce in ONE aggregation pass
# (map-side partial min per function — no seed explode, no extra shuffle).
MINHASH_P = 1073741789  # prime < 2^30: products stay < 2^58, no bigint overflow

def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    out = []
    for i in range(1, k + 1):
        a = (2654435761 * i) % MINHASH_P or 1
        b = (40503 * i + 17) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures_from_shingles(sh: DataFrame, id_col: str = "doc_id", k: int = 16) -> DataFrame:
    h = F.conv(F.substring(F.md5("shingle"), 1, 7), 16, 10).cast("bigint")
    based = sh.select(id_col, h.alias("h"))
    mins = based.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"m{i}")
            for i, (a, b) in enumerate(minhash_coeffs(k))
        ]
    )
    return mins.select(id_col, F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       k: int = 16, n: int = 3) -> DataFrame:
    """k min-hashes per doc → (id, sig array<bigint> length k)."""
    return minhash_signatures_from_shingles(shingle_rows(df, id_col, text_col, n), id_col, k)


def banded_keys(sigs: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """(id, band, band_key): one row per signature band slice — the LSH
    bucket relation both the batch pair join and the incremental index
    probe against."""
    return sigs.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("sig"),
    ).select(
        id_col,
        "band",
        F.md5(
            F.concat_ws(
                "|",
                F.col("band"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), F.col("band") * (F.size("sig") / bands).cast("int") + 1,
                                (F.size("sig") / bands).cast("int")),
                        lambda x: x.cast("string"),
                    ),
                ),
            )
        ).alias("band_key"),
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """Banded LSH: equal band-slice → candidate pair. Output (id_a, id_b),
    id_a < id_b, distinct. Shuffle key = (band, band_hash): O(docs·bands)."""
    banded = banded_keys(sigs, id_col, bands)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id",
                   threshold: float = 0.5) -> DataFrame:
    """True n-gram Jaccard for candidate pairs via a shingle-level join
    (cost ∝ candidate shingles, not corpus²). The pair set is tiny by LSH
    construction → broadcast both pair joins so the corpus-sized shingle
    relation is never shuffled here."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    # the b-side join keys on (id_b, shingle), not id_b alone: an
    # id-only key makes the hash join stream |sh_a|·|sh_b| matches per
    # candidate pair through a residual equality filter — quadratic in
    # shingles per doc; the composite key emits intersection rows only
    inter = (
        sh.select(F.col(id_col).alias("id_a"), "shingle")
        .join(F.broadcast(pairs), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 16, bands: int = 4, n: int = 3,
                      threshold: float = 0.5) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: near-duplicate pairs + Jaccard.

    The shingle relation feeds both the signature stage and the verify
    stage; it's persisted so the tokenize+explode+distinct work runs once
    (at cluster scale this would be a checkpointed intermediate table)."""
    sh = shingle_rows(df, id_col, text_col, n).persist()
    sigs = minhash_signatures_from_shingles(sh, id_col, k=k)
    cand = lsh_candidate_pairs(sigs, id_col, bands=bands)
    return jaccard_verify(cand, sh, id_col, threshold)


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash from token-level md5 bit votes, entirely JVM-side.

    Each distinct token hashes to 64 bits (first 16 hex chars of md5);
    each bit votes ±1; signature bit = sign of the vote sum. Same-page
    near-dups differ in few bits → Hamming distance via bit_count(xor).
    """
    tok = df.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    h = tok.select(id_col, F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint").alias("h60"))
    bit_votes = h.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
        F.col("h60"),
    ).select(
        id_col, "bit",
        F.when(F.expr("(h60 >> bit) & 1") == 1, 1).otherwise(-1).alias("vote"),
    )
    sig_bits = bit_votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return (
        sig_bits.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(F.lit(0))).alias("simhash")
        )
    )


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup pairs: band the 60-bit signature into 4×15-bit
    blocks (pigeonhole: hamming ≤ 3·bands-1 collides on ≥1 band for small
    radii); verify with bit_count(xor)."""
    sigs = simhash64(df, id_col, text_col)
    banded = sigs.select(
        id_col, "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).select(
        id_col, "simhash", "band",
        F.expr(f"(simhash >> (band * 15)) & {(1 << 15) - 1}").alias("block"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "block")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "block")
    return (
        a.join(b, ["band", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def positional_shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 8) -> DataFrame:
    """(id, pos, shingle) rows — one per shingle OCCURRENCE (0-based
    token position, duplicates kept), the relation span detection needs."""
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("__toks") - n, F.lit(-1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at("__toks", i + j + 1) for j in range(n)]))
    return staged.select(F.col(id_col), F.posexplode(sh).alias("pos", "shingle"))


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_span: int = 12,
    df_cap: int = 50,
) -> DataFrame:
    """Exact duplicated-substring spans across document pairs — the
    span-level dedup signal of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed relationally
    instead of via a suffix array.

    A length-``s`` token span shared by docs A and B appears as
    ``s - n + 1`` consecutive matching n-shingles on one diagonal
    (pos_a - pos_b constant). So: positional-shingle both sides, equi-join
    on the shingle, then a gaps-and-islands pass per (pair, diagonal) —
    ``island = pos_a - row_number()`` — turns each maximal run into one
    group whose size recovers the span length.

    Scale shape: the only corpus-sized shuffle keys on the shingle
    string (hash-distributed, never all-pairs); ``df_cap`` drops
    shingles occurring in more than ``df_cap`` documents first —
    boilerplate n-grams are exactly the quadratic-fan-out keys, and
    spans made solely of them are stock phrases, not plagiarized spans
    (the suffix-array implementations make the same cut). The window
    runs per (id_a, id_b, diagonal) partition — bounded by the shorter
    document, never global."""
    sh = positional_shingle_rows(df, id_col, text_col, n)
    docfreq = sh.groupBy("shingle").agg(F.count_distinct(F.col(id_col)).alias("__df"))
    kept = sh.join(docfreq.where(F.col("__df") <= df_cap).select("shingle"), "shingle")
    a = kept.select(F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a"), "shingle")
    b = kept.select(F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b"), "shingle")
    m = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a", "pos_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = m.withColumn("island", F.col("pos_a") - F.row_number().over(w))
    return (
        runs.groupBy("id_a", "id_b", "diag", "island")
        .agg(F.min("pos_a").alias("start_a"), F.count("*").alias("__c"))
        .select(
            "id_a",
            "id_b",
            "start_a",
            (F.col("start_a") - F.col("diag")).alias("start_b"),
            (F.col("__c") + F.lit(n - 1)).alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_span)
    )
