"""Full-text relevance scoring — the consumer-side model of the engine's
own sink. The reference ships documents into Elasticsearch precisely so
they can be ranked by BM25 (Lucene's default similarity); this module
re-expresses that scoring Spark-side, so relevance experiments (term
weighting, corpus slicing) run on the lake without round-tripping ES.

Lucene-flavored Okapi BM25::

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score   = Σ_t s(d, t)

Determinism: per-term scores are rounded to integer micro-units and
summed as BIGINTs (integer addition commutes — no float-order drift
across partitionings or engines), then scaled back. All Catalyst
expressions; no Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sinker_spark.operators.text import tokens


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every matching document for a bag of query terms.

    Output: ``(id, n_terms_hit, score)`` for documents matching ≥1 term.

    Scale shape: token explode → one (doc, term) aggregation shuffle
    restricted to the query terms (everything else filters out at the
    scan); corpus stats (N, avgdl) are a one-row aggregate and per-term
    df is ``|terms|`` rows — both broadcast into the scoring join. No
    vocabulary-sized state, no driver collection; at 100 TB the cost is
    one filtered shuffle over term hits.

    The term filter is a literal ``array_contains`` — right for query
    bags up to a few hundred terms. For thousands of terms (batch
    scoring a query log), swap the filter for an inner join against a
    broadcast terms DataFrame; the rest of the pipeline is unchanged.
    """
    term_arr = F.array(*[F.lit(t) for t in terms])
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    # document lengths (all docs — the BM25 length prior counts every token)
    lens = toks.select("id", F.size("toks").alias("dl"))
    # corpus stats: decimal-exact avgdl so the double is engine-identical
    stats = lens.agg(
        F.count("*").alias("n_docs"),
        (
            F.round(F.sum(F.col("dl").cast("DECIMAL(28,6)")), 6).cast("double")
            / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    # per-(doc, term) tf for query terms only
    hits = (
        toks.select("id", F.explode("toks").alias("term"))
        .where(F.array_contains(term_arr, F.col("term")))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # per-term document frequency (bounded at |terms| rows)
    dfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .join(lens, "id")
        .select(
            "id",
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    # integer micro-unit accumulation: order-independent, engine-exact
    return (
        scored.select("id", "term", F.round(F.col("s") * 1e6).cast("bigint").alias("s_micro"))
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_terms_hit"),
            (F.sum("s_micro").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


def rrf_fuse(rankings: list[DataFrame], id_col: str = "id", k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (BM25 ⊕ vector ANN) that
    Elasticsearch 8.x exposes as ``rrf``; re-expressed on the lake.

    Each input must carry ``(id, rank)`` (rank 1-based). Score =
    Σ_lists 1/(k + rank), accumulated in integer nano-units so the sum
    is order-independent across engines and partitionings (the rounded
    1e9/(k+rank) value can only sit on a .5 boundary when k+rank is a
    multiple of 2^10 — far beyond any practical shortlist depth).

    Scale shape: union of shortlist-sized relations (each already
    rank-limited upstream) → one groupBy on the id. Nothing here touches
    the corpus — fusion cost ∝ Σ shortlist sizes."""
    parts = [r.select(F.col(id_col).alias("id"), F.col("rank")) for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    micro = F.round(F.lit(1e9) / (F.lit(k) + F.col("rank"))).cast("bigint")
    return (
        u.select("id", micro.alias("s_nano"))
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_lists"),
            (F.sum("s_nano").cast("double") / F.lit(1e9)).alias("rrf"),
        )
    )
