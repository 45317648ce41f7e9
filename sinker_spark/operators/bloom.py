"""Hand-rolled Bloom filter as a runtime pre-filter relation.

The 100 TB pattern this demonstrates (reference has no analog — this is
a lake-scale extension): when a huge fact relation must be checked for
membership against a modest key set (benchmark shingles for
decontamination, blocklists, tombstone keys), materialize the key set as
a Bloom-filter *bitmap relation* of W fixed-width words, broadcast it,
and probe with pure integer ops. The probe side then touches only
bloom-positive rows in the expensive exact verify — identical final
answers (false positives only cost verify work, never correctness),
with the exact join's shuffle shrunk to the candidate subset.

Spark has a native bloom pushdown (spark.sql.optimizer.runtime.
bloomFilter.enabled, injected for shuffle-join pruning); this module
builds the same structure *explicitly* so (a) the filter itself is a
first-class, reusable, engine-portable relation (md5-sliced positions —
a DuckDB oracle can replay it bit-for-bit) and (b) it applies to
patterns the optimizer can't see, like "any shingle of this document
hits the set".

Everything is Catalyst expressions — md5, integer div/mod, shiftleft,
bit_or aggregate — inside whole-stage codegen. No Python row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One md5 per key; K positions come from disjoint 7-hex-char slices of
# the 32-char digest (28 bits each, far more than needed to address M
# bits). Cheaper than K seeded hashes and exactly replayable in any
# engine with md5 + substring + hex-to-int.
K_SLICES = 4


def _positions(key: F.Column, m_bits: int) -> list[F.Column]:
    d = F.md5(key)
    return [
        F.conv(F.substring(d, 1 + 7 * j, 7), 16, 10).cast("bigint") % m_bits
        for j in range(K_SLICES)
    ]


# 32 bits of payload per word: the max shift is 31, so ``1 << bit``
# stays well inside BIGINT in engines that range-check shifts (DuckDB
# raises on 1::BIGINT << 63). Twice the word rows, still broadcast-tiny.
WORD_BITS = 32


def build_bits(keys: DataFrame, key_col: str = "key", m_bits: int = 4096) -> DataFrame:
    """Aggregate a key relation into the filter's word relation
    ``(word_idx int, word bigint)`` — at most ``m_bits/32`` rows, i.e.
    always broadcast-sized for any practical m. One shuffle of
    (word_idx, single-bit word) pairs, map-side bit_or combined."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits))).alias("pos")
    return (
        # NULL keys are not set members (probe(NULL) is false by
        # construction); without this filter they'd hash to NULL
        # positions and leave a junk (NULL, NULL) word row in the state
        # — which the membership lane would serve as a NULL-id document
        keys.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            (F.col("pos") % WORD_BITS).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word"))
    )


def probe(rows: DataFrame, key_col: str, bits: DataFrame, m_bits: int = 4096) -> DataFrame:
    """Append ``bloom_hit`` (boolean) to ``rows``: true iff all K
    positions of ``key_col`` are set in the filter.

    Shape: K broadcast hash joins against the (tiny) word relation —
    the probed relation is NEVER shuffled, its row count never changes,
    and each join is a per-row hash lookup inside codegen. A missing
    word (no key ever touched it) means bit-not-set, hence the left
    joins + coalesce(false)."""
    keep = list(rows.columns)
    out = rows
    hits: list[F.Column] = []
    for j, p in enumerate(_positions(F.col(key_col), m_bits)):
        out = out.withColumn(f"__w{j}i", (p / WORD_BITS).cast("int")).withColumn(
            f"__b{j}", (p % WORD_BITS).cast("int")
        )
        w = bits.select(F.col("word_idx").alias(f"__w{j}i"), F.col("word").alias(f"__w{j}"))
        out = out.join(F.broadcast(w), f"__w{j}i", "left")
        hits.append(
            F.coalesce(
                F.expr(f"shiftright(__w{j}, __b{j})").bitwiseAND(F.lit(1)) == 1,
                F.lit(False),
            )
        )
    allhit = hits[0]
    for h in hits[1:]:
        allhit = allhit & h
    return out.select(*keep, allhit.alias("bloom_hit"))


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    m_bits: int = 4096,
) -> DataFrame:
    """Decontamination with a Bloom pre-filter in front of the exact
    shingle join: build the filter from the benchmark's shingle set,
    probe every corpus shingle (broadcast word relation, no shuffle),
    and run the exact overlap join ONLY over bloom-positive shingles.

    Same answer as operators.text.ngram_decontaminate restricted to
    flagged docs — the bloom stage can only add false positives, which
    the exact join then zeroes out (is_contaminated=false rows are the
    measured false-positive cost). At 100 TB the exact join's shuffle
    shrinks from every corpus shingle to the bloom-positive sliver."""
    from sinker_spark.operators.dedup import shingle_rows

    b_sh = shingle_rows(benchmark, id_col, text_col, n).select("shingle").distinct()
    bits = build_bits(b_sh, "shingle", m_bits)
    c_sh = shingle_rows(corpus, id_col, text_col, n)
    cand = probe(c_sh, "shingle", bits, m_bits).where(F.col("bloom_hit"))
    exact = (
        cand.join(b_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap_shingles"))
    )
    return (
        cand.groupBy(id_col)
        .agg(F.count("*").alias("n_bloom_candidates"))
        .join(exact, id_col, "left")
        .select(
            id_col,
            "n_bloom_candidates",
            F.coalesce("n_overlap_shingles", F.lit(0)).alias("n_overlap_shingles"),
            (F.coalesce("n_overlap_shingles", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )
