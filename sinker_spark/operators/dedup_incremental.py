"""Incremental near-duplicate detection: IVM applied to the dedup pipeline.

At 100 TB the MinHash pipeline's cost is dominated by shingling + hashing
the corpus; a steady-state ingest changes a fraction of a percent of it
per batch. This module keeps a persistent **signature index** (one
``(id, sig array<bigint>)`` row per live document — thousands of times
smaller than the corpus) and, per change batch:

1. re-signatures ONLY the changed documents (cost ∝ |delta|);
2. merges them into the index (anti-join out changed/deleted ids, union
   the fresh signatures — the same keyed-snapshot merge the doc IVM uses);
3. probes the index with the delta's LSH band keys — the delta side is
   tiny, so it broadcasts, and the corpus-sized index is only ever
   *scanned*, never shuffled, for candidate generation;
4. scores candidates by the MinHash Jaccard **estimate** (fraction of
   matching signature components) — no shingles of unchanged documents
   are needed, which is what makes the index self-contained.

Deletes fall out naturally: removed ids leave the index, so they can
never appear in a future pair. The reference has no incremental dedup at
all (nor dedup — this extends the BASELINE.json training-pipeline lane);
its closest analog is the full-recompute REFRESH (sinker.py:131-135),
which is exactly the O(corpus) cost this avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.operators.dedup import banded_keys, minhash_signatures


def estimated_jaccard(sig_a: F.Column, sig_b: F.Column) -> F.Column:
    """MinHash estimate: fraction of equal components (unbiased for true
    Jaccard; stderr ≈ 1/sqrt(k))."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.round(matches.cast("double") / F.size(sig_a).cast("double"), 6)


class IncrementalMinHashIndex:
    """Persistent MinHash signature index with delta near-dup queries.

    ``path`` holds the signature parquet (the only state); ``k``/``bands``
    must stay fixed for the index lifetime (signatures are not
    band-compatible across different parameters).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 16,
        bands: int = 4,
        n: int = 3,
        min_est_jaccard: float = 0.5,
    ) -> None:
        self.spark = spark
        self.path = path
        self.k = k
        self.bands = bands
        self.n = n
        self.min_est_jaccard = min_est_jaccard

    # -- state ------------------------------------------------------------
    def bootstrap(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> None:
        """Full-corpus signature build — the one O(corpus) pass."""
        sigs = minhash_signatures(docs, id_col, text_col, k=self.k, n=self.n)
        sigs.withColumnRenamed(id_col, "doc_id").write.mode("overwrite").parquet(self.path)

    def signatures(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # -- delta ------------------------------------------------------------
    def update(
        self,
        changed_docs: DataFrame | None = None,
        deleted_ids: list | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Apply a change batch; return NEW near-dup pairs
        (id_a, id_b, est_jaccard) where at least one side changed.

        Pairs are canonically ordered (id_a < id_b). Unchanged-unchanged
        pairs are never re-derived — they were reported when their later
        member last changed.
        """
        old = self.signatures()
        new_sigs = None
        id_schema = old.select("doc_id").schema
        gone_ids = self.spark.createDataFrame(
            [(i,) for i in (deleted_ids or [])], id_schema
        )
        changed_ids = self.spark.createDataFrame([], id_schema)
        if changed_docs is not None:
            new_sigs = (
                minhash_signatures(changed_docs, id_col, text_col, k=self.k, n=self.n)
                .withColumnRenamed(id_col, "doc_id")
            )
            # ids only — cheap distinct on the delta, and it avoids
            # computing the signature pipeline once for the id list and
            # again for the merge
            changed_ids = (
                changed_docs.select(F.col(id_col).alias("doc_id")).distinct()
            )

        # merge: drop superseded/deleted ids, add fresh signatures — all
        # as anti-joins against the delta-id FRAME, never a collected id
        # set (a backfill-sized availableNow replay would otherwise build
        # a multi-million-literal IN plan and spike driver memory; same
        # shape as the runner's targeted-refresh lane).
        # localCheckpoint BEFORE overwrite: the merged plan reads self.path,
        # and dynamic/full overwrite of a path the plan still reads from
        # silently loses rows (see ivm_bucketed for the same hazard).
        touched_ids = changed_ids.unionByName(gone_ids).distinct()
        merged = old.join(touched_ids, "doc_id", "left_anti")
        if new_sigs is not None:
            merged = merged.unionByName(new_sigs)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.path)

        if new_sigs is None:
            return merged.select(
                F.col("doc_id").alias("id_a"),
                F.col("doc_id").alias("id_b"),
                F.lit(0.0).alias("est_jaccard"),
            ).limit(0)

        # candidate generation: probe the full index with the delta's band
        # keys. The delta is broadcast; the index relation is scanned once,
        # shuffle-free on the candidate side.
        live_changed = changed_ids.join(gone_ids, "doc_id", "left_anti")
        delta_sigs = merged.join(live_changed, "doc_id", "left_semi")
        probe = banded_keys(delta_sigs, "doc_id", self.bands).select(
            F.col("doc_id").alias("id_p"), "band", "band_key"
        )
        index = banded_keys(merged, "doc_id", self.bands).select(
            F.col("doc_id").alias("id_q"), "band", "band_key"
        )
        cand = (
            index.join(F.broadcast(probe), ["band", "band_key"])
            .where(F.col("id_p") != F.col("id_q"))
            .select(
                F.least("id_p", "id_q").alias("id_a"),
                F.greatest("id_p", "id_q").alias("id_b"),
            )
            .distinct()
        )
        sig_a = merged.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
        sig_b = merged.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
        return (
            cand.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .select("id_a", "id_b", estimated_jaccard("sig_a", "sig_b").alias("est_jaccard"))
            .where(F.col("est_jaccard") >= self.min_est_jaccard)
        )
