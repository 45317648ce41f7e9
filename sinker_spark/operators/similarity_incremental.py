"""Incremental ANN index maintenance: IVM applied to the IVF family.

The batch ANN lanes (operators/similarity: kmeans → ivf_topk /
ivf_multiprobe_topk) train a coarse quantizer and assign the corpus in
one pass. At 100 TB a steady-state ingest changes a fraction of a
percent of the embedding corpus per batch — retraining + reassigning
everything per batch is the same O(corpus) cost the incremental dedup
index (operators/dedup_incremental.py) exists to avoid. This module
keeps a persistent **IVF index** as two parquet relations:

- ``centroids``: (cell int, centroid array<double>) — k×dim, a few KB,
  always broadcast / collected to a plan literal;
- ``postings``:  (vec_id, cell, vec array<double>) — the corpus
  partitioned by coarse cell (the classic inverted-file layout).

Per change batch (``update``):

1. superseded/deleted ids leave the postings via an anti-join against
   the delta-id FRAME (never a collected id list — same rule as the
   dedup index merge);
2. new/changed vectors are assigned to their nearest FROZEN centroid —
   a pure per-row projection against the centroid literal (k codegen'd
   distances + argmin; no join, no shuffle), identical to the
   assignment step inside ``similarity.kmeans`` so an update-folded
   index is bit-identical to a bulk assignment of the live corpus to
   the same centroids (the invariant tests/test_incremental_ivf.py
   checks);
3. the merged postings are rewritten (localCheckpoint before overwrite
   — the merged plan reads the path it overwrites).

Queries probe cells exactly like the batch lanes (``query`` wraps
``ivf_topk`` / ``ivf_multiprobe_topk`` over the stored postings).

A frozen quantizer drifts: inserts can pile into few cells (recall and
probe cost degrade) or the corpus can outgrow the training sample.
``drift()`` reports *staleness* (live rows changed since training /
training size) and *imbalance* (max cell size / mean cell size);
``needs_retrain`` thresholds them and ``retrain()`` re-runs the exact
deterministic k-means on the live corpus — the one O(corpus) pass,
scheduled by drift, not by batch.

The reference has no ANN at all (this extends the BASELINE.json
training-pipeline lane); its closest analog is the full REFRESH
(sinker.py:131-135), which is exactly the per-batch O(corpus) cost this
avoids.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.operators.similarity import (
    _sq_dist_to,
    ivf_multiprobe_topk,
    ivf_topk,
    kmeans,
)


def assign_to_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment as a shuffle-free projection:
    (vec_id, cell, vec). Distances round to 9 before the argmin with
    first-min tiebreak toward the lower cell index — the same exactness
    contract as ``similarity.kmeans``, so assignments are engine- and
    parallelism-exact."""
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[F.round(_sq_dist_to(vec, c), 9) for c in centroids])
    return df.select(
        F.col(id_col).alias("vec_id"),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cell"),
        vec.alias("vec"),
    )


class IncrementalIVFIndex:
    """Persistent IVF ANN index with O(batch) maintenance.

    ``path`` holds the index state; ``k``/``iterations`` parameterize the
    deterministic k-means quantizer (init = k lowest-id vectors)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 4,
        iterations: int = 2,
    ) -> None:
        self.spark = spark
        self.path = path
        self.k = k
        self.iterations = iterations

    # -- state ------------------------------------------------------------
    @property
    def _postings_path(self) -> str:
        return os.path.join(self.path, "postings")

    @property
    def _centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self._postings_path)

    def centroids(self) -> list[list[float]]:
        rows = self.spark.read.parquet(self._centroids_path).orderBy("cell").collect()
        return [[float(x) for x in r["centroid"]] for r in rows]

    def _meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    def _write_centroids(self, cents: list[list[float]]) -> None:
        self.spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell int, centroid array<double>"
        ).write.mode("overwrite").parquet(self._centroids_path)

    # -- build ------------------------------------------------------------
    def bootstrap(
        self, emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> None:
        """Train the quantizer + assign the corpus — the one O(corpus)
        pass (repeated only by :meth:`retrain`)."""
        _, cents = kmeans(emb, vec_col=vec_col, id_col=id_col, k=self.k,
                          iterations=self.iterations)
        self._write_centroids(cents)
        assign_to_centroids(emb, cents, id_col, vec_col).write.mode(
            "overwrite"
        ).parquet(self._postings_path)
        n = self.postings().count()
        self._write_meta({"train_size": n, "changed_since_train": 0})

    # -- delta ------------------------------------------------------------
    def update(
        self,
        changed: DataFrame | None = None,
        deleted_ids: list | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Fold one change batch (upserted vectors + deleted ids) into the
        index; cost O(|batch|). Returns the new posting rows."""
        old = self.postings()
        id_schema = old.select("vec_id").schema
        gone = self.spark.createDataFrame([(i,) for i in (deleted_ids or [])], id_schema)
        fresh = None
        touched = gone
        if changed is not None:
            # one row per id per batch — a duplicated id would put BOTH
            # versions in the postings (the CDC layer's latest_per_key
            # netting is the caller's job; fail loudly, don't guess)
            dup = (
                changed.groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"IncrementalIVFIndex.update: duplicate {id_col} in batch "
                    f"(e.g. {dup[0][0]!r}); net the batch to one row per id first"
                )
            fresh = assign_to_centroids(changed, self.centroids(), id_col, vec_col)
            touched = touched.unionByName(
                changed.select(F.col(id_col).alias("vec_id"))
            ).distinct()
        # anti-join against the delta-id frame — never a collected id set
        merged = old.join(touched, "vec_id", "left_anti")
        n_new = 0
        if fresh is not None:
            fresh = fresh.localCheckpoint(eager=True)
            n_new = fresh.count()
            merged = merged.unionByName(fresh)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self._postings_path)
        meta = self._meta()
        meta["changed_since_train"] += n_new + len(deleted_ids or [])
        self._write_meta(meta)
        if fresh is None:
            return merged.limit(0)
        return fresh

    # -- drift ------------------------------------------------------------
    def drift(self) -> dict:
        """Staleness (changes folded since training / training size) and
        imbalance (max cell size / mean cell size over non-empty cells)."""
        meta = self._meta()
        sizes = (
            self.postings().groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        ns = [r["n"] for r in sizes]
        imbalance = (max(ns) * len(ns) / sum(ns)) if ns else 0.0
        staleness = (
            meta["changed_since_train"] / meta["train_size"]
            if meta["train_size"]
            else float("inf")
        )
        return {"staleness": staleness, "imbalance": imbalance,
                "n_cells_live": len(ns)}

    def needs_retrain(
        self, max_staleness: float = 0.5, max_imbalance: float = 4.0
    ) -> bool:
        d = self.drift()
        return d["staleness"] > max_staleness or d["imbalance"] > max_imbalance

    def retrain(self) -> None:
        """Re-fit the quantizer on the LIVE corpus (from the postings —
        no base-table access) and reassign; resets drift counters."""
        live = self.postings().select("vec_id", F.col("vec").alias("embedding"))
        live = live.localCheckpoint(eager=True)  # postings path is overwritten below
        _, cents = kmeans(live, k=self.k, iterations=self.iterations)
        self._write_centroids(cents)
        assign_to_centroids(live, cents).write.mode("overwrite").parquet(
            self._postings_path
        )
        n = self.postings().count()
        self._write_meta({"train_size": n, "changed_since_train": 0})

    # -- query ------------------------------------------------------------
    def query(
        self,
        queries: DataFrame,
        k: int = 3,
        nprobe: int = 1,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Cell-pruned cosine top-k over the index: (qid, nid, sim, rank).
        Queries are assigned to their nearest cell(s) against the stored
        centroids; only those cells' postings are scored."""
        corpus = self.postings().select("vec_id", F.col("vec").alias("embedding"), "cell")
        if nprobe <= 1:
            q = assign_to_centroids(queries, self.centroids(), id_col, vec_col)
            q = q.select("vec_id", F.col("vec").alias("embedding"), "cell")
            return ivf_topk(corpus, q, k=k, cell_col="cell")
        # multiprobe derives its probe centroids as the stored cells'
        # empirical means (cell_centroids) — the op's documented contract
        return ivf_multiprobe_topk(
            corpus,
            queries.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
            k=k,
            nprobe=nprobe,
            cell_col="cell",
        )
