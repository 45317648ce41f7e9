"""Bucketed in-place snapshot store — the storage layout that makes
*targeted* refresh cheap end-to-end.

``SnapshotStore.refresh_partial`` prunes the recompute to affected keys
(ivm.py), but installing the merged snapshot still rewrote every row —
locally that rewrite dominates (PERF.md). This store shards the
snapshot into N hash buckets as parquet partitions
(``__bucket=pmod(xxhash64(key), N)``) and merges a partial refresh with
Spark's **dynamic partition overwrite**: only the buckets containing
affected keys are rewritten; untouched buckets aren't read OR written.

Cost model: targeted refresh of k keys rewrites ≤ k buckets of size
|snapshot|/N — with N sized so a bucket is one comfortable task
(~128 MB), a 1-row change rewrites one file. Trade-off vs the versioned
store: in-place overwrite has no atomic multi-bucket swap — a crash
mid-merge can leave a torn snapshot (the streaming checkpoint replays
the batch, which re-converges, but readers may observe the tear). On a
real lake this slot is filled by Delta/Iceberg MERGE with snapshot
isolation; the interface here is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.ivm import (
    check_doc_schema_evolution,
    partial_merge_keys,
    snapshot_diff,
    with_doc_hash,
)


class BucketedSnapshotStore:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets

    def _path(self, view: str) -> str:
        return os.path.join(self.root, view)

    def _bucket(self, key_col) -> F.Column:
        # hash the STRING form: callers mix bigint and string keys for the
        # same logical id, and xxhash64(3L) != xxhash64('3') — bucket
        # routing must be representation-independent
        return F.pmod(F.xxhash64(key_col.cast("string")), F.lit(self.n_buckets)).cast("int")

    def exists(self, view: str) -> bool:
        return os.path.isdir(self._path(view))

    def _schema_file(self, view: str) -> str:
        # inside the snapshot dir, '_'-prefixed → invisible to parquet reads
        return os.path.join(self._path(view), "_schema.json")

    def _save_schema(self, view: str, schema) -> None:
        """An EMPTY snapshot (empty view; a partial refresh that deletes
        every doc in every affected bucket of a 1-bucket snapshot)
        writes zero part files, and a bare parquet read of a file-less
        dir fails with UNABLE_TO_INFER_SCHEMA — the sidecar keeps the
        empty snapshot readable with its real schema (same pattern as
        KeyedStateStore)."""
        os.makedirs(self._path(view), exist_ok=True)
        tmp = self._schema_file(view) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(schema.json())
        os.replace(tmp, self._schema_file(view))

    def _read_parquet(self, view: str) -> DataFrame:
        from pyspark.errors import AnalysisException
        from pyspark.sql.types import StructType

        try:
            return self.spark.read.parquet(self._path(view))
        except AnalysisException:
            with open(self._schema_file(view)) as fh:
                schema = StructType.fromJson(json.load(fh))
            return self.spark.createDataFrame([], schema)

    def read(self, view: str) -> DataFrame | None:
        if not self.exists(view):
            return None
        return self._read_parquet(view).drop("__bucket")

    def write(self, view: str, df: DataFrame, key: str = "id") -> None:
        out = with_doc_hash(df.dropDuplicates([key]), key).withColumn("__bucket", self._bucket(F.col(key)))
        (
            out.repartition("__bucket")
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(self._path(view))
        )
        self._save_schema(view, out.schema)

    def reset(self, view: str) -> None:
        """Drop ALL state for ``view`` — the remediation for a breaking
        doc schema change, followed by a full backfill."""
        import shutil

        shutil.rmtree(self._path(view), ignore_errors=True)

    def refresh(self, view: str, new_df: DataFrame, key: str = "id") -> DataFrame:
        old = self.read(view)
        if old is not None:
            check_doc_schema_evolution(
                view, old.schema["doc"].dataType, new_df.schema["doc"].dataType
            )
        # in-place layout: the write overwrites the very path ``old``
        # reads, so the delta MUST be materialized before the write —
        # persist the hashed recompute so the diff and the write share
        # ONE execution of the view lineage (and one doc hashing pass)
        new_h = with_doc_hash(new_df.dropDuplicates([key]), key).persist()
        try:
            delta = snapshot_diff(
                old.select(key, "doc", "doc_hash") if old is not None else None, new_h, key
            )
            delta = delta.localCheckpoint(eager=True)
            self.write(view, new_h, key)
        finally:
            new_h.unpersist()
        return delta

    def refresh_partial(
        self, view: str, new_partial: DataFrame, scope_keys: DataFrame | list, key: str = "id"
    ) -> DataFrame:
        """Targeted merge: diff within scope, then dynamic-partition-
        overwrite ONLY the buckets containing scoped keys — rebuilt from
        (old bucket rows ∉ scope) ∪ new scoped rows."""
        if isinstance(scope_keys, list):
            scope = self.spark.createDataFrame([(str(k),) for k in scope_keys], f"{key} string")
        else:
            scope = scope_keys.select(F.col(scope_keys.columns[0]).cast("string").alias(key))
        scope = scope.distinct()
        old = self.read(view)
        if old is None:
            delta = snapshot_diff(None, new_partial, key)
            self.write(view, new_partial, key)
            return delta
        check_doc_schema_evolution(
            view, old.schema["doc"].dataType, new_partial.schema["doc"].dataType, partial=True
        )
        # hash the recomputed slice ONCE and persist: delta, merge-key
        # collect and the rebuilt write all reuse the cached rows
        np_h = with_doc_hash(new_partial, key).persist()
        try:
            old_h = old.select(key, "doc", "doc_hash")
            delta = snapshot_diff(old_h.join(scope, key, "left_semi"), np_h, key)
            delta = delta.localCheckpoint(eager=True)

            # affected buckets (small: ≤ |scope| + |new keys|); see
            # partial_merge_keys for why the partial's own keys participate
            merge_keys = partial_merge_keys(scope, np_h, key)
            buckets = [
                r["b"]
                for r in merge_keys.select(self._bucket(F.col(key)).alias("b")).distinct().collect()
            ]
            self._merge_buckets(view, np_h, merge_keys, buckets, key)
        finally:
            np_h.unpersist()
        return delta

    def _merge_buckets(
        self, view: str, np_h: DataFrame, merge_keys: DataFrame, buckets: list, key: str
    ) -> None:
        if buckets:
            full = self._read_parquet(view)  # includes __bucket
            affected_old = full.where(F.col("__bucket").isin(buckets))
            # kept rows retain their STORED hash — no re-serialize+md5
            keep = affected_old.drop("__bucket").select(key, "doc", "doc_hash").join(
                merge_keys, key, "left_anti"
            )
            rebuilt = keep.unionByName(np_h)
            out = with_doc_hash(rebuilt.dropDuplicates([key]), key).withColumn(
                "__bucket", self._bucket(F.col(key))
            )
            # the rebuilt plan READS the same path we are about to
            # rewrite — materialize it fully first or the writer races
            # its own input and loses rows (observed at 150k rows; small
            # data hides it behind single-task timing)
            out = out.localCheckpoint(eager=True)
            # dynamic partition overwrite SKIPS partitions with zero
            # output rows: a refresh that deletes EVERY doc in a bucket
            # would leave the old file behind and resurrect the deleted
            # docs in the snapshot — while the sink was told to delete
            # them, a diff-corrupting split brain. Drop the affected
            # bucket dirs explicitly, then append the rebuilt rows.
            import shutil

            for b in buckets:
                shutil.rmtree(
                    os.path.join(self._path(view), f"__bucket={b}"), ignore_errors=True
                )
            (
                out.repartition("__bucket")
                .write.partitionBy("__bucket")
                .mode("append")
                .parquet(self._path(view))
            )
