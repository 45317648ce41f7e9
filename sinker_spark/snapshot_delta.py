"""Delta-Lake-backed snapshot store — the production-lake backend for
the SnapshotStore interface (optional dependency, import-gated).

SCALING.md and PERF.md both note that on a real lake the
snapshot-merge slot is filled by a transactional table format's
``MERGE INTO`` rather than hand-rolled parquet versioning; this module
is that adapter. One Delta table per view at ``root/{view}``:

- ``write``           → ``overwrite`` commit (full snapshot install)
- ``refresh``         → snapshot_diff against the live table, then
                        overwrite — identical delta semantics to
                        SnapshotStore.refresh (ivm.py:212-225)
- ``refresh_partial`` → **one ``MERGE INTO``**: upserts from the
                        recomputed slice, deletes for scoped keys that
                        vanished. Delta rewrites only the files whose
                        key ranges match the merge source (data
                        skipping on the key column), which is the same
                        O(touched-buckets) write profile
                        BucketedSnapshotStore/ManifestSnapshotStore
                        implement by hand (ivm_bucketed.py,
                        ivm_manifest.py) — plus ACID commits and
                        snapshot isolation for free.
- ``read(version=…)`` → Delta time travel (``versionAsOf``)
- ``vacuum``          → ``DeltaTable.vacuum`` (retention-based file GC;
                        Delta's log retention governs how far back time
                        travel reaches, the analog of keep_last)

Version numbers are Delta commit versions (0-based, one per commit)
rather than the filesystem stores' 1-based counters; ``read``/
``current_version`` compose the same way.

The ``delta-spark`` package is not installed in this container, so the
adapter raises a clear RuntimeError at construction when the package
(or the session's Delta extension) is missing, and the contract suite
(tests/test_store_contract.py) skips the backend cleanly. To use it
for real::

    from delta import configure_spark_with_delta_pip
    builder = (SparkSession.builder
        .config("spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog"))
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.ivm import (
    check_doc_schema_evolution,
    partial_merge_keys,
    snapshot_diff,
    with_doc_hash,
)


def delta_available(spark: SparkSession | None = None) -> bool:
    """True when delta-spark is importable AND (if a session is given)
    the session was built with the Delta SQL extension."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is None:
        return True
    exts = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in exts


class DeltaSnapshotStore:
    """SnapshotStore interface over Delta tables (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        if not delta_available(spark):
            raise RuntimeError(
                "DeltaSnapshotStore requires the delta-spark package and a "
                "SparkSession built with the Delta SQL extension "
                "(see sinker_spark/snapshot_delta.py docstring); "
                "use SnapshotStore/ManifestSnapshotStore otherwise"
            )
        from delta.tables import DeltaTable

        self._DeltaTable = DeltaTable
        self.spark = spark
        self.root = root

    def _path(self, view: str) -> str:
        return os.path.join(self.root, view)

    def _table(self, view: str):
        return self._DeltaTable.forPath(self.spark, self._path(view))

    def exists(self, view: str) -> bool:
        return self._DeltaTable.isDeltaTable(self.spark, self._path(view))

    def current_version(self, view: str) -> int | None:
        if not self.exists(view):
            return None
        return self._table(view).history(1).collect()[0]["version"]

    def read(self, view: str, version: int | None = None) -> DataFrame | None:
        if not self.exists(view):
            return None
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        try:
            return reader.load(self._path(view))
        except Exception as e:  # vacuumed / out-of-range time travel
            if version is not None:
                raise FileNotFoundError(
                    f"snapshot {view} v{version} not reachable (vacuumed?)"
                ) from e
            raise

    def write(self, view: str, df: DataFrame, key: str = "id") -> int:
        """Install a full snapshot as one overwrite commit; returns the
        Delta commit version. Key uniqueness enforced the same way as
        the filesystem stores (ivm.py:192-210)."""
        out = with_doc_hash(df.dropDuplicates([key]), key)
        (
            out.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .save(self._path(view))
        )
        return self.current_version(view) or 0

    def refresh(self, view: str, new_df: DataFrame, key: str = "id") -> DataFrame:
        old = self.read(view)
        if old is not None:
            old = old.select(key, "doc")
            check_doc_schema_evolution(
                view, old.schema["doc"].dataType, new_df.schema["doc"].dataType
            )
        delta = snapshot_diff(old, new_df, key)
        delta = delta.localCheckpoint(eager=True)  # pin before the swap
        self.write(view, new_df, key)
        return delta

    def refresh_partial(
        self,
        view: str,
        new_partial: DataFrame,
        scope_keys: DataFrame,
        key: str = "id",
    ) -> DataFrame:
        """Targeted merge as ONE ``MERGE INTO`` (upsert + scoped delete).

        Merge-key semantics are shared with the other stores via
        :func:`partial_merge_keys` (scope ∪ the partial's own keys);
        delta-output semantics match snapshot_diff within scope."""
        scope = scope_keys.select(
            F.col(scope_keys.columns[0]).cast("string").alias(key)
        ).distinct()
        old = self.read(view)
        if old is None:
            delta = snapshot_diff(None, new_partial, key)
            self.write(view, new_partial, key)
            return delta
        check_doc_schema_evolution(
            view, old.schema["doc"].dataType, new_partial.schema["doc"].dataType,
            partial=True,
        )
        old_in_scope = old.select(key, "doc").join(scope, key, "left_semi")
        delta = snapshot_diff(old_in_scope, new_partial, key)
        delta = delta.localCheckpoint(eager=True)

        merge_keys = partial_merge_keys(scope, new_partial, key)
        upserts = with_doc_hash(new_partial.dropDuplicates([key]), key).withColumn(
            "__del", F.lit(False)
        )
        doc_type = new_partial.schema["doc"].dataType
        deletes = (
            merge_keys.join(new_partial.select(key), key, "left_anti")
            .select(
                F.col(key),
                F.lit(None).cast(doc_type).alias("doc"),
                F.lit(None).cast("string").alias("doc_hash"),
                F.lit(True).alias("__del"),
            )
        )
        src = upserts.unionByName(deletes)
        (
            self._table(view)
            .alias("t")
            .merge(src.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedDelete(condition="s.__del")
            .whenMatchedUpdate(
                set={key: f"s.{key}", "doc": "s.doc", "doc_hash": "s.doc_hash"}
            )
            .whenNotMatchedInsert(
                condition="NOT s.__del",
                values={key: f"s.{key}", "doc": "s.doc", "doc_hash": "s.doc_hash"},
            )
            .execute()
        )
        return delta

    def reset(self, view: str) -> None:
        shutil.rmtree(self._path(view), ignore_errors=True)

    def vacuum(
        self,
        view: str,
        *,
        keep_last: int | None = None,
        retention_hours: float = 168.0,
    ) -> list[int]:
        """File GC via Delta's own vacuum. Returns [] — Delta does not
        enumerate which commit versions became unreachable; time-travel
        reach is governed by the table's log/file retention, the analog
        of the filesystem stores' ``keep_last``. ``keep_last`` is
        accepted (and ignored) so the engine's maintenance sweep
        (runner.maintain: ``vacuum(name, keep_last=…)``) drives every
        backend through one call shape — retention here is time-based,
        set per table via ``delta.deletedFileRetentionDuration`` or the
        ``retention_hours`` argument."""
        if self.exists(view):
            self._table(view).vacuum(retention_hours)
        return []
