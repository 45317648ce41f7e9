"""Incremental view maintenance: keyed snapshots + snapshot diff.

This is the Spark-native replacement for ``REFRESH MATERIALIZED VIEW
CONCURRENTLY`` (reference query_templates.py:13, sinker.py:131-135):
Postgres recomputes the view and applies a row-level delta against the
stored copy; we recompute the view DataFrame and *compute* the delta
explicitly with a full-outer join on the key:

    upserts = rows where the key is new OR the doc changed
    deletes = keys present in the old snapshot but absent from the new

The reference needs a unique index on id for this (query_templates.py:12,
sinker.py:104-105); our equivalent invariant is key uniqueness, enforced
by ``dropDuplicates`` at materialization.

Scale design:
- the join is key-partitioned both sides; storing snapshots
  hash-partitioned (``repartition(key)`` before write) keeps the diff a
  co-partitioned join at read time; AQE picks SMJ vs broadcast per size.
- change detection compares a 128-bit content hash (md5 of the JSON doc),
  computed at write time and persisted, so the diff join moves
  (key, hash) pairs — not documents — until the final upsert projection.
- snapshots are versioned directories with an atomically-renamed pointer
  file: readers never observe a partial write, and the previous version
  stays for replay/debug (the streaming checkpoint makes replays
  idempotent anyway: last-write-wins per key at the sink).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UPSERT = "upsert"
DELETE = "delete"


class SchemaEvolutionError(ValueError):
    """A view redefinition changed the stored document schema in a way
    the requested refresh cannot honor. The message always carries the
    remediation (full refresh vs reset+backfill)."""


def _explain_incompat(old, new, path: str) -> str | None:
    """None if ``new`` only ADDS fields to ``old`` (any nesting depth);
    else a human-readable description of the first breaking difference.
    Nullability flags are ignored (parquet round-trips relax them)."""
    from pyspark.sql import types as T

    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        new_fields = {f.name: f for f in new.fields}
        for f in old.fields:
            if f.name not in new_fields:
                return f"field '{path}.{f.name}' was removed"
            sub = _explain_incompat(f.dataType, new_fields[f.name].dataType, f"{path}.{f.name}")
            if sub:
                return sub
        return None
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return _explain_incompat(old.elementType, new.elementType, path + "[]")
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return _explain_incompat(old.keyType, new.keyType, path + "<key>") or _explain_incompat(
            old.valueType, new.valueType, path + "<value>"
        )
    if old.simpleString() != new.simpleString():
        return f"type of '{path}' changed {old.simpleString()} -> {new.simpleString()}"
    return None


def check_doc_schema_evolution(view: str, old_type, new_type, partial: bool = False) -> bool:
    """Gate a refresh against the stored snapshot's document schema.

    Returns False when unchanged, True when the change is a pure
    field-add (compatible: the refresh proceeds and re-emits every doc —
    the sink documents genuinely changed shape). Raises
    :class:`SchemaEvolutionError` when a field was removed or retyped
    (breaking — reference parity is ``DROP`` + ``CREATE MATERIALIZED
    VIEW`` + re-backfill, sinker.py:100-103), or on ANY change under a
    partial refresh (a targeted merge would splice mixed-schema rows
    into one snapshot)."""
    if old_type.simpleString() == new_type.simpleString():
        return False
    incompat = _explain_incompat(old_type, new_type, "doc")
    if incompat:
        raise SchemaEvolutionError(
            f"view '{view}': breaking document schema change ({incompat}). "
            "Incremental refresh cannot migrate stored documents; call "
            f"store.reset('{view}') to drop the snapshot state, then re-run a "
            "full backfill (reference parity: DROP + CREATE MATERIALIZED VIEW, "
            "sinker.py:100-103)."
        )
    if partial:
        raise SchemaEvolutionError(
            f"view '{view}': document schema gained fields, but a PARTIAL "
            "refresh would splice new-schema rows into an old-schema snapshot. "
            "Run a full refresh() once to version-bump the snapshot (every doc "
            "re-emits), then partial refreshes resume."
        )
    return True


def with_doc_hash(df: DataFrame, key: str = "id", doc: str = "doc") -> DataFrame:
    """(key, doc) → (key, doc, doc_hash). Hash of the canonical JSON
    serialization (explicit nulls) — struct-shape-independent equality.

    A frame that already carries ``doc_hash`` (a snapshot read back from
    parquet — every store persists the hash) is passed through: reusing
    the stored hash lets a diff's old side scan two narrow columns
    instead of re-serializing every document to JSON and re-hashing it
    (column pruning reaches the parquet scan; guide §2.3/§6)."""
    if "doc_hash" in df.columns:
        return df.select(F.col(key), F.col(doc), F.col("doc_hash"))
    doc_json = (
        F.to_json(doc, {"ignoreNullFields": "false"})
        if dict(df.dtypes)[doc] not in ("string",)
        else F.col(doc)
    )
    return df.select(F.col(key), F.col(doc), F.md5(doc_json).alias("doc_hash"))


def partial_merge_keys(scope: DataFrame, new_partial: DataFrame, key: str) -> DataFrame:
    """Keys a targeted merge must supersede: the scope ∪ the partial's
    OWN keys. A partial row whose key is outside scope (a view key born
    this batch) must replace any stored row of that key — and its bucket
    must count as touched — or the merge drops/duplicates rows (shared
    by all three snapshot stores)."""
    return scope.unionByName(
        new_partial.select(F.col(key).cast("string").alias(key))
    ).distinct()


def snapshot_diff(
    old: DataFrame | None,
    new: DataFrame,
    key: str = "id",
    doc: str = "doc",
) -> DataFrame:
    """Delta between snapshots → (key, op ∈ {upsert, delete}, doc).

    ``old`` may be None (initial backfill: everything is an upsert —
    reference analog: the full-view backfill stream, sinker.py:60-72).
    """
    new_h = with_doc_hash(new, key, doc)
    if old is None:
        return new_h.select(F.col(key), F.lit(UPSERT).alias("op"), F.col(doc))
    old_h = with_doc_hash(old, key, doc).select(
        F.col(key).alias("__old_key"), F.col("doc_hash").alias("__old_hash")
    )
    joined = new_h.join(old_h, new_h[key] == old_h["__old_key"], "full_outer")
    upserts = joined.where(
        F.col("__old_key").isNull() | (F.col("doc_hash") != F.col("__old_hash"))
    ).where(F.col(key).isNotNull()).select(F.col(key), F.lit(UPSERT).alias("op"), F.col(doc))
    deletes = joined.where(F.col(key).isNull()).select(
        F.col("__old_key").alias(key), F.lit(DELETE).alias("op"), F.lit(None).cast(new.schema[doc].dataType).alias(doc)
    )
    return upserts.unionByName(deletes)


class SnapshotStore:
    """Versioned keyed snapshots per view under ``root/{view}/v_{n}``.

    The ``_CURRENT`` pointer file is written via atomic rename so a crash
    mid-materialization never corrupts the readable snapshot — the moral
    equivalent of CONCURRENTLY's non-blocking swap.
    """

    def __init__(self, spark: SparkSession, root: str, partitions: int | None = None):
        self.spark = spark
        self.root = root
        self.partitions = partitions

    def _dir(self, view: str) -> str:
        return os.path.join(self.root, view)

    def _pointer(self, view: str) -> str:
        return os.path.join(self._dir(view), "_CURRENT")

    def current_version(self, view: str) -> int | None:
        try:
            with open(self._pointer(view)) as fh:
                return json.load(fh)["version"]
        except (OSError, ValueError, KeyError):
            return None

    def read(self, view: str, version: int | None = None) -> DataFrame | None:
        """Read the current snapshot, or time-travel to ``version`` (any
        version not yet vacuumed)."""
        v = version if version is not None else self.current_version(view)
        if v is None:
            return None
        path = os.path.join(self._dir(view), f"v_{v}")
        if version is not None and not os.path.isdir(path):
            raise FileNotFoundError(f"snapshot {view} v_{version} not found (vacuumed?)")
        return self.spark.read.parquet(path)

    def write(self, view: str, df: DataFrame, key: str = "id") -> int:
        """Materialize a new snapshot version; returns the version number.

        Enforces key uniqueness (reference's unique index,
        query_templates.py:12) and persists the content hash so diffs
        don't recompute/serialize documents to compare them.
        """
        v = (self.current_version(view) or 0) + 1
        path = os.path.join(self._dir(view), f"v_{v}")
        out = with_doc_hash(df.dropDuplicates([key]), key)
        if self.partitions:
            out = out.repartition(self.partitions, key)
        out.write.mode("overwrite").parquet(path)
        os.makedirs(self._dir(view), exist_ok=True)
        tmp = self._pointer(view) + f".tmp.{int(time.time() * 1e6)}"
        with open(tmp, "w") as fh:
            json.dump({"version": v, "path": path}, fh)
        os.replace(tmp, self._pointer(view))
        return v

    def refresh(self, view: str, new_df: DataFrame, key: str = "id") -> DataFrame:
        """Recompute-and-diff (the engine's REFRESH CONCURRENTLY,
        A11): returns the delta (key, op, doc) AND installs the new
        snapshot. The delta is computed against the pre-refresh version.

        Order matters for cost: the snapshot is written FIRST (the one
        and only execution of the view lineage), then the delta is
        diffed from the written parquet — both sides of the diff read
        immutable version dirs with STORED doc hashes, so the old side
        prunes to (key, doc_hash) and neither side re-runs the view or
        re-hashes documents. The previous order (diff the live lineage,
        then write) executed the full view twice per refresh."""
        old = self.read(view)
        if old is not None:
            old = old.select(key, "doc", "doc_hash")
            check_doc_schema_evolution(
                view, old.schema["doc"].dataType, new_df.schema["doc"].dataType
            )
        v = self.write(view, new_df, key)
        new_mat = self.read(view, v)
        delta = snapshot_diff(old, new_mat, key)
        # small (changed rows only); pin so the caller's count + sink
        # actions don't each re-run the diff join
        return delta.localCheckpoint(eager=True)

    def refresh_partial(
        self,
        view: str,
        new_partial: DataFrame,
        scope_keys: DataFrame,
        key: str = "id",
    ) -> DataFrame:
        """Targeted incremental refresh: recompute-and-diff ONLY the keys
        in ``scope_keys`` (one column: the view key).

        This goes beyond the reference — ``REFRESH MATERIALIZED VIEW
        CONCURRENTLY`` re-executes the full view query and diffs
        (query_templates.py:13); here the view recompute itself is
        restricted (the caller filters compile() by key, which Catalyst
        pushes down to the parent-table scan, joining only affected
        rows). At 100 TB this is the difference between touching a few
        documents and re-joining the world.

        The installed snapshot = (old minus scope) ∪ new_partial — no
        recompute of out-of-scope rows, one co-partitioned anti-join.
        Delta semantics within scope match snapshot_diff exactly:
        upserts for new/changed keys, deletes for scoped keys that
        vanished from the recomputed slice.
        """
        scope = scope_keys.select(F.col(scope_keys.columns[0]).cast("string").alias(key)).distinct()
        old = self.read(view)
        if old is None:
            v = self.write(view, new_partial, key)
            return snapshot_diff(None, self.read(view, v), key).localCheckpoint(eager=True)
        check_doc_schema_evolution(
            view, old.schema["doc"].dataType, new_partial.schema["doc"].dataType, partial=True
        )
        # hash the recomputed slice ONCE and persist it: the delta, the
        # merge-key set and the merged write below all reuse the cached
        # rows instead of each re-running the scoped view recompute
        old_h = old.select(key, "doc", "doc_hash")
        np_h = with_doc_hash(new_partial, key).persist()
        try:
            old_in_scope = old_h.join(scope, key, "left_semi")
            delta = snapshot_diff(old_in_scope, np_h, key)
            delta = delta.localCheckpoint(eager=True)
            merge_keys = partial_merge_keys(scope, np_h, key)
            # kept rows retain their STORED hash; the write below reuses
            # it, so the O(N) re-serialize+md5 of untouched docs is gone
            keep = old_h.join(merge_keys, key, "left_anti")
            merged = keep.unionByName(np_h)
            self.write(view, merged, key)
        finally:
            np_h.unpersist()
        return delta

    def reset(self, view: str) -> None:
        """Drop ALL snapshot state for ``view`` — the remediation for a
        breaking schema change (followed by a full backfill)."""
        import shutil

        shutil.rmtree(self._dir(view), ignore_errors=True)

    def vacuum(self, view: str, keep_last: int = 2) -> list[int]:
        """Drop snapshot versions older than the newest ``keep_last``
        (retention; the current version is never removed). Returns the
        versions deleted. On an object store this maps to lifecycle
        rules / manifest GC; locally it's a directory delete."""
        import re
        import shutil

        current = self.current_version(view)
        if current is None:
            return []
        d = self._dir(view)
        versions = sorted(
            int(m.group(1))
            for name in os.listdir(d)
            if (m := re.fullmatch(r"v_(\d+)", name))
        )
        doomed = [v for v in versions if v <= current - keep_last]
        for v in doomed:
            shutil.rmtree(os.path.join(d, f"v_{v}"), ignore_errors=True)
        return doomed
