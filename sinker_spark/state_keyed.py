"""Key-local lane-state store: O(touched buckets) reads AND writes.

The delta lanes fold a CDC batch in O(batch) compute, but persisting
the folded state through the snapshot stores rewrites the WHOLE state
relation every batch — O(|state|) I/O that dwarfs the fold at scale
(the reference never hits this: its state IS the Postgres table). This
store closes that gap for state whose access is key-local (every lane
fold is: all reads and writes hit exactly the batch's join/group
keys): rows are parquet-partitioned by ``__bucket =
pmod(xxhash64(key), N)`` over the LANE'S PROBE KEY, so

- ``read_for_keys``: partition-pruned scan of only the buckets the
  batch's keys hash to — the probe side of a fold never scans state;
- ``merge_for_keys``: dynamic-partition-overwrite of only those
  buckets, rebuilt as (old bucket rows whose key is untouched) ∪ (the
  folded rows for the touched keys).

Per-batch state I/O becomes O(|touched keys| · bucket size) with N
sized so a bucket is one comfortable task (~128 MB at target scale) —
the same layout/cost model as BucketedSnapshotStore.refresh_partial,
applied to lane state instead of document snapshots. Affected-bucket
ids are collected driver-side: bounded by ``n_buckets`` ints, never by
batch or state size.

Crash semantics: in-place overwrite has no multi-bucket atomic swap —
a crash mid-merge can tear the state. The per-state VERSION COUNTER
(bumped BEFORE every destructive write/merge step, exposed as
``current_version``) feeds the runner's replay-guard marker: after any
crash inside the destructive window the stored version is ahead of the
marker's recorded one, so the guard reads the state as torn and routes
the view through the authoritative fallback. (Bumping after success —
the naive order — leaves an undetectable window: files destroyed,
version still matching the marker.) The worst case of pre-bumping is a
spurious fallback on intact state after a crash between bump and
destruction. On a real lake this slot is Delta/Iceberg MERGE with
snapshot isolation; the interface is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedStateStore:
    # adaptive geometry: target rows per bucket (~100-200 MB of typical
    # state rows — the "one comfortable task" the module docstring
    # promises), and the floor/cap on the per-state bucket count
    _ROWS_PER_BUCKET = 1_000_000
    _MIN_BUCKETS, _MAX_BUCKETS = 8, 4096

    def __init__(self, spark: SparkSession, root: str, n_buckets: "int | None" = None):
        """``n_buckets=None`` (the engine default) sizes each state's
        bucket count at write time from its row count — a 100k-row dim
        state gets 8 buckets, a billion-row fact state gets thousands —
        and persists the choice in the state's version sidecar so every
        later read/merge uses the written geometry. An explicit int
        fixes the count for every state (tests, callers that know)."""
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self._size_cache: dict[tuple[str, int | None], int] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _vfile(self, name: str) -> str:
        return os.path.join(self.root, f"{name}._version")

    def _bucket(self, key_cols: list[str], n: int) -> F.Column:
        # hash the '|'-joined STRING form: representation-independent
        # (bigint 3 and string '3' route identically) and stable across
        # key arities
        joined = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        return F.pmod(F.xxhash64(joined), F.lit(n)).cast("int")

    def _meta(self, name: str) -> dict:
        try:
            with open(self._vfile(name)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _nb(self, name: str) -> int:
        """The bucket count a state was WRITTEN with (version sidecar);
        legacy states predating the record, and stores constructed with
        an explicit count, use the fixed value (64 historical default)."""
        n = self._meta(name).get("n_buckets")
        if isinstance(n, int) and n > 0:
            return n
        return self.n_buckets or 64

    def _pick_buckets(self, df: DataFrame) -> int:
        """Adaptive geometry: one count job at state-write time sizes
        the bucket grid so a bucket is one comfortable task — small dim
        states don't pay a 64-file write per merge, huge fact states
        don't funnel into oversized buckets."""
        if self.n_buckets is not None:
            return self.n_buckets
        rows = df.count()
        n = self._MIN_BUCKETS
        while n < self._MAX_BUCKETS and rows > n * self._ROWS_PER_BUCKET:
            n *= 2
        return n

    # Read-side scale-adaptive fast path: pruning a SMALL state costs
    # more than it saves — the bucket-id collect is its own Spark job
    # (a driver round-trip before the read can even be planned) while
    # the whole state is a few parquet files. Below this many bytes of
    # data files read_for_keys serves the full relation (callers
    # semi-join for exactness; a full read is still the bucket-level
    # superset the contract promises). Adaptive-geometry stores only:
    # an explicit n_buckets means the caller controls pruning (and the
    # store-contract tests pin the pruned plan). At production state
    # sizes every state clears the threshold and pruning engages
    # exactly as before.
    _PRUNE_MIN_BYTES = int(
        os.environ.get("SINKER_SPARK_PRUNE_MIN_BYTES", str(32 << 20))
    )

    def _data_bytes(self, name: str) -> int:
        """Total data-file bytes of a state — driver-side listing,
        cached per (name, version) so repeated reads in one batch pay
        one os.walk."""
        key = (name, self.current_version(name))
        hit = self._size_cache.get(key)
        if hit is not None:
            return hit
        total = 0
        for dirpath, _dirs, files in os.walk(self._path(name)):
            for f in files:
                if f.endswith(".parquet"):
                    try:
                        total += os.path.getsize(os.path.join(dirpath, f))
                    except OSError:
                        pass
        self._size_cache[key] = total
        return total

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._vfile(name)) as fh:
                return json.load(fh)["version"]
        except (OSError, ValueError, KeyError):
            return None

    def _bump(self, name: str, n_buckets: "int | None" = None) -> None:
        os.makedirs(self.root, exist_ok=True)  # pre-bump may precede the first write
        meta = self._meta(name)
        meta["version"] = (meta.get("version") or 0) + 1
        if n_buckets is not None:
            meta["n_buckets"] = n_buckets  # geometry travels with the state
        tmp = self._vfile(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._vfile(name))

    def _schema_file(self, name: str) -> str:
        # inside the state dir, '_'-prefixed → invisible to parquet reads
        return os.path.join(self._path(name), "_schema.json")

    def _save_schema(self, name: str, schema) -> None:
        """Persist the state schema next to the data: an EMPTY state
        (empty initial relation; a merge that empties every bucket)
        writes zero part files, and a bare parquet read of a file-less
        dir fails with UNABLE_TO_INFER_SCHEMA — the sidecar lets
        ``_read_parquet`` serve the empty state with its real schema."""
        os.makedirs(self._path(name), exist_ok=True)
        tmp = self._schema_file(name) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(schema.json())
        os.replace(tmp, self._schema_file(name))

    def _read_parquet(self, name: str) -> DataFrame:
        from pyspark.errors import AnalysisException
        from pyspark.sql.types import StructType

        # the sidecar schema (written on every full write; merges
        # preserve it — rebuilt buckets project the stored columns) is
        # the state's exact on-disk schema: passing it to the reader
        # skips the footer-sampling job EVERY bare parquet read pays —
        # a fold reads states ~17 times (merges + walk + serve), so the
        # per-read listing jobs were a visible slice of the driver-paced
        # critical path. Legacy states without a sidecar fall back to
        # inference.
        schema: StructType | None = None
        try:
            with open(self._schema_file(name)) as fh:
                schema = StructType.fromJson(json.load(fh))
        except (OSError, ValueError, KeyError):
            schema = None
        try:
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            return reader.parquet(self._path(name))
        except AnalysisException:
            # zero data files: rebuild the empty frame from the sidecar
            if schema is None:
                with open(self._schema_file(name)) as fh:
                    schema = StructType.fromJson(json.load(fh))
            return self.spark.createDataFrame([], schema)

    def read(self, name: str) -> DataFrame | None:
        """Full state (initialization checks, fallback rebuilds, doc-key
        derivation) — NOT the per-batch path."""
        if not self.exists(name):
            return None
        return self._read_parquet(name).drop("__bucket")

    def columns(self, name: str) -> list[str] | None:
        """Column names of a stored state WITHOUT a Spark read — served
        from the ``_schema.json`` sidecar (written on every full write).
        A per-batch presence/spec check over N states pays N driver file
        reads instead of N parquet-footer listings (the doc-tree lane's
        parse phase was dominated by the latter). Falls back to the
        parquet read for stores predating the sidecar."""
        if not self.exists(name):
            return None
        try:
            with open(self._schema_file(name)) as fh:
                fields = json.load(fh)["fields"]
            return [f["name"] for f in fields if f["name"] != "__bucket"]
        except (OSError, ValueError, KeyError):
            df = self.read(name)
            return list(df.columns) if df is not None else None

    def read_for_keys(
        self, name: str, keys: DataFrame, key_cols: list[str],
        buckets: "list[int] | None" = None,
    ) -> DataFrame | None:
        """Bucket-pruned read: every stored row whose key COULD be in
        ``keys`` (a bucket-level superset — callers semi-join for
        exactness). The bucket-id collect is ≤ n_buckets ints; a caller
        that already knows the ids (e.g. one batched job over many
        states — see buckets_for) passes ``buckets`` to skip the
        per-state collect job."""
        if not self.exists(name):
            return None
        if buckets is None:
            if (
                self.n_buckets is None
                and self._data_bytes(name) < self._PRUNE_MIN_BYTES
            ):
                return self._read_parquet(name).drop("__bucket")
            buckets = [
                r["b"]
                for r in keys.select(
                    self._bucket(key_cols, self._nb(name)).alias("b")
                ).distinct().collect()
            ]
        df = self._read_parquet(name)
        if not buckets:
            return df.where(F.lit(False)).drop("__bucket")
        return df.where(F.col("__bucket").isin(buckets)).drop("__bucket")

    def write(self, name: str, df: DataFrame, key_cols: list[str]) -> None:
        """Full overwrite — state initialization and fallback rebuilds.

        The version bumps BEFORE the destructive write: a crash anywhere
        inside the overwrite then leaves the version ahead of the
        replay marker, so the runner's lane guard reads the state as
        torn and routes to the authoritative fallback. Bumping after
        (the old order) left a window — files destroyed, version still
        matching the marker — where a crash produced torn state the
        guard could NOT detect."""
        # the geometry count and the write would each execute the state
        # frame's full lineage (seed-time state frames are join/groupBy
        # chains over the catalog) — persist across the two actions so
        # the lineage runs ONCE; spills to disk beyond memory, which is
        # still cheaper than recomputing the chain
        df = df.persist()
        try:
            n = self._pick_buckets(df)
            self._bump(name, n_buckets=n)
            out = df.withColumn("__bucket", self._bucket(key_cols, n))
            (
                out.repartition("__bucket")
                .write.partitionBy("__bucket")
                .mode("overwrite")
                .parquet(self._path(name))
            )
            self._save_schema(name, out.schema)
        finally:
            df.unpersist()

    def prunable(self, name: str) -> bool:
        """Whether per-key bucket pruning pays for this state: False for
        small adaptive-geometry states, where the bucket-id collect job
        costs more than touching every (tiny) bucket."""
        return not (
            self.n_buckets is None
            and self._data_bytes(name) < self._PRUNE_MIN_BYTES
        )

    def all_buckets(self, name: str) -> list[int]:
        """Every bucket id in the state's written geometry (sidecar
        read, no Spark job). The merge-side counterpart of the read
        fast path: a small state rewrites across its whole (tiny)
        bucket grid rather than paying a bucket-id job to find out
        which subset the batch touches. The full range is always a
        superset of existing dirs AND of any delta key's target bucket
        (ids are pmod(hash, n)), so empty states still get their new
        rows written."""
        return list(range(self._nb(name)))

    def _shape_for_write(self, name: str, out: DataFrame) -> DataFrame:
        """Partition layout for a bucket rewrite. A LARGE state shuffles
        on __bucket so the write runs bucket-parallel with one file per
        bucket — correct at scale. A SMALL state's rewrite is a few MB:
        the 2×cores-partition shuffle costs more than the write itself
        (N concurrent per-state merge jobs × a shuffle each measured
        ~12 s wall under contention at sf0.1 vs <1 s single-task), so
        coalesce to ONE task — no shuffle; the single task still writes
        every __bucket= dir via partitionBy."""
        if not self.prunable(name):
            return out.coalesce(1)
        return out.repartition("__bucket")

    def buckets_for(self, name: str, keys: DataFrame, key_cols: list[str]) -> DataFrame:
        """One-column ``b`` frame of the bucket ids ``keys`` hash to in
        state ``name``'s geometry — the building block for batching MANY
        states' bucket collects into a single job (tag each state's
        frame, union, one collect) instead of one driver round-trip per
        state."""
        return keys.select(self._bucket(key_cols, self._nb(name)).alias("b")).distinct()

    def merge_for_keys(
        self, name: str, keys: DataFrame, new_rows: DataFrame, key_cols: list[str],
        buckets: "list[int] | None" = None,
    ) -> None:
        """Replace the touched keys' rows: affected buckets are rebuilt
        as (old rows whose key ∉ keys) ∪ new_rows; untouched buckets are
        neither read nor written. ``new_rows`` must carry rows ONLY for
        keys in ``keys`` (the lane fold's output contract). ``buckets``
        (optional) skips the collect like read_for_keys'."""
        if not self.exists(name):
            self.write(name, new_rows, key_cols)
            return
        kdf = keys.select(*key_cols).distinct()
        if buckets is None:
            if not self.prunable(name):
                buckets = self.all_buckets(name)
            else:
                buckets = [
                    r["b"]
                    for r in kdf.select(
                        self._bucket(key_cols, self._nb(name)).alias("b")
                    ).distinct().collect()
                ]
        if not buckets:
            self._bump(name)
            return
        full = self._read_parquet(name)
        affected_old = full.where(F.col("__bucket").isin(buckets)).drop("__bucket")
        # change keys are batch-bounded — broadcast keeps the stored
        # side map-local (no shuffle of the bucket rows)
        keep = affected_old.join(F.broadcast(kdf), key_cols, "left_anti")
        rebuilt = keep.unionByName(new_rows.select(*affected_old.columns))
        out = rebuilt.withColumn("__bucket", self._bucket(key_cols, self._nb(name)))
        # write the rebuilt buckets to a TEMP dir first: the plan reads
        # the live files, so writing elsewhere avoids the
        # writer-races-its-own-input hazard in ONE Spark job where the
        # old localCheckpoint + append paid two materializations
        import shutil

        tmp = self._path(name) + ".__rebuild"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            self._shape_for_write(name, out)
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        # bump BEFORE the destructive swap below: a crash mid-swap would
        # otherwise leave torn state with a version still matching the
        # replay marker — undetectable by the runner's lane guard.
        # Pre-bumped, any crash in the window reads as torn →
        # authoritative fallback. (A crash between the bump and the
        # first rename only costs a spurious fallback on intact state.)
        self._bump(name)
        # swap: drop each affected bucket dir, move the rebuilt one in
        # (a bucket the merge emptied has no tmp dir — dropping the old
        # one is the correct outcome; deleted keys must not resurrect)
        for b in buckets:
            dst = os.path.join(self._path(name), f"__bucket={b}")
            shutil.rmtree(dst, ignore_errors=True)
            src = os.path.join(tmp, f"__bucket={b}")
            if os.path.isdir(src):
                os.replace(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)

    def rewrite_buckets(
        self, name: str, rebuild, key_cols: list[str], buckets: list[int],
        defer_swap: bool = False,
    ):
        """Rewrite the given buckets as ``rebuild(old_rows)`` — ONE job
        + dir swap (same temp-dir/pre-bump crash discipline as
        merge_for_keys). For multiplicity states this lets the caller
        fold a signed delta in a single group-sum over the affected
        buckets instead of the read-twice keep∪new split: untouched
        rows pass through the fold unchanged, so ``rebuild`` must be an
        identity on rows the delta doesn't touch.

        ``defer_swap=True``: run the write job but RETURN the
        bump-and-swap as a closure instead of executing it — the caller
        can keep reading the old files (e.g. a fold whose serve reads
        the pre-merge state under a delta overlay) and swap when its
        reads are done. Nothing destructive happens until the closure
        runs."""
        if not buckets:
            if defer_swap:
                return lambda: self._bump(name)
            self._bump(name)
            return None
        import shutil

        full = self._read_parquet(name)
        old = full.where(F.col("__bucket").isin(buckets)).drop("__bucket")
        out = rebuild(old).withColumn("__bucket", self._bucket(key_cols, self._nb(name)))
        tmp = self._path(name) + ".__rebuild"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            self._shape_for_write(name, out)
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(tmp)
        )

        def _swap() -> None:
            self._bump(name)
            for b in buckets:
                dst = os.path.join(self._path(name), f"__bucket={b}")
                shutil.rmtree(dst, ignore_errors=True)
                src = os.path.join(tmp, f"__bucket={b}")
                if os.path.isdir(src):
                    os.replace(src, dst)
            shutil.rmtree(tmp, ignore_errors=True)

        if defer_swap:
            return _swap
        _swap()
        return None

    def rewrite_buckets_many(
        self, items: "list[tuple[str, object, list[str], list[int]]]",
        defer_swap: bool = False,
    ):
        """Rewrite several states' buckets in ONE Spark write job.

        ``items`` is a list of ``(name, rebuild, key_cols, buckets)`` —
        the per-item semantics are exactly :meth:`rewrite_buckets`. The
        point is the job count: a doc-tree fold rewrites ~8 states per
        batch, and 8 concurrent single-task write jobs pay the driver's
        per-job floor (planning + py4j + scheduling) 8 times — measured
        ~4 s wall EACH under mutual contention at sf0.1 vs ~1 s alone.
        Here every state's rebuilt rows are tagged with a ``__st``
        literal, schema-harmonized (missing columns as typed NULLs —
        parquet RLE-encodes them to almost nothing, and every read goes
        through the state's sidecar schema, which prunes them), unioned,
        and written once under ``partitionBy(__st, __bucket)``; the
        per-state dir/version layout is preserved by swapping each
        state's bucket dirs out of the shared temp dir.

        States whose column NAME maps to different TYPES across the
        batch cannot share one file schema — those fall back to the
        per-state path (never the case for a single view's states, which
        come from one catalog). Crash discipline is unchanged: every
        state's version bumps BEFORE its dirs are touched, so a crash
        anywhere inside the destructive window reads as torn state →
        authoritative fallback.

        ``defer_swap=True`` returns the bump-and-swap phase as a closure
        (see :meth:`rewrite_buckets`): the write job runs now, nothing
        destructive happens until the closure is called."""
        import shutil

        live = [(n, rb, kc, bks) for (n, rb, kc, bks) in items if bks]
        empty_names = [n for n, _rb, _kc, bks in items if not bks]
        if not defer_swap:
            for n in empty_names:
                self._bump(n)
            empty_names = []
        if not live:
            if defer_swap:
                def _bump_only(names=empty_names):
                    for n in names:
                        self._bump(n)
                return _bump_only
            return None
        if len(live) == 1:
            n, rb, kc, bks = live[0]
            inner = self.rewrite_buckets(n, rb, kc, bks, defer_swap=defer_swap)
            if defer_swap:
                def _one(names=empty_names, inner=inner):
                    for nm in names:
                        self._bump(nm)
                    inner()
                return _one
            return None

        import sys
        import time as _t

        _dbg = bool(os.environ.get("SINKER_SPARK_MERGE_DEBUG"))
        _t0 = _t.perf_counter()

        outs: list[tuple[str, DataFrame, list[int]]] = []
        col_types: dict[str, object] = {}
        conflict = False
        for n, rebuild, kc, bks in live:
            full = self._read_parquet(n)
            old = full.where(F.col("__bucket").isin(bks)).drop("__bucket")
            out = rebuild(old).withColumn(
                "__bucket", self._bucket(kc, self._nb(n))
            )
            for f in out.schema.fields:
                if f.name == "__bucket":
                    continue
                seen = col_types.get(f.name)
                if seen is not None and seen != f.dataType:
                    conflict = True
                col_types.setdefault(f.name, f.dataType)
            outs.append((n, out, bks))
        if conflict:
            inners = [
                self.rewrite_buckets(n, rb, kc, bks, defer_swap=defer_swap)
                for n, rb, kc, bks in live
            ]
            if defer_swap:
                def _composed(names=empty_names, inners=inners):
                    for nm in names:
                        self._bump(nm)
                    for fn in inners:
                        fn()
                return _composed
            return None

        ordered = sorted(col_types)
        union = None
        for n, out, _bks in outs:
            have = set(out.columns)
            cols = [
                F.col(c) if c in have else F.lit(None).cast(col_types[c]).alias(c)
                for c in ordered
            ]
            part = out.select(
                F.lit(n).alias("__st"), *cols, F.col("__bucket")
            )
            union = part if union is None else union.unionByName(part)

        # one write job, REBALANCE-hinted on (__st, __bucket): unlike a
        # user repartition (pinned at spark.sql.shuffle.partitions —
        # 64 near-empty write tasks here), the rebalance exchange is
        # AQE-coalescible, so small rebuilds land in one task while
        # large states keep advisory-sized bucket-parallel writes
        # (scale shape preserved). A coalesce(1) instead would
        # serialize all states' rebuild compute into one task
        # (measured: index-group merge 5.4 s vs ~1.5 s shuffled).
        shaped = union.hint("rebalance", "__st", "__bucket")
        # unique per call: the index- and base-group merges of one fold
        # run CONCURRENTLY and must not share (or rmtree) a temp dir
        import uuid

        tmp = os.path.join(self.root, f".__rebuild_many.{uuid.uuid4().hex[:12]}")
        shutil.rmtree(tmp, ignore_errors=True)
        if _dbg:
            _t1 = _t.perf_counter()
            print(f"[merge-many] plan-build {len(outs)} states: "
                  f"{_t1 - _t0:.2f}s", file=sys.stderr)
        (
            shaped.write.partitionBy("__st", "__bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        if _dbg:
            _t2 = _t.perf_counter()
            print(f"[merge-many] write action: {_t2 - _t1:.2f}s", file=sys.stderr)

        def _swap(names=empty_names) -> None:
            # bump every state BEFORE any swap (same pre-bump discipline
            # as rewrite_buckets; a crash between one state's swap and
            # the next's reads every batched state as torn → fallback)
            for nm in names:
                self._bump(nm)
            for n, _o, _b in outs:
                self._bump(n)
            for n, _o, bks in outs:
                src_root = os.path.join(tmp, f"__st={n}")
                for b in bks:
                    dst = os.path.join(self._path(n), f"__bucket={b}")
                    shutil.rmtree(dst, ignore_errors=True)
                    src = os.path.join(src_root, f"__bucket={b}")
                    if os.path.isdir(src):
                        os.replace(src, dst)
            shutil.rmtree(tmp, ignore_errors=True)

        if defer_swap:
            return _swap
        _swap()
        return None

    def states(self) -> list[str]:
        """Names of every lane state under this root (maintenance sweep).
        Rebuild temp dirs (crash leftovers) are not states."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
            and not d.startswith(".")
            and ".__rebuild" not in d
        )

    def bucket_file_counts(self, name: str) -> dict[int, int]:
        """Data-file count per bucket dir (driver-side listing, no read)."""
        out: dict[int, int] = {}
        p = self._path(name)
        if not os.path.isdir(p):
            return out
        for d in os.listdir(p):
            if not d.startswith("__bucket="):
                continue
            b = int(d.split("=", 1)[1])
            out[b] = sum(
                1 for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet")
            )
        return out

    def compact(self, name: str, max_files_per_bucket: int = 1) -> list[int]:
        """Rewrite buckets holding more than ``max_files_per_bucket`` data
        files down to one file each; returns the bucket ids rewritten.

        Merges normally leave one file per touched bucket, but AQE skew
        splits (and any future multi-writer) can fragment a bucket; over
        a long soak fragmented buckets make every pruned read pay
        per-file open cost. Same destructive-window discipline as
        merge_for_keys: checkpoint the rebuilt rows first, bump the
        version BEFORE the rmtree+append so a crash inside the window
        reads as torn state → authoritative fallback."""
        import shutil

        doomed = [
            b for b, n in self.bucket_file_counts(name).items()
            if n > max_files_per_bucket
        ]
        if not doomed:
            return []
        full = self._read_parquet(name)
        rebuilt = full.where(F.col("__bucket").isin(doomed))
        rebuilt = rebuilt.localCheckpoint(eager=True)
        self._bump(name)
        for b in doomed:
            shutil.rmtree(os.path.join(self._path(name), f"__bucket={b}"), ignore_errors=True)
        (
            rebuilt.repartition("__bucket")
            .write.partitionBy("__bucket")
            .mode("append")
            .parquet(self._path(name))
        )
        return doomed

    def reset(self, name: str) -> None:
        import shutil

        shutil.rmtree(self._path(name), ignore_errors=True)
        try:
            os.remove(self._vfile(name))
        except OSError:
            pass
