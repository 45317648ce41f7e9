"""Lake-layout maintenance: small-file compaction and range-clustered
rewrite.

Streaming sinks and incremental refreshes (ivm/foreachBatch) produce
many small files over time; at 100 TB scan cost is dominated by file
count (driver listing, task scheduling, row-group overhead), so periodic
compaction to ~target-sized files is standard lake hygiene. The second
lever is CLUSTERING: rewriting with `repartitionByRange` + per-file sort
on a key gives files disjoint min/max ranges, so parquet footer stats
prune entire files for key-range predicates (poor man's Z-order for the
1-D case — the right tool for `id`-scoped targeted refresh reads).

Both operations write to a NEW directory and leave the swap to the
caller (`ivm.SnapshotStore`'s versioned-pointer pattern): maintenance
must never overwrite data in place on an object store.

Reference parity note: the reference has no storage layer of its own
(Postgres owns layout, vacuum, and indexes — README.md:300-301 tells
users to add indexes themselves); these utilities are the lake-side
equivalent of that operational surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class MaintenancePolicy:
    """Every-N-epochs state hygiene for a long-running engine.

    Without it, a month-long CDC stream grows state unboundedly in two
    places: the snapshot store accretes one version per refresh per
    view (plus one per batch for each lane's replay-guard marker), and
    keyed lane-state buckets can fragment into many small files under
    AQE skew splits. The engine applies this policy from
    ``process_cdc_batch`` (SyncEngine.maintain): snapshot-store
    ``vacuum(keep_versions)`` for every stored relation, and
    ``KeyedStateStore.compact`` for every lane state — refreshing each
    view's replay-guard marker afterwards so the version bump from
    compaction is not mistaken for a torn fold.

    ``every_n_epochs`` trades time-travel depth + maintenance overhead
    against storage growth; at one batch per few seconds the default
    keeps store growth bounded to ~minutes of history.
    """

    every_n_epochs: int = 32
    keep_versions: int = 2
    max_files_per_bucket: int = 2


def describe_layout(spark: SparkSession, path: str) -> dict:
    """Driver-side metadata scan: file count + byte sizes (no data read)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    files = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        files.append(int(st.getLen()))
    return {
        "n_files": len(files),
        "total_bytes": sum(files),
        "avg_bytes": (sum(files) // len(files)) if files else 0,
    }


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``src_path`` parquet into ``dest_path`` with ~target-sized
    files; with ``cluster_cols``, range-partition + sort within files so
    footer min/max stats prune whole files on key predicates.

    Partition count comes from the measured byte size (compressed size is
    a good proxy for output size under the same codec). Returns the
    before/after layout summary.
    """
    before = describe_layout(spark, src_path)
    n_parts = max(1, -(-before["total_bytes"] // target_file_bytes))  # ceil
    df: DataFrame = spark.read.parquet(src_path)
    if cluster_cols:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in cluster_cols]
        df = df.repartitionByRange(n_parts, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_parts)
    df.write.mode("errorifexists").parquet(dest_path)
    after = describe_layout(spark, dest_path)
    return {"before": before, "after": after, "target_partitions": n_parts}


def file_key_ranges(path: str, key: str) -> list[tuple]:
    """(min, max) of ``key`` per parquet file (footer stats only) — the
    evidence that a clustered rewrite produced prunable disjoint ranges."""
    import pyarrow.parquet as pq

    ranges = []
    for root, _dirs, names in os.walk(path):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, name))
            idx = md.schema.names.index(key)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            ranges.append((lo, hi))
    return sorted(ranges)
