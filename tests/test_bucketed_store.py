"""BucketedSnapshotStore: dynamic-partition-overwrite targeted merge —
only buckets containing scoped keys are rewritten; correctness matches
the versioned store's semantics."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from sinker_spark.ivm import DELETE, UPSERT
from sinker_spark.ivm_bucketed import BucketedSnapshotStore


def _docs(spark, n, tag="a"):
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit(tag), F.lit("-"), F.col("id")).alias("doc"),
    )


def test_partial_refresh_rewrites_only_affected_buckets(spark, tmp_path):
    store = BucketedSnapshotStore(spark, str(tmp_path), n_buckets=16)
    store.write("v", _docs(spark, 5000))
    assert store.read("v").count() == 5000

    # record per-bucket mtimes, then touch only keys 7 and 9
    base = tmp_path / "v"
    before = {d: os.path.getmtime(base / d) for d in os.listdir(base) if d.startswith("__bucket=")}
    time.sleep(1.1)

    changed = spark.createDataFrame([("7", "B-7"), ("9", "B-9")], "id string, doc string")
    delta = store.refresh_partial("v", changed, ["7", "9"])
    assert {(r["id"], r["op"]) for r in delta.collect()} == {("7", UPSERT), ("9", UPSERT)}

    after = {d: os.path.getmtime(base / d) for d in os.listdir(base) if d.startswith("__bucket=")}
    rewritten = {d for d in after if after[d] > before.get(d, 0)}
    assert 1 <= len(rewritten) <= 2, rewritten  # keys 7,9 live in ≤2 of 16 buckets
    assert len(after) == len(before)

    snap = {r["id"]: r["doc"] for r in store.read("v").collect()}
    assert len(snap) == 5000
    assert snap["7"] == "B-7" and snap["9"] == "B-9"
    assert snap["8"] == "a-8"  # untouched neighbors intact


def test_partial_refresh_deletes_in_scope(spark, tmp_path):
    store = BucketedSnapshotStore(spark, str(tmp_path), n_buckets=8)
    store.write("v", _docs(spark, 100))
    # key 42 vanishes: scope includes it, recompute returns nothing for it
    changed = spark.createDataFrame([("41", "B-41")], "id string, doc string")
    delta = store.refresh_partial("v", changed, ["41", "42"])
    got = {(r["id"], r["op"]) for r in delta.collect()}
    assert got == {("41", UPSERT), ("42", DELETE)}
    snap = store.read("v")
    assert snap.count() == 99
    assert snap.where(F.col("id") == "42").count() == 0


def test_sync_engine_runs_on_bucketed_store(spark, tmp_path):
    """The stores are interchangeable: SyncEngine + targeted refresh on
    the bucketed layout produces the same sink state as the versioned
    store (school update scenario)."""
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.views import ViewDef
    from tests import school_fixtures as fx

    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    eng = SyncEngine(
        spark,
        [ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people")],
        sink,
        BucketedSnapshotStore(spark, str(tmp_path / "snap"), n_buckets=4),
    )
    eng.backfill()
    assert sink.get("people", "p-1") == {"name": "John"}

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-1", "Jane") if r[0] == "p-1" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    batch = spark.createDataFrame(
        [(1, "public", "person", "UPDATE", "p-1", None)],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )
    eng.process_cdc_batch(batch)
    assert sink.get("people", "p-1") == {"name": "Jane"}
    assert eng.last_stats["person_mv"]["targeted"] == 1
    assert eng.store.read("person_mv").count() == 4


def test_full_refresh_and_initial(spark, tmp_path):
    store = BucketedSnapshotStore(spark, str(tmp_path), n_buckets=4)
    d1 = store.refresh("v", _docs(spark, 10))
    assert {r["op"] for r in d1.collect()} == {UPSERT}
    d2 = store.refresh("v", _docs(spark, 10, tag="b"))
    assert d2.count() == 10  # every doc changed tag
    assert store.read("v").where(F.col("doc").startswith("b-")).count() == 10


def test_bucket_emptying_delete_does_not_resurrect(spark, tmp_path):
    """Dynamic partition overwrite skips zero-row partitions: deleting
    EVERY doc in a bucket must remove the bucket's file, not leave the
    old one behind (which resurrected the deleted docs in the snapshot
    while the sink had already been told to delete them)."""
    store = BucketedSnapshotStore(spark, str(tmp_path), n_buckets=4)
    store.write("v", _docs(spark, 40))
    full = spark.read.parquet(str(tmp_path / "v"))
    b0_keys = [r["id"] for r in full.where(F.col("__bucket") == 0).select("id").collect()]
    assert b0_keys  # 40 keys over 4 buckets — bucket 0 is populated

    delta = store.refresh_partial("v", _docs(spark, 0), b0_keys)
    assert {r["op"] for r in delta.collect()} == {DELETE}
    assert delta.count() == len(b0_keys)
    remaining = {r["id"] for r in store.read("v").select("id").collect()}
    assert not (set(b0_keys) & remaining), "deleted docs resurrected"
    assert len(remaining) == 40 - len(b0_keys)
