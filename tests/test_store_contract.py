"""Snapshot-store CONTRACT suite — one behavioral test set parametrized
over every backend: SnapshotStore (versioned parquet dirs),
BucketedSnapshotStore (hash-bucket partition overwrite),
ManifestSnapshotStore (immutable commits + manifest swap), and
DeltaSnapshotStore (Delta MERGE INTO — skipped cleanly when delta-spark
is absent, as in this container).

The per-backend suites (test_bucketed_store.py, test_manifest_store.py,
test_schema_evolution.py) assert each backend's PHYSICAL guarantees
(touched-buckets-only writes, atomic manifest swap, …); this suite pins
the shared SEMANTICS every backend must honor so a lake deployment can
swap the backend without changing engine behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import DELETE, UPSERT, SchemaEvolutionError, SnapshotStore
from sinker_spark.ivm_bucketed import BucketedSnapshotStore
from sinker_spark.ivm_manifest import ManifestSnapshotStore


def _make_delta(spark, root):
    pytest.importorskip("delta", reason="delta-spark not installed")
    from sinker_spark.snapshot_delta import DeltaSnapshotStore, delta_available

    if not delta_available(spark):
        pytest.skip("SparkSession lacks the Delta SQL extension")
    return DeltaSnapshotStore(spark, root)


BACKENDS = {
    "plain": lambda spark, root: SnapshotStore(spark, root),
    "bucketed": lambda spark, root: BucketedSnapshotStore(spark, root, n_buckets=8),
    "manifest": lambda spark, root: ManifestSnapshotStore(spark, root, n_buckets=8),
    "delta": _make_delta,
}


@pytest.fixture(params=sorted(BACKENDS))
def store(request, spark, tmp_path):
    return BACKENDS[request.param](spark, str(tmp_path))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id string, doc string")


def test_write_read_roundtrip_and_key_dedup(store, spark):
    df = _docs(spark, [("1", "a"), ("2", "b"), ("2", "b")])  # dup key
    store.write("v", df)
    got = {r["id"]: r["doc"] for r in store.read("v").select("id", "doc").collect()}
    assert got == {"1": "a", "2": "b"}
    assert store.read("missing_view") is None


def test_refresh_delta_semantics(store, spark):
    store.write("v", _docs(spark, [("1", "a"), ("2", "b"), ("3", "c")]))
    delta = store.refresh("v", _docs(spark, [("1", "a"), ("2", "B"), ("4", "d")]))
    got = {(r["id"], r["op"]) for r in delta.collect()}
    assert got == {("2", UPSERT), ("4", UPSERT), ("3", DELETE)}
    snap = {r["id"]: r["doc"] for r in store.read("v").select("id", "doc").collect()}
    assert snap == {"1": "a", "2": "B", "4": "d"}


def test_refresh_partial_scope_semantics(store, spark):
    store.write("v", _docs(spark, [("1", "a"), ("2", "b"), ("3", "c")]))
    # scope {2,3}: 2 changes, 3 vanishes; 9 is a NEW key born in the
    # partial outside the declared scope (partial_merge_keys: its bucket
    # still counts as touched); 1 is out of scope and must be untouched
    partial = _docs(spark, [("2", "B"), ("9", "new")])
    scope = spark.createDataFrame([("2",), ("3",)], "id string")
    delta = store.refresh_partial("v", partial, scope)
    got = {(r["id"], r["op"]) for r in delta.collect()}
    assert ("2", UPSERT) in got and ("3", DELETE) in got
    snap = {r["id"]: r["doc"] for r in store.read("v").select("id", "doc").collect()}
    assert snap == {"1": "a", "2": "B", "9": "new"}


def test_refresh_partial_on_empty_store_is_backfill(store, spark):
    scope = spark.createDataFrame([("1",)], "id string")
    delta = store.refresh_partial("v", _docs(spark, [("1", "a")]), scope)
    assert {(r["id"], r["op"]) for r in delta.collect()} == {("1", UPSERT)}
    assert {r["id"] for r in store.read("v").collect()} == {"1"}


def test_incompatible_doc_schema_change_raises(store, spark):
    old = spark.createDataFrame([("1",)], "id string").select(
        "id", F.struct(F.lit(1).alias("n")).alias("doc")
    )
    new = spark.createDataFrame([("1",)], "id string").select(
        "id", F.struct(F.lit("s").alias("n")).alias("doc")  # int → string
    )
    store.write("v", old)
    with pytest.raises(SchemaEvolutionError):
        store.refresh("v", new)


def test_reset_drops_all_state(store, spark):
    store.write("v", _docs(spark, [("1", "a")]))
    store.reset("v")
    assert store.read("v") is None
    # and the view is writable again afterwards
    store.write("v", _docs(spark, [("1", "z")]))
    assert [r["doc"] for r in store.read("v").select("doc").collect()] == ["z"]


def test_time_travel_where_supported(store, spark):
    if not hasattr(store, "current_version"):
        pytest.skip("backend has no version history")
    store.write("v", _docs(spark, [("1", "a")]))
    v1 = store.current_version("v")
    store.write("v", _docs(spark, [("1", "b")]))
    v2 = store.current_version("v")
    assert v2 != v1
    assert [r["doc"] for r in store.read("v", version=v1).select("doc").collect()] == ["a"]
    assert [r["doc"] for r in store.read("v").select("doc").collect()] == ["b"]


def test_vacuum_accepts_engine_call_shape():
    """The maintenance sweep drives every backend through ONE call shape —
    ``store.vacuum(name, keep_last=N)`` (runner.maintain) — so a backend
    that spells retention differently (Delta: time-based) must still
    accept the kwarg. Signature-level so it covers DeltaSnapshotStore
    even when delta-spark is not installed."""
    import inspect

    from sinker_spark.snapshot_delta import DeltaSnapshotStore

    for cls in (SnapshotStore, ManifestSnapshotStore, DeltaSnapshotStore):
        sig = inspect.signature(cls.vacuum)
        assert "keep_last" in sig.parameters, cls.__name__
        # callable as vacuum(self, name, keep_last=…) without TypeError
        sig.bind(object(), "view", keep_last=3)
