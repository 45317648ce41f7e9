"""ManifestSnapshotStore: immutable commits + atomic manifest swap —
MERGE semantics with snapshot isolation (the Delta/Iceberg slot of
ivm_bucketed.py's docstring, self-contained on parquet + JSON).

Asserts the two halves the other stores each give up: only touched
buckets get new files (BucketedSnapshotStore's win) AND commits are
atomic with time travel and no torn reads (SnapshotStore's win)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sinker_spark.ivm import DELETE, UPSERT
from sinker_spark.ivm_manifest import ManifestSnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx


def _docs(spark, n, tag="a"):
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit(tag), F.lit("-"), F.col("id")).alias("doc"),
    )


def _data_files(root, view):
    out = {}
    data = os.path.join(root, view, "data")
    for commit in os.listdir(data):
        for bucket in os.listdir(os.path.join(data, commit)):
            bdir = os.path.join(data, commit, bucket)
            if not (bucket.startswith("__bucket=") and os.path.isdir(bdir)):
                continue
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    p = os.path.join(bdir, f)
                    out[p] = os.path.getmtime(p)
    return out


def test_partial_refresh_writes_only_touched_buckets(spark, tmp_path):
    store = ManifestSnapshotStore(spark, str(tmp_path), n_buckets=16)
    store.write("v", _docs(spark, 5000))
    files_before = _data_files(tmp_path, "v")
    manifest_before = store._manifest("v")["buckets"]

    changed = spark.createDataFrame([("7", "B-7"), ("9", "B-9")], "id string, doc string")
    delta = store.refresh_partial("v", changed, ["7", "9"])
    assert {(r["id"], r["op"]) for r in delta.collect()} == {("7", UPSERT), ("9", UPSERT)}

    # every pre-existing data file is still there, byte-untouched
    files_after = _data_files(tmp_path, "v")
    for p, mtime in files_before.items():
        assert p in files_after and files_after[p] == mtime
    # new files exist only for the ≤2 buckets holding keys 7 and 9
    assert 1 <= len(files_after) - len(files_before) <= 2
    manifest_after = store._manifest("v")["buckets"]
    moved = {b for b in manifest_before if manifest_after[b] != manifest_before[b]}
    assert 1 <= len(moved) <= 2
    # untouched bucket pointers carried forward verbatim
    for b in set(manifest_before) - moved:
        assert manifest_after[b] == manifest_before[b]

    snap = {r["id"]: r["doc"] for r in store.read("v").collect()}
    assert len(snap) == 5000
    assert snap["7"] == "B-7" and snap["9"] == "B-9" and snap["8"] == "a-8"


def test_partial_refresh_deletes_in_scope(spark, tmp_path):
    store = ManifestSnapshotStore(spark, str(tmp_path), n_buckets=8)
    store.write("v", _docs(spark, 100))
    changed = spark.createDataFrame([("41", "B-41")], "id string, doc string")
    delta = store.refresh_partial("v", changed, ["41", "42"])
    assert {(r["id"], r["op"]) for r in delta.collect()} == {("41", UPSERT), ("42", DELETE)}
    snap = store.read("v")
    assert snap.count() == 99
    assert snap.where(F.col("id") == "42").count() == 0


def test_time_travel_and_atomicity(spark, tmp_path):
    store = ManifestSnapshotStore(spark, str(tmp_path), n_buckets=8)
    store.write("v", _docs(spark, 50))
    store.refresh_partial(
        "v", spark.createDataFrame([("3", "NEW-3")], "id string, doc string"), ["3"]
    )
    assert store.current_version("v") == 2
    # v1 still reads the pre-merge state (immutable files)
    v1 = {r["id"]: r["doc"] for r in store.read("v", version=1).collect()}
    assert v1["3"] == "a-3" and len(v1) == 50
    v2 = {r["id"]: r["doc"] for r in store.read("v", version=2).collect()}
    assert v2["3"] == "NEW-3" and len(v2) == 50

    # an orphan commit dir (crash before manifest swap) is invisible
    orphan = tmp_path / "v" / "data" / "c_99_orphan" / "__bucket=0"
    os.makedirs(orphan)
    assert {r["id"] for r in store.read("v").collect()} == set(v2)


def test_delta_plan_survives_commit_without_checkpoint(spark, tmp_path):
    """Immutable data files mean the returned delta is collectable AFTER
    the new version is live — the property that lets this store skip the
    eager localCheckpoint both other stores need."""
    store = ManifestSnapshotStore(spark, str(tmp_path), n_buckets=4)
    store.write("v", _docs(spark, 200))
    delta = store.refresh("v", _docs(spark, 200, tag="b"))
    assert store.current_version("v") == 2  # commit already happened
    assert delta.where(F.col("op") == UPSERT).count() == 200  # now consume it


def test_vacuum_reclaims_unreferenced_commits(spark, tmp_path):
    store = ManifestSnapshotStore(spark, str(tmp_path), n_buckets=4)
    store.write("v", _docs(spark, 100))
    for i in range(3):
        store.refresh_partial(
            "v",
            spark.createDataFrame([(str(i), f"N-{i}")], "id string, doc string"),
            [str(i)],
        )
    removed = store.vacuum("v", keep_last=2)
    assert removed  # early commits superseded in all buckets they owned... or not
    # current and previous versions still readable; older gone
    assert store.read("v").count() == 100
    assert store.read("v", version=store.current_version("v") - 1) is not None


def test_sync_engine_green_with_manifest_store(spark, tmp_path):
    """The school e2e scenario (backfill → update propagation → cascade
    delete) with the manifest store swapped in for SnapshotStore."""
    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    views = [
        ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
        ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses"),
    ]
    eng = SyncEngine(spark, views, sink, ManifestSnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    assert sink.get("courses", "c-1") == fx.GOLDEN_C1
    assert sink.ids("people") == {r[0] for r in fx.SEED["person"]}

    def cdc(records):
        return spark.createDataFrame(
            [(lsn, "public", t, op, i, None) for lsn, t, op, i in records],
            "lsn bigint, schema string, table string, op string, id string, payload string",
        )

    # update propagates through nesting
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-4", "Prof Matthew") if r[0] == "p-4" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(cdc([(1, "person", "UPDATE", "p-4")]))
    assert sink.get("courses", "c-3")["teacher"]["person"]["name"] == "Prof Matthew"

    # cascade delete drops the doc
    rows["course"] = [r for r in rows["course"] if r[0] != "c-2"]
    rows["enrollment"] = [r for r in rows["enrollment"] if r[2] != "c-2"]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(cdc([(2, "course", "DELETE", "c-2")]))
    assert sink.get("courses", "c-2") is None
    assert sink.ids("courses") == {"c-1", "c-3"}


def test_vacuum_under_reader_interleaving(spark, tmp_path):
    """Snapshot-isolation under churn: a reader that pinned version v
    BEFORE later commits and a vacuum must still collect correct rows as
    long as v is inside the keep_last retention window — data files are
    immutable and vacuum only deletes commit dirs unreferenced by every
    kept manifest. A version OUTSIDE the window fails loudly with the
    'vacuumed?' error on re-open, never a silent partial read."""
    store = ManifestSnapshotStore(spark, str(tmp_path / "m"), n_buckets=8)
    store.write("v", _docs(spark, 40, "a"))                      # v1
    store.refresh_partial("v", _docs(spark, 3, "b"), [0, 1, 2])  # v2 (partial: carries v1 files)
    # reader pins v2 while more churn happens
    pinned_v2 = store.read("v", version=2)
    expect_v2 = {r["id"]: r["doc"] for r in pinned_v2.collect()}
    assert expect_v2["0"] == "b-0" and expect_v2["5"] == "a-5"

    store.refresh_partial("v", _docs(spark, 2, "c"), [0, 1])     # v3
    removed = store.vacuum("v", keep_last=2)                     # keeps v2, v3
    # interleaved reader still sees its full pinned snapshot
    assert {r["id"]: r["doc"] for r in pinned_v2.collect()} == expect_v2
    # v1's manifest is pruned: re-opening it fails loudly
    import pytest

    with pytest.raises(FileNotFoundError, match="vacuumed"):
        store.read("v", version=1)
    # nothing referenced by the kept manifests was deleted
    for ver in (2, 3):
        m = store._manifest("v", ver)
        for rel in m["buckets"].values():
            assert os.path.isdir(os.path.join(str(tmp_path / "m"), "v", rel)), (ver, rel)
    # and the current view is correct after all of it
    cur = {r["id"]: r["doc"] for r in store.read("v").select("id", "doc").collect()}
    assert cur["0"] == "c-0" and cur["2"] == "b-2" and cur["7"] == "a-7"
    assert isinstance(removed, list)


def test_vacuum_keeps_commits_shared_with_retained_versions(spark, tmp_path):
    """A commit dir owned by a pruned version but still pointed at by a
    kept manifest (partial-refresh carry-forward) must survive vacuum —
    deleting it would corrupt the CURRENT snapshot, not just history."""
    store = ManifestSnapshotStore(spark, str(tmp_path / "m2"), n_buckets=8)
    store.write("v", _docs(spark, 40, "a"))                      # v1 -> commit c_1
    store.refresh_partial("v", _docs(spark, 1, "b"), [0])        # v2
    store.refresh_partial("v", _docs(spark, 2, "c").where("id = '1'"), [1])  # v3
    store.vacuum("v", keep_last=1)                               # keeps only v3
    # v3 still references c_1 for every untouched bucket: all rows intact
    cur = {r["id"]: r["doc"] for r in store.read("v").select("id", "doc").collect()}
    assert len(cur) == 40 and cur["0"] == "b-0" and cur["1"] == "c-1" and cur["9"] == "a-9"


def test_partial_refresh_new_key_outside_scope_is_lossless(spark, tmp_path):
    """Regression (found by a mis-scoped test): a new_partial row whose
    key is OUTSIDE scope_keys lands in a bucket the scope never named.
    The merge must still rebuild that bucket completely — deriving the
    touched set from scope alone used to overwrite it with only the new
    row, silently dropping every other document in the bucket."""
    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.ivm_bucketed import BucketedSnapshotStore

    stores = {
        "plain": SnapshotStore(spark, str(tmp_path / "p")),
        "bucketed": BucketedSnapshotStore(spark, str(tmp_path / "b"), n_buckets=8),
        "manifest": ManifestSnapshotStore(spark, str(tmp_path / "mm"), n_buckets=8),
    }
    # partial carries an update for key 3 (in scope) AND brand-new key 99
    part = spark.createDataFrame(
        [("3", "new-3"), ("99", "new-99")], "id string, doc string"
    )
    scope_df = spark.createDataFrame([("3",)], "id string")
    for name, store in stores.items():
        store.write("v", _docs(spark, 40, "a"))
        store.refresh_partial("v", part, scope_df if name == "plain" else ["3"])
        cur = {r["id"]: r["doc"] for r in store.read("v").select("id", "doc").collect()}
        assert len(cur) == 41, (name, len(cur))
        assert cur["3"] == "new-3" and cur["99"] == "new-99", name
        # spot-check neighbors that share buckets with 99 survived
        assert all(cur[str(i)] == f"a-{i}" for i in range(40) if i != 3), name
