"""KeyedStateStore: key-local lane state — bucket-pruned reads,
bucket-scoped merges (untouched bucket files must not be rewritten),
version counter for the replay guard's torn-write detection."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sinker_spark.state_keyed import KeyedStateStore

SCHEMA = "k bigint, payload string, __mult bigint"


def _rows(spark, items):
    return spark.createDataFrame(items, SCHEMA)


def test_roundtrip_and_versions(spark, tmp_path):
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    assert st.read("s") is None and st.current_version("s") is None
    st.write("s", _rows(spark, [(1, "a", 1), (2, "b", 2)]), ["k"])
    assert st.current_version("s") == 1
    got = {(r.k, r.payload, r["__mult"]) for r in st.read("s").collect()}
    assert got == {(1, "a", 1), (2, "b", 2)}
    st.write("s", _rows(spark, [(1, "a", 5)]), ["k"])
    assert st.current_version("s") == 2
    st.reset("s")
    assert st.read("s") is None and st.current_version("s") is None


def test_read_for_keys_superset_and_pruning(spark, tmp_path):
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    data = [(i, f"p{i}", 1) for i in range(100)]
    st.write("s", _rows(spark, data), ["k"])
    keys = spark.createDataFrame([(7,), (42,)], "k bigint")
    got = st.read_for_keys("s", keys, ["k"])
    ks = {r.k for r in got.collect()}
    assert {7, 42} <= ks            # superset contains the asked keys
    assert len(ks) < 100            # ...but pruned to their buckets only
    # empty key set reads nothing
    empty = st.read_for_keys("s", keys.limit(0), ["k"])
    assert empty.count() == 0


def test_merge_replaces_touched_keys_only(spark, tmp_path):
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    st.write("s", _rows(spark, [(i, f"p{i}", 1) for i in range(20)]), ["k"])
    keys = spark.createDataFrame([(3,), (4,)], "k bigint")
    # key 3 updated, key 4 deleted (no new row), others untouched
    st.merge_for_keys("s", keys, _rows(spark, [(3, "NEW", 9)]), ["k"])
    got = {r.k: (r.payload, r["__mult"]) for r in st.read("s").collect()}
    assert got[3] == ("NEW", 9)
    assert 4 not in got
    assert len(got) == 19
    assert got[5] == ("p5", 1)


def test_merge_rewrites_only_affected_bucket_files(spark, tmp_path):
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    st.write("s", _rows(spark, [(i, f"p{i}", 1) for i in range(200)]), ["k"])
    path = str(tmp_path / "s")

    def mtimes():
        return {
            d: max(
                (os.path.getmtime(f) for f in glob.glob(os.path.join(path, d, "*.parquet"))),
                default=0,
            )
            for d in os.listdir(path)
            if d.startswith("__bucket=")
        }

    before = mtimes()
    assert len(before) > 1  # multiple buckets exist — pruning is meaningful
    keys = spark.createDataFrame([(7,)], "k bigint")
    touched_bucket = keys.select(st._bucket(["k"], st._nb("s")).alias("b")).collect()[0]["b"]
    import time

    time.sleep(1.1)  # mtime granularity
    st.merge_for_keys("s", keys, _rows(spark, [(7, "NEW", 2)]), ["k"])
    after = mtimes()
    for d in before:
        if d == f"__bucket={touched_bucket}":
            assert after[d] > before[d], "touched bucket must be rewritten"
        else:
            assert after[d] == before[d], f"untouched bucket {d} was rewritten"
    assert {r.payload for r in st.read_for_keys("s", keys, ["k"]).where(F.col("k") == 7).collect()} == {"NEW"}


def test_merge_on_missing_state_initializes(spark, tmp_path):
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    keys = spark.createDataFrame([(1,)], "k bigint")
    st.merge_for_keys("s", keys, _rows(spark, [(1, "a", 1)]), ["k"])
    assert st.read("s").count() == 1
    assert st.current_version("s") == 1


def test_composite_key_routing(spark, tmp_path):
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    df = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (2, "x", 3)], "a bigint, b string, __mult bigint"
    )
    st.write("s", df, ["a", "b"])
    keys = spark.createDataFrame([(1, "y")], "a bigint, b string")
    got = st.read_for_keys("s", keys, ["a", "b"])
    assert (1, "y", 2) in {(r.a, r.b, r["__mult"]) for r in got.collect()}
    st.merge_for_keys("s", keys, df.limit(0), ["a", "b"])  # delete (1,y)
    remaining = {(r.a, r.b) for r in st.read("s").collect()}
    assert remaining == {(1, "x"), (2, "x")}


def test_empty_state_write_remains_readable(spark, tmp_path):
    """An EMPTY state (empty initial relation) writes zero parquet part
    files; the schema sidecar must keep the dir readable — found by the
    long-haul soak: a doc-tree view over an initially-empty dim table
    crashed every subsequent read with UNABLE_TO_INFER_SCHEMA."""
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    st.write("s", _rows(spark, []), ["k"])
    got = st.read("s")
    assert got is not None and got.count() == 0
    assert set(got.columns) == {"k", "payload", "__mult"}
    keys = spark.createDataFrame([(1,)], "k bigint")
    assert st.read_for_keys("s", keys, ["k"]).count() == 0
    # and the state grows normally afterwards
    st.merge_for_keys("s", keys, _rows(spark, [(1, "a", 1)]), ["k"])
    assert {(r.k, r.payload) for r in st.read("s").collect()} == {(1, "a")}


def test_merge_emptying_every_bucket_remains_readable(spark, tmp_path):
    """Deleting the last rows of every bucket leaves a file-less dir;
    reads must still serve the empty state with its schema."""
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    st.write("s", _rows(spark, [(1, "a", 1), (2, "b", 1)]), ["k"])
    keys = spark.createDataFrame([(1,), (2,)], "k bigint")
    st.merge_for_keys("s", keys, _rows(spark, []), ["k"])
    got = st.read("s")
    assert got is not None and got.count() == 0
    assert set(got.columns) == {"k", "payload", "__mult"}


def test_read_for_keys_partition_prunes_in_the_plan(spark, tmp_path):
    """The store's central scale claim — per-batch reads touch only the
    batch's buckets — must be visible in the physical plan as a
    PartitionFilter on __bucket, not a post-scan filter (which would
    read every bucket's files and filter rows afterwards)."""
    st = KeyedStateStore(spark, str(tmp_path), n_buckets=8)
    df = spark.createDataFrame(
        [(i, "x", 1) for i in range(100)], SCHEMA
    )
    st.write("s", df, ["k"])
    keys = spark.createDataFrame([(5,)], "k bigint")
    plan = st.read_for_keys("s", keys, ["k"])._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "__bucket" in m.group(1) and "=" in m.group(1), plan


def test_small_adaptive_state_skips_bucket_collect(spark, tmp_path):
    """Optimization r07: adaptive-geometry (n_buckets=None) states below
    the prune threshold serve read_for_keys as a full read — no
    bucket-id collect job — and merge across their whole bucket grid.
    Results must be identical to the pruned path."""
    st = KeyedStateStore(spark, str(tmp_path))  # adaptive geometry
    st.write("s", _rows(spark, [(i, f"p{i}", 1) for i in range(50)]), ["k"])
    assert not st.prunable("s")  # tiny state → fast path
    keys = spark.createDataFrame([(7,), (42,)], "k bigint")
    got = st.read_for_keys("s", keys, ["k"])
    ks = {r.k for r in got.collect()}
    assert {7, 42} <= ks  # still the promised superset
    # merge replaces touched keys only, same as the pruned path
    st.merge_for_keys("s", keys, _rows(spark, [(7, "NEW", 9)]), ["k"])
    after = {r.k: r.payload for r in st.read("s").collect()}
    assert after[7] == "NEW" and 42 not in after and len(after) == 49


def test_small_adaptive_state_prunes_again_above_threshold(spark, tmp_path, monkeypatch):
    """Force the threshold to zero: the same adaptive store must route
    through the pruned path (scale behavior unchanged at size)."""
    monkeypatch.setattr(KeyedStateStore, "_PRUNE_MIN_BYTES", 0)
    st = KeyedStateStore(spark, str(tmp_path))
    st.write("s", _rows(spark, [(i, f"p{i}", 1) for i in range(50)]), ["k"])
    assert st.prunable("s")
    keys = spark.createDataFrame([(7,), (42,)], "k bigint")
    ks = {r.k for r in st.read_for_keys("s", keys, ["k"]).collect()}
    assert {7, 42} <= ks and len(ks) < 50  # pruned superset


def test_merge_into_empty_adaptive_state_writes_new_rows(spark, tmp_path):
    """The fast path's bucket list must cover the delta keys' target
    buckets even when every bucket dir is empty (all_buckets = the full
    geometry range, not the existing dirs)."""
    st = KeyedStateStore(spark, str(tmp_path))
    st.write("s", _rows(spark, [(1, "a", 1)]), ["k"])
    keys1 = spark.createDataFrame([(1,)], "k bigint")
    st.merge_for_keys("s", keys1, _rows(spark, []), ["k"])  # empty the state
    assert st.read("s").count() == 0
    keys2 = spark.createDataFrame([(2,), (3,)], "k bigint")
    st.merge_for_keys("s", keys2, _rows(spark, [(2, "b", 1), (3, "c", 1)]), ["k"])
    got = {r.k: r.payload for r in st.read("s").collect()}
    assert got == {2: "b", 3: "c"}
