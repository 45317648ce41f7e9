"""Every-N-epochs maintenance policy: snapshot-version vacuum +
keyed-lane-state bucket compaction wired into SyncEngine
(runner.maintain, maintenance.MaintenancePolicy).

What must hold for a month-long CDC stream:
- store versions (view snapshots AND the per-batch lane markers) stay
  bounded — vacuum keeps the newest ``keep_versions``;
- fragmented lane-state buckets compact back to one file without
  changing rows, and the replay-guard marker is refreshed so the
  compaction's version bump is NOT mistaken for a torn fold (the
  vacuum-under-reader discipline of test_manifest_store.py, extended
  to lane states);
- a genuinely torn state is NOT compacted (marker rewrite would mask
  the tear — the lane fallback must repair it first).

The nested-doc lane drives the marker tests because it is the lane
whose states live in the key-local store (runner._write_nested_doc
states → KeyedStateStore); the churn soak uses the same lane so both
growth surfaces (store versions, keyed buckets) are exercised.
"""

from __future__ import annotations

import json
import logging
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.maintenance import MaintenancePolicy
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.state_keyed import KeyedStateStore
from sinker_spark.views import NestedDocViewSpec, ViewDef

ORDERS_SCHEMA = "okey string, cust string"
LINES_SCHEMA = "okey string, line bigint, qty double"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _fragment_one_bucket(state_root: str, name: str) -> int:
    """Split one bucket's single parquet file into two (same rows) —
    the fragmentation AQE skew splits produce. Returns the bucket id."""
    p = os.path.join(state_root, name)
    for d in sorted(os.listdir(p)):
        if not d.startswith("__bucket="):
            continue
        bdir = os.path.join(p, d)
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        if not files:
            continue
        t = pq.read_table(os.path.join(bdir, files[0]))
        if t.num_rows < 2:
            continue
        n = t.num_rows // 2
        pq.write_table(t.slice(0, n), os.path.join(bdir, "part-frag-a.parquet"))
        pq.write_table(t.slice(n), os.path.join(bdir, "part-frag-b.parquet"))
        os.remove(os.path.join(bdir, files[0]))
        return int(d.split("=", 1)[1])
    raise AssertionError(f"no bucket with >=2 rows under {p}")


def test_keyed_compact_preserves_rows(spark, tmp_path):
    store = KeyedStateStore(spark, str(tmp_path), n_buckets=4)
    df = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(40)], "k string, v double"
    )
    store.write("st", df, ["k"])
    assert store.compact("st", max_files_per_bucket=1) == []  # already tight
    b = _fragment_one_bucket(str(tmp_path), "st")
    assert store.bucket_file_counts("st")[b] == 2
    v_before = store.current_version("st")
    assert store.compact("st", max_files_per_bucket=1) == [b]
    assert store.bucket_file_counts("st")[b] == 1
    assert store.current_version("st") > v_before  # destructive → bumped
    got = {(r["k"], r["v"]) for r in store.read("st").collect()}
    assert got == {(f"k{i}", float(i)) for i in range(40)}


def _view():
    def recompute(spark):
        c = spark.table("mt_lines")
        pair = F.struct(
            F.col("line").alias("__o0"),
            F.col("qty").alias("__o1"),
            F.struct("line", "qty").alias("__c"),
        )
        arrays = c.groupBy("okey").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("lines")
        )
        out = spark.table("mt_orders").join(arrays, "okey", "left")
        arr_type = out.schema["lines"].dataType
        out = out.withColumn("lines", F.coalesce(F.col("lines"), F.array().cast(arr_type)))
        return out.select(
            F.col("okey").alias("k"),
            F.struct("okey", "cust", "lines").alias("doc"),
        )

    return ViewDef(
        name="mt_view",
        fn=recompute,
        deps={"mt_orders", "mt_lines"},
        nesteddoc=NestedDocViewSpec(
            parent_table="mt_orders",
            child_table="mt_lines",
            on=["okey"],
            row_schema_parent=ORDERS_SCHEMA,
            row_schema_child=LINES_SCHEMA,
            child_alias="lines",
        ),
    )


def _tables(spark, orders, lines):
    spark.createDataFrame(orders, ORDERS_SCHEMA).createOrReplaceTempView("mt_orders")
    spark.createDataFrame(lines, LINES_SCHEMA).createOrReplaceTempView("mt_lines")


def _line_insert(spark, lines, lsn, okey, line_no, qty):
    lines.append((okey, line_no, qty))
    _tables(spark, ORDERS, lines)
    return spark.createDataFrame(
        [(lsn, "public", "mt_lines", "INSERT", okey,
          json.dumps({"okey": okey, "line": line_no, "qty": qty}), None)],
        CDC_COLS,
    )


ORDERS = [("o1", "alice"), ("o2", "bob"), ("o3", "carol")]
BASE_LINES = [("o1", 1, 3.0), ("o1", 2, 5.0), ("o2", 1, 7.0), ("o3", 1, 2.0)]


def _check_docs(sink, lines):
    by_parent: dict[str, list] = {o: [] for o, _ in ORDERS}
    for okey, line_no, qty in lines:
        by_parent[okey].append({"line": line_no, "qty": qty})
    for okey, _cust in ORDERS:
        doc = sink.get("mt_view", okey)
        assert doc["lines"] == sorted(
            by_parent[okey], key=lambda x: (x["line"], x["qty"])
        ), okey


def test_maintain_compacts_and_refreshes_marker(spark, tmp_path, caplog):
    lines = list(BASE_LINES)
    _tables(spark, ORDERS, lines)
    sink = InMemorySink()
    eng = SyncEngine(
        spark, [_view()], sink, SnapshotStore(spark, str(tmp_path)),
        maintenance=MaintenancePolicy(every_n_epochs=1000,  # manual sweeps only
                                      max_files_per_bucket=1),
    )
    eng.backfill()
    eng.process_cdc_batch(_line_insert(spark, lines, 1, "o2", 2, 4.0), epoch_id=1)
    assert eng.last_stats["mt_view"].get("nested_doc") == 1

    _fragment_one_bucket(str(tmp_path / "__keyed_lane_state"), "mt_view__nd_c_state")
    report = eng.maintain()
    assert report["compacted"].get("mt_view", 0) >= 1

    # the next fold must continue on the lane (marker refreshed, no
    # spurious torn-state fallback) and still match truth
    with caplog.at_level(logging.WARNING, logger="sinker_spark.runner"):
        eng.process_cdc_batch(_line_insert(spark, lines, 2, "o1", 3, 9.0), epoch_id=2)
    assert eng.last_stats["mt_view"].get("nested_doc") == 1
    assert "torn" not in caplog.text
    _check_docs(sink, lines)


def test_maintain_skips_genuinely_torn_state(spark, tmp_path):
    lines = list(BASE_LINES)
    _tables(spark, ORDERS, lines)
    sink = InMemorySink()
    eng = SyncEngine(
        spark, [_view()], sink, SnapshotStore(spark, str(tmp_path)),
        maintenance=MaintenancePolicy(every_n_epochs=1000, max_files_per_bucket=1),
    )
    eng.backfill()
    eng.process_cdc_batch(_line_insert(spark, lines, 1, "o1", 3, 1.0), epoch_id=1)

    # simulate a crash inside a fold's destructive window: version bumped
    # past the marker's recorded one
    eng.keyed._bump("mt_view__nd_c_state")
    _fragment_one_bucket(str(tmp_path / "__keyed_lane_state"), "mt_view__nd_c_state")
    report = eng.maintain()
    assert report["compacted"] == {}  # torn view skipped — tear not masked

    # the tear is still detected by the next batch → fallback repairs
    eng.process_cdc_batch(_line_insert(spark, lines, 2, "o2", 2, 2.0), epoch_id=2)
    assert "lane_fallback" in eng.last_stats["mt_view"]
    _check_docs(sink, lines)


def _count_files(root: str) -> int:
    n = 0
    for _d, _dirs, files in os.walk(root):
        n += sum(1 for f in files if not f.startswith(".") and f != "_SUCCESS")
    return n


def test_churn_soak_bounded_state_growth(spark, tmp_path):
    """200-batch churn under an every-16-epochs policy: store versions
    and total file count must be BOUNDED (the sweep keeps up with
    growth), not monotonically increasing — the difference between an
    engine that can run for a month and one that fills the lake with
    tombstoned versions. SINKER_MAINT_SOAK_BATCHES overrides the batch
    count for extended runs."""
    n_batches = int(os.environ.get("SINKER_MAINT_SOAK_BATCHES", "200"))
    lines = list(BASE_LINES)
    _tables(spark, ORDERS, lines)
    sink = InMemorySink()
    eng = SyncEngine(
        spark, [_view()], sink, SnapshotStore(spark, str(tmp_path)),
        maintenance=MaintenancePolicy(every_n_epochs=16, keep_versions=2,
                                      max_files_per_bucket=2),
    )
    eng.backfill()

    counts_at: dict[int, int] = {}
    next_line = 10
    for b in range(1, n_batches + 1):
        okey = ("o1", "o2", "o3")[b % 3]
        eng.process_cdc_batch(
            _line_insert(spark, lines, b, okey, next_line, float(b % 17)), epoch_id=b
        )
        next_line += 1
        if b in (n_batches // 2, n_batches):
            counts_at[b] = _count_files(str(tmp_path))

    # versions bounded: every store relation holds ≤ keep_versions +
    # every_n_epochs dirs (worst case: a full window of growth since the
    # last sweep), never O(n_batches)
    for name in os.listdir(tmp_path):
        d = os.path.join(tmp_path, name)
        if not os.path.isdir(d) or name.startswith("__keyed"):
            continue
        n_versions = sum(1 for v in os.listdir(d) if v.startswith("v_"))
        assert n_versions <= 2 + 16, f"{name}: {n_versions} versions survived vacuum"

    # file count FLAT between mid-soak and end (within one sweep window
    # of jitter), i.e. growth is reclaimed, not accumulated
    mid, end = counts_at[n_batches // 2], counts_at[n_batches]
    assert end <= mid * 1.5 + 40, f"file count grew {mid} -> {end}"

    _check_docs(sink, lines)
