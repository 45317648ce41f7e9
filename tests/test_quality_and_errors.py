"""Data-quality invariants, exception propagation parity (reference
test_e2e.py:35-57: failures must surface, not be swallowed), and the
streaming fast lane (route_actions through an actual streaming query)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from sinker_spark.quality import duplicate_keys, null_violations, orphan_foreign_keys


def test_quality_checks(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", None)], "k string, v int")
    dups = duplicate_keys(df, "k").collect()
    assert [(r["k"], r["n"]) for r in dups] == [("a", 2)]
    assert null_violations(df, ["v"]).count() == 1
    parent = spark.createDataFrame([("a",)], "pk string")
    orphans = orphan_foreign_keys(df, parent, "k", "pk")
    assert {r["k"] for r in orphans.collect()} == {"b"}


def test_refresh_error_propagates(spark, tmp_path):
    """Reference parity (test_e2e.py:35-46): a broken view errors the
    refresh call — not silently consumed."""
    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.views import ViewDef

    broken = ViewDef(
        "broken_mv",
        sql="select id, json_build_object('x', x) as doc from this_table_does_not_exist",
    )
    eng = SyncEngine(spark, [broken], InMemorySink(), SnapshotStore(spark, str(tmp_path)))
    with pytest.raises(AnalysisException):
        eng.backfill()
    batch = spark.createDataFrame(
        [(1, "public", "this_table_does_not_exist", "INSERT", "x", None)],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )
    with pytest.raises(AnalysisException):
        eng.process_cdc_batch(batch)


def test_streaming_fast_lane_route_actions(spark, tmp_path):
    """Slot-replay lane under Structured Streaming: MV INSERT records
    carrying materialized docs flow straight to the sink without view
    recomputation (the reference's normal mode, bulk_action_generator)."""
    from sinker_spark.cdc import parse_test_decoding
    from sinker_spark.runner import route_actions
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.sources.files import stream_cdc_text

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    (cdc_dir / "a.txt").write_text(
        "1\ttable sinker.person_mv: INSERT: id[text]:'p-1' doc[json]:'{\"name\" : \"John\"}'\n"
        "2\ttable sinker.person_mv: INSERT: id[text]:'p-1' doc[json]:'{\"name\" : \"Jane\"}'\n"
        "3\ttable public.person: DELETE: id[text]:'p-9'\n"
    )
    sink = InMemorySink()

    def handle(batch_df, epoch_id):
        acts = route_actions(batch_df, {"person_mv": "people"}, {"person": "people"})
        for index in [r["index"] for r in acts.select("index").distinct().collect()]:
            sink.apply_actions(index, acts.where(F.col("index") == index).select("id", "op", "doc"))

    stream = parse_test_decoding(stream_cdc_text(spark, str(cdc_dir)))
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last-write-wins within the batch; delete for a non-existent id is a no-op
    assert sink.get("people", "p-1") == {"name": "Jane"}
    assert ("people", "delete", "p-9") in sink.action_log


def test_observed_metrics_piggyback_on_action(spark):
    """quality.observed: metrics accumulate during the consuming action —
    no second scan — and report rows + null keys."""
    from sinker_spark.quality import observed

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("c", 3.0)], "id string, v double"
    )
    out, obs = observed(df, "write_metrics", key="id")
    assert out.count() == 3  # the action that drives the metrics
    assert obs.get == {"n_rows": 3, "null_keys": 1}


def test_expectations_single_scan_and_violations(spark):
    """The expectation suite must (a) count violations correctly and
    (b) compile every check into ONE aggregation over one scan."""
    from sinker_spark.quality import expectations

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 0.0, "X"), (4, 2.0, None)],
        "id bigint, price double, status string",
    )
    out = {r["check"]: r for r in expectations(df, {
        "price_positive": F.col("price") > 0,
        "status_in_domain": F.col("status").isin("O", "F", "P"),
        "status_not_null": F.col("status").isNotNull(),
    }).collect()}
    assert out["price_positive"]["n_violations"] == 2      # -5.0 and 0.0
    assert out["status_in_domain"]["n_violations"] == 2    # 'X' and NULL
    assert out["status_not_null"]["n_violations"] == 1
    assert not out["price_positive"]["passed"]
    # single aggregation: the plan scans the relation once
    plan = expectations(df, {"a": F.col("price") > 0, "b": F.col("status").isNotNull()})
    n_scans = plan._jdf.queryExecution().optimizedPlan().toString().count("LogicalRDD")
    assert n_scans <= 2  # one per union branch pair off a shared aggregate
