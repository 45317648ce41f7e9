"""SyncEngine n-way join-chain lane (JoinChainViewSpec): a 3-table
inner chain sales⋈dims⋈org maintained by cascading the bilinear rule
through stored prefix states — inserts/deletes/updates on ANY of the
three tables fold in O(batch), fan-out multiplies correctly through
the cascade, docs retract when any link of the join path breaks, and
the usual lane contracts hold (before-images required, replay
suppressed, fallback authoritative)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import JoinChainViewSpec, ViewDef

SALES_SCHEMA = "id string, region string, amount double"
DIMS_SCHEMA = "region string, mgr string"
ORG_SCHEMA = "mgr string, dept string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _tables(spark, sales, dims, org):
    spark.createDataFrame(sales, SALES_SCHEMA).createOrReplaceTempView("jc_sales")
    spark.createDataFrame(dims, DIMS_SCHEMA).createOrReplaceTempView("jc_dims")
    spark.createDataFrame(org, ORG_SCHEMA).createOrReplaceTempView("jc_org")


def _view():
    def recompute(spark):
        j = (
            spark.table("jc_sales")
            .join(spark.table("jc_dims"), "region")
            .join(spark.table("jc_org"), "mgr")
        )
        # n_rows = the joined row's multiplicity, as the lane serves it
        g = j.groupBy("region", "id", "amount", "mgr", "dept").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )
        return g.select(
            F.col("id").alias("k"),
            F.struct("region", "id", "amount", "mgr", "dept", "n_rows").alias("doc"),
        )

    return ViewDef(
        name="jc_view",
        fn=recompute,
        deps={"jc_sales", "jc_dims", "jc_org"},
        joinchain=JoinChainViewSpec(
            tables=["jc_sales", "jc_dims", "jc_org"],
            ons=[["region"], ["mgr"]],
            row_schemas=[SALES_SCHEMA, DIMS_SCHEMA, ORG_SCHEMA],
            key_cols=["id"],
        ),
    )


def _cdc(spark, records):
    """records: (lsn, table, op, after|None, before|None)."""
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("id", (after or before or {}).get("region", "?")),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


@pytest.fixture()
def engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


BASE_SALES = [("1", "eu", 10.0), ("2", "us", 5.0)]
BASE_DIMS = [("eu", "ada"), ("us", "bob")]
BASE_ORG = [("ada", "eng"), ("bob", "ops")]


def test_fold_on_each_table(spark, engine):
    eng, sink = engine
    _tables(spark, BASE_SALES, BASE_DIMS, BASE_ORG)
    eng.backfill()
    assert sink.get("jc_view", "1") == {
        "region": "eu", "id": "1", "amount": 10.0, "mgr": "ada", "dept": "eng", "n_rows": 1,
    }
    # insert a sales row (left end of the chain)
    _tables(spark, BASE_SALES + [("3", "eu", 7.0)], BASE_DIMS, BASE_ORG)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "jc_sales", "INSERT", {"id": "3", "region": "eu", "amount": 7.0}, None),
    ]))
    assert eng.last_stats["jc_view"].get("join_chain") == 1
    assert sink.get("jc_view", "3")["dept"] == "eng"
    # delete the org row of 'bob' (right end): every us doc loses its path
    _tables(spark, BASE_SALES + [("3", "eu", 7.0)], BASE_DIMS, [("ada", "eng")])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "jc_org", "DELETE", None, {"mgr": "bob", "dept": "ops"}),
    ]))
    assert eng.last_stats["jc_view"].get("join_chain") == 1
    assert sink.get("jc_view", "2") is None
    assert ("jc_view", "delete", "2") in sink.action_log
    # middle-table update re-parents eu to bob: eu docs lose their path
    # (bob has no org row anymore) — the cascade sees both stages
    _tables(spark, BASE_SALES + [("3", "eu", 7.0)], [("eu", "bob"), ("us", "bob")], [("ada", "eng")])
    eng.process_cdc_batch(_cdc(spark, [
        (3, "jc_dims", "UPDATE", {"region": "eu", "mgr": "bob"}, {"region": "eu", "mgr": "ada"}),
    ]))
    assert eng.last_stats["jc_view"].get("join_chain") == 1
    assert sink.get("jc_view", "1") is None
    assert sink.get("jc_view", "3") is None


def test_fanout_multiplies_through_cascade(spark, engine):
    eng, sink = engine
    # duplicate org rows for ada: each eu sales row serves with n_rows=2
    org = [("ada", "eng"), ("ada", "eng"), ("bob", "ops")]
    _tables(spark, BASE_SALES, BASE_DIMS, org)
    eng.backfill()
    assert sink.get("jc_view", "1")["n_rows"] == 2
    # deleting ONE duplicate drops multiplicity to 1, doc stays
    _tables(spark, BASE_SALES, BASE_DIMS, [("ada", "eng"), ("bob", "ops")])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "jc_org", "DELETE", None, {"mgr": "ada", "dept": "eng"}),
    ]))
    assert eng.last_stats["jc_view"].get("join_chain") == 1
    assert sink.get("jc_view", "1")["n_rows"] == 1


def test_replay_suppressed_and_fallback(spark, engine):
    eng, sink = engine
    _tables(spark, BASE_SALES, BASE_DIMS, BASE_ORG)
    eng.backfill()
    batch = _cdc(spark, [
        (1, "jc_sales", "INSERT", {"id": "3", "region": "us", "amount": 1.0}, None),
    ])
    _tables(spark, BASE_SALES + [("3", "us", 1.0)], BASE_DIMS, BASE_ORG)
    eng.process_cdc_batch(batch)
    assert sink.get("jc_view", "3")["n_rows"] == 1
    eng.process_cdc_batch(batch)  # verbatim redelivery
    assert eng.last_stats["jc_view"].get("join_chain") == 1
    assert sink.get("jc_view", "3")["n_rows"] == 1  # not double-applied
    # missing before-image → authoritative fallback, then folds again
    _tables(spark, BASE_SALES + [("3", "us", 1.0)], [("eu", "ada")], BASE_ORG)
    eng.process_cdc_batch(_cdc(spark, [(2, "jc_dims", "DELETE", None, None)]))
    stats = eng.last_stats["jc_view"]
    assert stats.get("lane_fallback") == 1 and "join_chain" not in stats
    assert sink.get("jc_view", "2") is None and sink.get("jc_view", "3") is None
    assert sink.get("jc_view", "1") is not None
    _tables(spark, BASE_SALES + [("3", "us", 1.0), ("4", "eu", 3.0)], [("eu", "ada")], BASE_ORG)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "jc_sales", "INSERT", {"id": "4", "region": "eu", "amount": 3.0}, None),
    ]))
    assert eng.last_stats["jc_view"].get("join_chain") == 1
    assert sink.get("jc_view", "4")["dept"] == "eng"
