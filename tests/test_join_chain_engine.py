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


def _agg_view(having=None):
    def recompute(spark):
        j = (
            spark.table("jc_sales")
            .join(spark.table("jc_dims"), "region")
            .join(spark.table("jc_org"), "mgr")
        )
        g = j.groupBy("dept").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("amount").cast("decimal(18,2)")).cast("double").alias("sum_amt"),
        )
        if having:
            g = g.where(F.expr(having))
        return g.select(
            F.col("dept").alias("k"),
            F.struct("dept", "n_rows", "sum_amt").alias("doc"),
        )

    return ViewDef(
        name="jca_view",
        fn=recompute,
        deps={"jc_sales", "jc_dims", "jc_org"},
        joinchain=JoinChainViewSpec(
            tables=["jc_sales", "jc_dims", "jc_org"],
            ons=[["region"], ["mgr"]],
            row_schemas=[SALES_SCHEMA, DIMS_SCHEMA, ORG_SCHEMA],
            keys=["dept"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            having=having,
        ),
    )


def test_agg_mode_folds_on_each_table(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_agg_view()], sink, SnapshotStore(spark, str(tmp_path / "s")))
    _tables(spark, BASE_SALES, BASE_DIMS, BASE_ORG)
    eng.backfill()
    assert sink.get("jca_view", "eng") == {"dept": "eng", "n_rows": 1, "sum_amt": 10.0}
    # left-end insert folds into the group total
    _tables(spark, BASE_SALES + [("3", "eu", 7.5)], BASE_DIMS, BASE_ORG)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "jc_sales", "INSERT", {"id": "3", "region": "eu", "amount": 7.5}, None),
    ]))
    assert eng.last_stats["jca_view"].get("join_chain") == 1
    assert sink.get("jca_view", "eng") == {"dept": "eng", "n_rows": 2, "sum_amt": 17.5}
    # right-end delete retracts the whole group (last join path broke)
    _tables(spark, BASE_SALES + [("3", "eu", 7.5)], BASE_DIMS, [("ada", "eng")])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "jc_org", "DELETE", None, {"mgr": "bob", "dept": "ops"}),
    ]))
    assert eng.last_stats["jca_view"].get("join_chain") == 1
    assert sink.get("jca_view", "ops") is None
    assert ("jca_view", "delete", "ops") in sink.action_log
    # middle-table re-parent MOVES rows across groups: ops gains eu's
    # rows (bob now owns eu and has an org row again)
    _tables(
        spark,
        BASE_SALES + [("3", "eu", 7.5)],
        [("eu", "bob"), ("us", "bob")],
        [("ada", "eng"), ("bob", "ops")],
    )
    eng.process_cdc_batch(_cdc(spark, [
        (3, "jc_org", "INSERT", {"mgr": "bob", "dept": "ops"}, None),
        (4, "jc_dims", "UPDATE", {"region": "eu", "mgr": "bob"}, {"region": "eu", "mgr": "ada"}),
    ]))
    assert eng.last_stats["jca_view"].get("join_chain") == 1
    assert sink.get("jca_view", "eng") is None
    assert sink.get("jca_view", "ops") == {"dept": "ops", "n_rows": 3, "sum_amt": 22.5}


def test_agg_mode_having_boundary(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(
        spark, [_agg_view(having="sum_amt > 8.0")], sink,
        SnapshotStore(spark, str(tmp_path / "s")),
    )
    _tables(spark, BASE_SALES, BASE_DIMS, BASE_ORG)
    eng.backfill()
    assert sink.get("jca_view", "eng") is not None  # 10.0 > 8
    assert sink.get("jca_view", "ops") is None      # 5.0 fails
    # ops crosses INTO the served set
    _tables(spark, BASE_SALES + [("3", "us", 4.0)], BASE_DIMS, BASE_ORG)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "jc_sales", "INSERT", {"id": "3", "region": "us", "amount": 4.0}, None),
    ]))
    assert eng.last_stats["jca_view"].get("join_chain") == 1
    assert sink.get("jca_view", "ops") == {"dept": "ops", "n_rows": 2, "sum_amt": 9.0}
    # eng crosses OUT (delete drops it to 0 rows → retract)
    _tables(spark, [("2", "us", 5.0), ("3", "us", 4.0)], BASE_DIMS, BASE_ORG)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "jc_sales", "DELETE", None, {"id": "1", "region": "eu", "amount": 10.0}),
    ]))
    assert eng.last_stats["jca_view"].get("join_chain") == 1
    assert sink.get("jca_view", "eng") is None


SITE_SCHEMA = "dept string, site string"


def test_four_table_chain(spark, tmp_path):
    """n=4 exercises the cascade loop more than once: a mutation at
    every arity in ONE batch must net correctly through three stages."""
    def recompute(spark):
        j = (
            spark.table("jc_sales")
            .join(spark.table("jc_dims"), "region")
            .join(spark.table("jc_org"), "mgr")
            .join(spark.table("jc_site"), "dept")
        )
        g = j.groupBy("id", "region", "amount", "mgr", "dept", "site").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )
        return g.select(
            F.col("id").alias("k"),
            F.struct("id", "region", "amount", "mgr", "dept", "site", "n_rows").alias("doc"),
        )

    view = ViewDef(
        name="jc4_view",
        fn=recompute,
        deps={"jc_sales", "jc_dims", "jc_org", "jc_site"},
        joinchain=JoinChainViewSpec(
            tables=["jc_sales", "jc_dims", "jc_org", "jc_site"],
            ons=[["region"], ["mgr"], ["dept"]],
            row_schemas=[SALES_SCHEMA, DIMS_SCHEMA, ORG_SCHEMA, SITE_SCHEMA],
            key_cols=["id"],
        ),
    )
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    sites = [("eng", "sfo"), ("ops", "nyc")]
    _tables(spark, BASE_SALES, BASE_DIMS, BASE_ORG)
    spark.createDataFrame(sites, SITE_SCHEMA).createOrReplaceTempView("jc_site")
    eng.backfill()
    assert sink.get("jc4_view", "1")["site"] == "sfo"
    assert sink.get("jc4_view", "2")["site"] == "nyc"
    # one batch: sales insert (stage 1), org re-dept (stage 3),
    # site delete (stage 4) — eu docs re-site to nyc... except nyc's
    # site row is deleted, so eu docs retract; '3' joins through? no —
    # ada moves to ops whose site row is deleted too. Keep it concrete:
    #   ada: eng→ops  (eu docs now need site of ops = nyc)
    #   delete ("ops","nyc")  (ops has no site → eu docs retract)
    #   insert sales ("3","us",2.0) (us → bob → ops → retracted too)
    _tables(
        spark,
        BASE_SALES + [("3", "us", 2.0)],
        BASE_DIMS,
        [("ada", "ops"), ("bob", "ops")],
    )
    spark.createDataFrame([("eng", "sfo")], SITE_SCHEMA).createOrReplaceTempView("jc_site")
    eng.process_cdc_batch(_cdc(spark, [
        (1, "jc_sales", "INSERT", {"id": "3", "region": "us", "amount": 2.0}, None),
        (2, "jc_org", "UPDATE", {"mgr": "ada", "dept": "ops"}, {"mgr": "ada", "dept": "eng"}),
        (3, "jc_site", "DELETE", None, {"dept": "ops", "site": "nyc"}),
    ]))
    assert eng.last_stats["jc4_view"].get("join_chain") == 1
    assert sink.get("jc4_view", "1") is None
    assert sink.get("jc4_view", "2") is None
    assert sink.get("jc4_view", "3") is None
    # restore a site for ops: every doc reappears through the new path
    spark.createDataFrame(
        [("eng", "sfo"), ("ops", "den")], SITE_SCHEMA
    ).createOrReplaceTempView("jc_site")
    eng.process_cdc_batch(_cdc(spark, [
        (4, "jc_site", "INSERT", {"dept": "ops", "site": "den"}, None),
    ]))
    assert eng.last_stats["jc4_view"].get("join_chain") == 1
    assert sink.get("jc4_view", "1")["site"] == "den"
    assert sink.get("jc4_view", "2")["site"] == "den"
    assert sink.get("jc4_view", "3")["site"] == "den"


def test_spec_mode_validation():
    with pytest.raises(ValueError, match="exactly one of"):
        JoinChainViewSpec(
            tables=["a", "b"], ons=[["k"]], row_schemas=["k int", "k int"],
        )
    with pytest.raises(ValueError, match="exactly one of"):
        JoinChainViewSpec(
            tables=["a", "b"], ons=[["k"]], row_schemas=["k int", "k int"],
            key_cols=["k"], keys=["k"],
        )
    with pytest.raises(ValueError, match="aggregate mode"):
        JoinChainViewSpec(
            tables=["a", "b"], ons=[["k"]], row_schemas=["k int", "k int"],
            key_cols=["k"], having="n_rows > 1",
        )


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
