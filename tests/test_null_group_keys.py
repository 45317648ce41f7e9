"""NULL group/join keys through the SyncEngine delta lanes.

SQL GROUP BY treats NULL as its own group and join equality never
matches NULL — the reference inherits both from Postgres for free
(its views ARE Postgres queries). The delta lanes fold through
groupBy (NULL-correct by construction) but every serve/dirty join on
the group keys was plain (null-unsafe) equality: a NULL-keyed group
could never reach the upsert set and emitted spurious deletes, top-k
NULL groups duplicated rows between the touched and untouched
branches, and a NULL-join-key left row's pad was dropped outright.
These tests pin the fixed behavior end-to-end per lane.

Doc ids: the engine emits concat_ws('|', keys) ids for lane views and
concat_ws drops NULLs, so a single NULL group key serves id '' — the
recompute fns here build ids the same way, as every lane view must.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import (
    AggViewSpec,
    DistinctViewSpec,
    JoinViewSpec,
    TopKViewSpec,
    ViewDef,
)

SALES_SCHEMA = "id string, region string, amount double"
ORD_SCHEMA = "oid string, region string"
DIM_SCHEMA = "region string, mgr string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _cdc(spark, records):
    """records: (lsn, table, op, after|None, before|None)."""
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("id", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


# -- delta-aggregate lane -------------------------------------------------


def _agg_view(maxes=None):
    def recompute(spark):
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).cast("double").alias("sum_amt"),
        ]
        if maxes:
            aggs.append(F.max("amount").cast("double").alias("max_amt"))
        df = spark.table("nsales").groupBy("region").agg(*aggs)
        fields = ["region", "n_rows", "sum_amt"] + (["max_amt"] if maxes else [])
        return df.select(
            F.concat_ws("|", F.col("region")).alias("id"),
            F.struct(*fields).alias("doc"),
        )

    return ViewDef(
        name="nsales_by_region",
        fn=recompute,
        deps={"nsales"},
        agg=AggViewSpec(
            table="nsales",
            keys=["region"],
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            maxes=maxes or {},
            row_schema=SALES_SCHEMA,
        ),
    )


def test_agg_lane_null_group_upserts_and_retracts(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_agg_view()], sink, SnapshotStore(spark, str(tmp_path / "s")))
    spark.createDataFrame(
        [("1", None, 10.0), ("2", "eu", 5.0)], SALES_SCHEMA
    ).createOrReplaceTempView("nsales")
    eng.process_cdc_batch(
        _cdc(spark, [(1, "nsales", "INSERT", {"id": "3", "region": None, "amount": 2.0}, None)])
    )
    assert eng.last_stats["nsales_by_region"].get("delta_agg") == 1
    assert sink.get("nsales_by_region", "") == {
        "region": None, "n_rows": 2, "sum_amt": 12.0,
    }
    # delete the NULL group's rows: its doc must retract (count -> 0)
    eng.process_cdc_batch(_cdc(spark, [
        (2, "nsales", "DELETE", None, {"id": "1", "region": None, "amount": 10.0}),
        (3, "nsales", "DELETE", None, {"id": "3", "region": None, "amount": 2.0}),
    ]))
    assert eng.last_stats["nsales_by_region"].get("delta_agg") == 1
    assert sink.get("nsales_by_region", "") is None
    # the eu group was never touched by either batch
    assert all(key != "eu" for _, _, key in sink.action_log)


def test_agg_lane_null_group_max_heal_on_extreme_delete(spark, tmp_path):
    """Deleting the NULL group's max must flag it dirty (null-safe
    dirty-detection join) and heal via the key-scoped recompute (null-
    safe semi against the fact table)."""
    sink = InMemorySink()
    view = _agg_view(maxes={"max_amt": "amount"})
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    spark.createDataFrame(
        [("1", None, 10.0), ("2", None, 7.0), ("3", "eu", 5.0)], SALES_SCHEMA
    ).createOrReplaceTempView("nsales")
    eng.backfill()  # seed lane state at the snapshot point
    # the heal scan reads the live table, so it must reflect the batch
    spark.createDataFrame(
        [("2", None, 7.0), ("3", "eu", 5.0)], SALES_SCHEMA
    ).createOrReplaceTempView("nsales")
    eng.process_cdc_batch(
        _cdc(spark, [(1, "nsales", "DELETE", None, {"id": "1", "region": None, "amount": 10.0})])
    )
    assert eng.last_stats["nsales_by_region"].get("delta_agg") == 1
    assert sink.get("nsales_by_region", "") == {
        "region": None, "n_rows": 1, "sum_amt": 7.0, "max_amt": 7.0,
    }


# -- top-k lane -----------------------------------------------------------


def test_topk_lane_null_group_folds_and_heals(spark, tmp_path):
    def recompute(spark):
        from sinker_spark.ivm_topk import initial_topk_state, topk_view

        rows, _ = initial_topk_state(spark.table("nscores"), ["game"], "score", "player", 2, 1)
        served = topk_view(rows, ["game"], "score", "player", 2)
        docs = served.groupBy("game").agg(
            F.sort_array(F.collect_list(F.struct("rank", "player", "score"))).alias("top")
        )
        return docs.select(
            F.concat_ws("|", F.col("game")).alias("id"), F.struct("game", "top").alias("doc")
        )

    view = ViewDef(
        name="nleaderboard",
        fn=recompute,
        deps={"nscores"},
        topk=TopKViewSpec(
            table="nscores", keys=["game"], order_col="score", id_col="player",
            k=2, buffer=1, row_schema="game string, player string, score bigint",
        ),
    )
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    base = [(None, "p1", 100), (None, "p2", 90), (None, "p3", 80), (None, "p4", 70), ("go", "q1", 50)]
    spark.createDataFrame(base, "game string, player string, score bigint").createOrReplaceTempView("nscores")
    # insert into the NULL group: re-ranks only that group
    eng.process_cdc_batch(
        _cdc(spark, [(1, "nscores", "INSERT", {"id": "x", "game": None, "player": "p0", "score": 95}, None)])
    )
    assert eng.last_stats["nleaderboard"].get("topk") == 1
    doc = sink.get("nleaderboard", "")
    assert [r["player"] for r in doc["top"]] == ["p1", "p0"]
    # delete past the buffer: NULL group must heal via the scoped recompute
    spark.createDataFrame(
        [(None, "p3", 80), (None, "p4", 70), ("go", "q1", 50)],
        "game string, player string, score bigint",
    ).createOrReplaceTempView("nscores")
    eng.process_cdc_batch(_cdc(spark, [
        (2, "nscores", "DELETE", None, {"id": "a", "game": None, "player": "p1", "score": 100}),
        (3, "nscores", "DELETE", None, {"id": "b", "game": None, "player": "p0", "score": 95}),
        (4, "nscores", "DELETE", None, {"id": "c", "game": None, "player": "p2", "score": 90}),
    ]))
    doc = sink.get("nleaderboard", "")
    assert [r["player"] for r in doc["top"]] == ["p3", "p4"]


# -- exact-distinct lane --------------------------------------------------


def test_exact_distinct_lane_null_group(spark, tmp_path):
    def recompute(spark):
        served = spark.table("nvisits").groupBy("region").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col("user_id")).cast("bigint").alias("n_distinct"),
        )
        return served.select(
            F.concat_ws("|", F.col("region")).alias("id"),
            F.struct("region", "n_rows", "n_distinct").alias("doc"),
        )

    view = ViewDef(
        name="nvisitors",
        fn=recompute,
        deps={"nvisits"},
        distinct=DistinctViewSpec(
            table="nvisits", keys=["region"], value_col="user_id",
            row_schema="id string, region string, user_id string", exact=True,
        ),
    )
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    spark.createDataFrame(
        [("1", None, "u1"), ("2", None, "u1"), ("3", "eu", "u2")],
        "id string, region string, user_id string",
    ).createOrReplaceTempView("nvisits")
    eng.process_cdc_batch(
        _cdc(spark, [(1, "nvisits", "INSERT", {"id": "4", "region": None, "user_id": "u9"}, None)])
    )
    assert eng.last_stats["nvisitors"].get("exact_distinct") == 1
    assert sink.get("nvisitors", "") == {"region": None, "n_rows": 3, "n_distinct": 2}


# -- HLL approximate-distinct lane ----------------------------------------


def test_hll_lane_null_group_estimates_not_zero(spark, tmp_path):
    """hll_estimate's register spine joins state BY GROUP KEY — that
    join must be null-safe or a populated NULL group reads all-empty
    registers and serves estimate 0 (the exact bug class the serve
    joins had). NULL *values* must still be ignored, per
    COUNT(DISTINCT x)."""
    from sinker_spark import ivm_hll

    fact = spark.createDataFrame(
        [(None, f"u{i}") for i in range(60)]
        + [("eu", f"u{i}") for i in range(40)]
        + [(None, None)],  # NULL value: never a distinct count member
        "region string, user_id string",
    )
    state = ivm_hll.initial_hll_state(fact, ["region"], "user_id")
    est = {
        r["region"]: r["n_distinct_est"]
        for r in ivm_hll.hll_estimate(state, ["region"]).collect()
    }
    assert est["eu"] == pytest.approx(40, rel=0.25)
    assert est[None] == pytest.approx(60, rel=0.25)


def test_hll_engine_lane_null_group(spark, tmp_path):
    def recompute(spark):
        served = spark.table("nhits").groupBy("region").agg(
            F.approx_count_distinct("user_id").cast("double").alias("n_distinct_est")
        )
        return served.select(
            F.concat_ws("|", F.col("region")).alias("id"),
            F.struct("region", "n_distinct_est").alias("doc"),
        )

    view = ViewDef(
        name="nhll",
        fn=recompute,
        deps={"nhits"},
        distinct=DistinctViewSpec(
            table="nhits", keys=["region"], value_col="user_id",
            row_schema="id string, region string, user_id string", exact=False,
        ),
    )
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    spark.createDataFrame(
        [(f"r{i}", None, f"u{i}") for i in range(30)],
        "id string, region string, user_id string",
    ).createOrReplaceTempView("nhits")
    eng.process_cdc_batch(
        _cdc(spark, [(1, "nhits", "INSERT", {"id": "x", "region": None, "user_id": "u99"}, None)])
    )
    assert eng.last_stats["nhll"].get("hll_distinct") == 1
    doc = sink.get("nhll", "")
    assert doc["region"] is None
    assert doc["n_distinct_est"] == pytest.approx(31, rel=0.3)


# -- delta-join lane (left outer, nullable join key) ----------------------


def test_loj_lane_null_join_key_row_stays_padded(spark, tmp_path):
    def recompute(spark):
        dim = spark.table("ndims").withColumn("__matched", F.lit(True))
        j = (
            spark.table("nords")
            .join(dim, "region", "left")
            .withColumn("__matched", F.coalesce(F.col("__matched"), F.lit(False)))
        )
        return j.select(
            F.concat_ws("|", "oid").alias("id"),
            F.struct("region", "oid", "mgr", "__matched", F.lit(1).cast("bigint").alias("n_rows")).alias("doc"),
        )

    view = ViewDef(
        name="nord_docs",
        fn=recompute,
        deps={"nords", "ndims"},
        join=JoinViewSpec(
            table_a="nords", table_b="ndims", on=["region"],
            row_schema_a=ORD_SCHEMA, row_schema_b=DIM_SCHEMA,
            key_cols=["oid"], how="left",
        ),
    )
    sink = InMemorySink()
    eng = SyncEngine(spark, [view], sink, SnapshotStore(spark, str(tmp_path / "s")))
    spark.createDataFrame([("o1", "eu")], ORD_SCHEMA).createOrReplaceTempView("nords")
    spark.createDataFrame([("eu", "ana")], DIM_SCHEMA).createOrReplaceTempView("ndims")
    # NULL-region order arrives: must appear as a padded doc via the lane
    eng.process_cdc_batch(
        _cdc(spark, [(1, "nords", "INSERT", {"oid": "o2", "region": None}, None)])
    )
    assert eng.last_stats["nord_docs"].get("delta_join") == 1
    assert sink.get("nord_docs", "o2") == {
        "region": None, "oid": "o2", "mgr": None, "__matched": False, "n_rows": 1,
    }
    # a dim for some other key must not affect it; a NULL-key dim row
    # must not "match" the NULL-region order either (SQL semantics)
    eng.process_cdc_batch(
        _cdc(spark, [(2, "ndims", "INSERT", {"region": None, "mgr": "zed"}, None)])
    )
    assert sink.get("nord_docs", "o2")["__matched"] is False
    # and deleting the NULL-key order retracts its pad
    eng.process_cdc_batch(
        _cdc(spark, [(3, "nords", "DELETE", None, {"oid": "o2", "region": None})])
    )
    assert sink.get("nord_docs", "o2") is None
