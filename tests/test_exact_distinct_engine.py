"""SyncEngine exact distinct-count lane (DistinctViewSpec(exact=True)):
support-count state makes COUNT(DISTINCT x) fully delete-maintainable —
a value leaves the distinct set exactly when its support reaches 0 and
a group's doc retracts when its last row does — with SQL NULL parity
(NULLs never count toward n_distinct but do keep the group alive),
replay suppression for the signed fold, and authoritative fallback when
before-images are missing. The HLL lane (exact=False) keeps its own
tests in test_hll_distinct_engine.py."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import DistinctViewSpec, ViewDef

ROW_SCHEMA = "id string, region string, user_id bigint"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _fact(spark, rows):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView("dvisits")


def _view():
    def recompute(spark):
        served = (
            spark.table("dvisits")
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_distinct(F.col("user_id")).cast("bigint").alias("n_distinct"),
            )
        )
        return served.select(
            F.col("region").alias("id"),
            F.struct("region", "n_rows", "n_distinct").alias("doc"),
        )

    return ViewDef(
        name="exact_visitors",
        fn=recompute,
        deps={"dvisits"},
        distinct=DistinctViewSpec(
            table="dvisits",
            keys=["region"],
            value_col="user_id",
            row_schema=ROW_SCHEMA,
            exact=True,
        ),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn,
            "public",
            "dvisits",
            op,
            (after or before or {}).get("id", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


@pytest.fixture()
def engine(spark, tmp_path):
    sink = InMemorySink()
    eng = SyncEngine(spark, [_view()], sink, SnapshotStore(spark, str(tmp_path / "snap")))
    return eng, sink


def test_duplicate_vs_new_value_inserts(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10), ("2", "eu", 10), ("3", "eu", 20), ("4", "us", 7)])
    batch = _cdc(spark, [
        # duplicate of an existing value: n_rows +1, n_distinct unchanged
        (1, "INSERT", {"id": "5", "region": "eu", "user_id": 10}, None),
        # genuinely new value: both up
        (2, "INSERT", {"id": "6", "region": "eu", "user_id": 30}, None),
    ])
    eng.process_cdc_batch(batch)
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 5, "n_distinct": 3}
    # untouched group gets no action at all
    assert all(key != "us" for _, _, key in sink.action_log)


def test_delete_folds_support_counts(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10), ("2", "eu", 10), ("3", "eu", 20)])
    # establish state from the snapshot point
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "4", "region": "eu", "user_id": 20}, None),
    ]))
    # poison the fact view: folds must come from stored state only
    _fact(spark, [("9", "zz", 999)])
    # delete ONE support of the duplicated value 10: still present
    eng.process_cdc_batch(_cdc(spark, [
        (2, "DELETE", None, {"id": "1", "region": "eu", "user_id": 10}),
    ]))
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 3, "n_distinct": 2}
    # delete the LAST support of value 10: it leaves the distinct set
    eng.process_cdc_batch(_cdc(spark, [
        (3, "DELETE", None, {"id": "2", "region": "eu", "user_id": 10}),
    ]))
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 1}


def test_group_retracts_when_last_row_leaves(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10), ("2", "us", 7)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "DELETE", None, {"id": "2", "region": "us", "user_id": 7}),
    ]))
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "us") is None
    assert ("exact_visitors", "delete", "us") in sink.action_log


def test_update_moves_value_between_sets(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10), ("2", "eu", 20)])
    eng.process_cdc_batch(_cdc(spark, [
        # value 20 -> 10: distinct shrinks, rows unchanged
        (1, "UPDATE", {"id": "2", "region": "eu", "user_id": 10},
         {"id": "2", "region": "eu", "user_id": 20}),
    ]))
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 1}


def test_null_values_keep_group_alive_but_never_count(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", None), ("2", "eu", 10)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "3", "region": "eu", "user_id": None}, None),
        (2, "DELETE", None, {"id": "2", "region": "eu", "user_id": 10}),
    ]))
    # COUNT(DISTINCT) ignores NULLs; the group survives on NULL-only rows
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 0}


def test_replay_is_suppressed(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10)])
    batch = _cdc(spark, [(1, "INSERT", {"id": "2", "region": "eu", "user_id": 20}, None)])
    eng.process_cdc_batch(batch)
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 2}
    eng.process_cdc_batch(batch)  # at-least-once redelivery of the same lsn
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 2}


def test_missing_before_image_falls_back(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10), ("2", "eu", 20)])
    # fallback recomputes from the fact table, which by the live-table
    # contract already reflects the batch
    _fact(spark, [("1", "eu", 10)])
    eng.process_cdc_batch(_cdc(spark, [(1, "DELETE", None, None)]))
    stats = eng.last_stats["exact_visitors"]
    assert "exact_distinct" not in stats
    assert stats.get("lane_fallback") == 1
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 1, "n_distinct": 1}
    # and the rebuilt state folds the NEXT batch exactly
    _fact(spark, [("1", "eu", 10), ("5", "eu", 50)])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "INSERT", {"id": "5", "region": "eu", "user_id": 50}, None),
    ]))
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 2}


def test_backfill_then_stream(spark, engine):
    eng, sink = engine
    _fact(spark, [("1", "eu", 10), ("2", "us", 7), ("3", "us", 7)])
    eng.backfill()
    assert sink.get("exact_visitors", "us") == {"region": "us", "n_rows": 2, "n_distinct": 1}
    # live-table contract: the fact already reflects the batch; the
    # backfill-seeded state must fold it exactly once
    _fact(spark, [("1", "eu", 10), ("2", "us", 7), ("3", "us", 7), ("4", "us", 9)])
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"id": "4", "region": "us", "user_id": 9}, None),
    ]))
    assert eng.last_stats["exact_visitors"].get("exact_distinct") == 1
    assert sink.get("exact_visitors", "us") == {"region": "us", "n_rows": 3, "n_distinct": 2}
