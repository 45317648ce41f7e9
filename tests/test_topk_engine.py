"""SyncEngine top-k lane (ivm_topk + runner._topk_refresh): inserts and
buffer-absorbed deletes fold in O(batch); buffer-exhausted groups heal
via the key-scoped recompute; one ranked-array document per touched
group lands in the sink; groups that empty out are deleted; batches
missing before-images fall back to the recompute lane."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import TopKViewSpec, ViewDef

ROW_SCHEMA = "game string, player string, score bigint"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)
K, BUF = 2, 1


def _fact(spark, rows):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView("scores")


def _view():
    def recompute(spark):
        from sinker_spark.ivm_topk import initial_topk_state, topk_view

        rows, _ = initial_topk_state(spark.table("scores"), ["game"], "score", "player", K, BUF)
        served = topk_view(rows, ["game"], "score", "player", K)
        docs = served.groupBy("game").agg(
            F.sort_array(F.collect_list(F.struct("rank", "player", "score"))).alias("top")
        )
        return docs.select(F.col("game").alias("id"), F.struct("game", "top").alias("doc"))

    return ViewDef(
        name="leaderboard",
        fn=recompute,
        deps={"scores"},
        topk=TopKViewSpec(
            table="scores", keys=["game"], order_col="score", id_col="player",
            k=K, buffer=BUF, row_schema=ROW_SCHEMA,
        ),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn,
            "public",
            "scores",
            op,
            (after or before or {}).get("player", "?"),
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


BASE = [
    ("chess", "p1", 100), ("chess", "p2", 90), ("chess", "p3", 80), ("chess", "p4", 70),
    ("go", "q1", 50), ("go", "q2", 40),
]


def _top(sink, game):
    doc = sink.get("leaderboard", game)
    return [(t["rank"], t["player"], t["score"]) for t in doc["top"]]


def test_insert_fold_updates_only_touched_group(spark, engine):
    eng, sink = engine
    _fact(spark, BASE)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "INSERT", {"game": "chess", "player": "p9", "score": 95}, None),
    ]))
    assert eng.last_stats["leaderboard"].get("topk") == 1
    assert eng.last_stats["leaderboard"]["dirty_groups"] == 0
    assert sink.ids("leaderboard") == {"chess"}  # go untouched, unwritten
    assert _top(sink, "chess") == [(1, "p1", 100), (2, "p9", 95)]


def test_delete_within_buffer_then_exhaustion_heals(spark, engine):
    eng, sink = engine
    _fact(spark, BASE)
    # delete p2 (rank 2): buffer row p3 backfills — no dirty group
    eng.process_cdc_batch(_cdc(spark, [
        (1, "DELETE", None, {"game": "chess", "player": "p2", "score": 90}),
    ]))
    assert eng.last_stats["leaderboard"]["dirty_groups"] == 0
    assert _top(sink, "chess") == [(1, "p1", 100), (2, "p3", 80)]

    # now delete p1 and p3: stored set exhausted, p4 must be recovered
    # from the fact table (which, per the lane contract, mirrors the CDC)
    _fact(spark, [r for r in BASE if r[1] not in ("p1", "p2", "p3")])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "DELETE", None, {"game": "chess", "player": "p1", "score": 100}),
        (3, "DELETE", None, {"game": "chess", "player": "p3", "score": 80}),
    ]))
    assert eng.last_stats["leaderboard"]["dirty_groups"] == 1
    assert _top(sink, "chess") == [(1, "p4", 70)]


def test_group_emptying_emits_delete(spark, engine):
    eng, sink = engine
    _fact(spark, BASE)
    eng.process_cdc_batch(_cdc(spark, [(1, "INSERT", {"game": "go", "player": "q9", "score": 1}, None)]))
    assert "go" in sink.ids("leaderboard")
    _fact(spark, [r for r in BASE if r[0] != "go"])
    eng.process_cdc_batch(_cdc(spark, [
        (2, "DELETE", None, {"game": "go", "player": "q1", "score": 50}),
        (3, "DELETE", None, {"game": "go", "player": "q2", "score": 40}),
        (4, "DELETE", None, {"game": "go", "player": "q9", "score": 1}),
    ]))
    assert eng.last_stats["leaderboard"]["deletes"] == 1
    assert "go" not in sink.ids("leaderboard")


def test_update_as_delete_insert_promotes(spark, engine):
    eng, sink = engine
    _fact(spark, BASE)
    eng.process_cdc_batch(_cdc(spark, [
        (1, "UPDATE", {"game": "go", "player": "q2", "score": 999},
         {"game": "go", "player": "q2", "score": 40}),
    ]))
    assert eng.last_stats["leaderboard"].get("topk") == 1
    assert _top(sink, "go") == [(1, "q2", 999), (2, "q1", 50)]


def test_missing_before_image_falls_back_to_recompute(spark, engine):
    eng, sink = engine
    _fact(spark, BASE)
    batch = _cdc(spark, [(1, "DELETE", None, None)]).withColumn(
        "id", F.lit("p2")
    )
    eng.process_cdc_batch(batch)
    assert "topk" not in eng.last_stats["leaderboard"]  # recompute lane ran
    # recompute lane serves the catalog state (fact unchanged here)
    assert _top(sink, "chess") == [(1, "p1", 100), (2, "p2", 90)]


def test_state_survives_across_batches(spark, engine):
    eng, sink = engine
    _fact(spark, BASE)
    eng.process_cdc_batch(_cdc(spark, [(1, "INSERT", {"game": "chess", "player": "p8", "score": 99}, None)]))
    eng.process_cdc_batch(_cdc(spark, [(2, "INSERT", {"game": "chess", "player": "p7", "score": 98}, None)]))
    assert _top(sink, "chess") == [(1, "p1", 100), (2, "p8", 99)]
    # third batch: deletes of both newcomers absorb via buffer + heal
    _fact(spark, BASE)
    eng.process_cdc_batch(_cdc(spark, [
        (3, "DELETE", None, {"game": "chess", "player": "p8", "score": 99}),
        (4, "DELETE", None, {"game": "chess", "player": "p7", "score": 98}),
    ]))
    assert _top(sink, "chess") == [(1, "p1", 100), (2, "p2", 90)]


def test_state_persists_across_engine_restart(spark, tmp_path):
    """A NEW SyncEngine over the same snapshot store must resume the
    top-k state (rows + counts) written by its predecessor."""
    store = SnapshotStore(spark, str(tmp_path / "snap2"))
    sink1 = InMemorySink()
    eng1 = SyncEngine(spark, [_view()], sink1, store)
    _fact(spark, BASE)
    eng1.process_cdc_batch(_cdc(spark, [(1, "INSERT", {"game": "chess", "player": "p9", "score": 95}, None)]))
    assert _top(sink1, "chess") == [(1, "p1", 100), (2, "p9", 95)]

    sink2 = InMemorySink()
    eng2 = SyncEngine(spark, [_view()], sink2, store)
    eng2.process_cdc_batch(_cdc(spark, [
        (2, "DELETE", None, {"game": "chess", "player": "p1", "score": 100}),
    ]))
    assert eng2.last_stats["leaderboard"].get("topk") == 1
    # p9 (inserted before the restart) must still rank — proof the rows
    # state was read back, not re-initialized from the fact table
    assert _top(sink2, "chess") == [(1, "p9", 95), (2, "p2", 90)]
