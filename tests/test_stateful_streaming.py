"""Custom stateful operator (applyInPandasWithState) across micro-batches
and restarts, and sink idempotence under batch replay (the delivery
guarantee the engine claims: at-least-once replay + idempotent per-id
sink = effectively exactly-once)."""

from __future__ import annotations

import json

from sinker_spark.streaming.stateful import running_user_stats

RESULTS: dict[int, tuple[int, float]] = {}


def _capture(batch_df, epoch_id):
    for r in batch_df.collect():
        RESULTS[r["user_id"]] = (r["n_events"], r["total_value"])


def test_stateful_running_stats_across_batches_and_restart(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    with open(src / "a.jsonl", "w") as fh:
        fh.write(json.dumps({"user_id": 1, "value": 10.0}) + "\n")
        fh.write(json.dumps({"user_id": 1, "value": 5.0}) + "\n")
        fh.write(json.dumps({"user_id": 2, "value": 1.0}) + "\n")

    def run():
        stream = (
            spark.readStream.schema("user_id bigint, value double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            running_user_stats(stream)
            .writeStream.foreachBatch(_capture)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    RESULTS.clear()
    run()
    assert RESULTS[1] == (2, 15.0)
    assert RESULTS[2] == (1, 1.0)

    # restart with one more file: checkpointed state must resume (user 1
    # continues from n=2), not reset — and already-processed files are
    # not reprocessed
    with open(src / "b.jsonl", "w") as fh:
        fh.write(json.dumps({"user_id": 1, "value": 2.5}) + "\n")
    RESULTS.clear()
    run()
    assert RESULTS == {1: (3, 17.5)}


EMITTED: list[tuple] = []


def _capture_changes(batch_df, epoch_id):
    for r in batch_df.collect():
        EMITTED.append((r["id"], r["doc"], r["lsn"]))


def _run_suppression(spark, tmp_path, op):
    src = tmp_path / "upd"
    src.mkdir()
    # batch 1: two versions of a in one batch (lsn 1,2) + b
    with open(src / "a.jsonl", "w") as fh:
        fh.write(json.dumps({"id": "a", "doc": "{'v':1}", "lsn": 1}) + "\n")
        fh.write(json.dumps({"id": "a", "doc": "{'v':2}", "lsn": 2}) + "\n")
        fh.write(json.dumps({"id": "b", "doc": "{'v':9}", "lsn": 1}) + "\n")
    # batch 2: a re-delivered UNCHANGED (suppress), b changed (emit),
    # c = stale at-least-once replay (OLDER lsn, different doc) after its
    # first sighting in batch 1 — must NOT regress the sink. d exercises
    # the watermark-advance path: batch 1 emits lsn 5, batch 2 first
    # re-touches the SAME content at lsn 8 (suppressed, but the stored
    # watermark must advance to 8) and then replays a stale lsn-6
    # DIFFERENT doc, which only the advanced watermark can reject.
    with open(src / "a.jsonl", "a") as fh:
        fh.write(json.dumps({"id": "c", "doc": "{'v':7}", "lsn": 5}) + "\n")
        fh.write(json.dumps({"id": "d", "doc": "{'v':1}", "lsn": 5}) + "\n")
    with open(src / "b.jsonl", "w") as fh:
        fh.write(json.dumps({"id": "a", "doc": "{'v':2}", "lsn": 3}) + "\n")
        fh.write(json.dumps({"id": "b", "doc": "{'v':10}", "lsn": 2}) + "\n")
        fh.write(json.dumps({"id": "c", "doc": "{'v':6}", "lsn": 4}) + "\n")
        fh.write(json.dumps({"id": "d", "doc": "{'v':1}", "lsn": 8}) + "\n")
    # batch 3: d's stale intermediate version replays AFTER the touch
    with open(src / "c.jsonl", "w") as fh:
        fh.write(json.dumps({"id": "d", "doc": "{'v':0}", "lsn": 6}) + "\n")
    # file source orders batches by mtime — pin them so batch order is stable
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(src / "a.jsonl", (now - 60, now - 60))
    _os.utime(src / "b.jsonl", (now - 30, now - 30))
    _os.utime(src / "c.jsonl", (now, now))

    stream = (
        spark.readStream.schema("id string, doc string, lsn bigint")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    EMITTED.clear()
    q = (
        op(stream)
        .writeStream.foreachBatch(_capture_changes)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    by_id: dict[str, list[tuple]] = {}
    for rid, doc, lsn in EMITTED:
        by_id.setdefault(rid, []).append((doc, lsn))
    # a: batch1 emits the max-lsn version only; batch2 redelivery suppressed
    assert by_id["a"] == [("{'v':2}", 2)]
    # b: both batches emitted (content changed)
    assert by_id["b"] == [("{'v':9}", 1), ("{'v':10}", 2)]
    # c: the stale lsn-4 replay is suppressed, v:7 stays current
    assert by_id["c"] == [("{'v':7}", 5)]
    # d: emitted once; the unchanged lsn-8 touch advanced the watermark,
    # so the stale lsn-6 different-content replay is rejected too
    assert by_id["d"] == [("{'v':1}", 5)]


def test_suppress_unchanged_applyinpandaswithstate(spark, tmp_path):
    """Change-suppression compaction: re-delivered identical docs are
    dropped; changed docs pass; within-batch last-write-wins by lsn."""
    from sinker_spark.streaming.stateful import suppress_unchanged

    _run_suppression(spark, tmp_path, suppress_unchanged)


def test_suppress_unchanged_transformwithstate(spark, tmp_path):
    """Same state machine on the Spark 4.x transformWithState API —
    requires the protobuf runtime its Python worker speaks."""
    import pytest

    from sinker_spark.streaming import stateful

    if not stateful.HAS_TWS_RUNTIME:
        pytest.skip("google.protobuf not installed; transformWithState runner unavailable")
    _run_suppression(spark, tmp_path, stateful.suppress_unchanged_tws)


def test_sink_idempotent_under_replay(spark, tmp_path):
    """Replaying the identical CDC batch twice (what an at-least-once
    restart does between offset-commit and completion) must converge to
    the same sink state — per-id upsert/delete idempotence."""
    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.views import ViewDef
    from tests import school_fixtures as fx

    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    eng = SyncEngine(
        spark,
        [ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people")],
        sink,
        SnapshotStore(spark, str(tmp_path / "snap")),
    )
    eng.backfill()

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-1", "Jane") if r[0] == "p-1" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    batch = spark.createDataFrame(
        [(1, "public", "person", "UPDATE", "p-1", None)],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )
    eng.process_cdc_batch(batch)
    state_once = dict(sink.indices["people"])
    eng.process_cdc_batch(batch)  # replay
    assert sink.indices["people"] == state_once
    assert sink.get("people", "p-1") == {"name": "Jane"}
