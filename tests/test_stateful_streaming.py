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
