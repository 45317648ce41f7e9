"""True Structured Streaming run of the sync engine: a file-source CDC
stream (test_decoding text lines) drained with availableNow through
SyncEngine.run_stream — the reference's poll loop (runner.py:68-99) as a
checkpointed streaming query."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.cdc import CDC_SCHEMA, parse_test_decoding
from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx


def test_stream_sync_end_to_end(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    views = [
        ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
        ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses"),
    ]
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng = SyncEngine(spark, views, sink, store)
    eng.backfill()
    assert sink.get("people", "p-1") == {"name": "John"}

    # mutate the source tables, then deliver the change as a CDC file
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-1", "Jane") if r[0] == "p-1" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    with open(cdc_dir / "batch1.txt", "w") as fh:
        fh.write("1\ttable public.person: UPDATE: id[text]:'p-1' name[text]:'Jane'\n")

    raw = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(cdc_dir))
        .select(
            F.split("value", "\t").getItem(0).cast("bigint").alias("lsn"),
            F.split("value", "\t").getItem(1).alias("data"),
        )
    )
    cdc_stream = parse_test_decoding(raw)
    q = eng.run_stream(cdc_stream, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    assert sink.get("people", "p-1") == {"name": "Jane"}
    c1 = sink.get("courses", "c-1")
    assert [e["student"]["person"]["name"] for e in c1["enrollments"]] == ["Loren", "Jane"]


def test_stream_windowed_aggregation_with_watermark(spark, tmp_path):
    """Streaming tumbling-window agg with a watermark over a rate-less
    file source — the streaming twin of tumbling_hourly_events (the batch
    query the DuckDB oracle validates)."""
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01 00:05:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01 00:25:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-01 01:05:00", "event_type": "view", "value": 5.0},
    ]
    with open(src / "e.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts string, event_type string, value double")
        .json(str(src))
        # watermarks require TIMESTAMP (LTZ); session tz is pinned UTC
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("h"),
            "event_type",
            "n",
            "total",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["h"], r["event_type"]): (r["n"], r["total"]) for r in spark.sql("select * from win_agg").collect()}
    assert got == {
        ("2024-01-01 00:00", "click"): (2, 3.0),
        ("2024-01-01 01:00", "view"): (1, 5.0),
    }
