"""Stream-stream join and streaming dedup — the two Structured Streaming
capabilities beyond windows/state that a production CDC/analytics
pipeline leans on. Both run as real checkpointed streaming queries."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _write_jsonl(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases joined to the same user's clicks within the preceding
    hour — watermarks on both sides bound the join state (without them
    Spark would buffer both streams forever)."""
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    clicks_dir.mkdir(), buys_dir.mkdir()
    _write_jsonl(clicks_dir / "c.jsonl", [
        {"user_id": 1, "click_ts": "2024-01-01 10:00:00", "page": "a"},
        {"user_id": 1, "click_ts": "2024-01-01 08:00:00", "page": "old"},   # too early
        {"user_id": 2, "click_ts": "2024-01-01 10:10:00", "page": "b"},
    ])
    _write_jsonl(buys_dir / "b.jsonl", [
        {"user_id": 1, "buy_ts": "2024-01-01 10:30:00", "amount": 9.99},
        {"user_id": 2, "buy_ts": "2024-01-01 12:00:00", "amount": 5.00},    # >1h after click
    ])

    clicks = (
        spark.readStream.schema("user_id bigint, click_ts string, page string").json(str(clicks_dir))
        .select("user_id", F.col("click_ts").cast("timestamp").alias("click_ts"), "page")
        .withWatermark("click_ts", "2 hours")
    )
    buys = (
        spark.readStream.schema("user_id bigint, buy_ts string, amount double").json(str(buys_dir))
        .select(F.col("user_id").alias("b_user"), F.col("buy_ts").cast("timestamp").alias("buy_ts"), "amount")
        .withWatermark("buy_ts", "2 hours")
    )
    joined = buys.join(
        clicks,
        F.expr("""
            b_user = user_id AND
            click_ts <= buy_ts AND
            click_ts >= buy_ts - INTERVAL 1 HOUR
        """),
    ).select("b_user", "amount", "page")

    q = (
        joined.writeStream.format("memory").queryName("ssj").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["b_user"], r["amount"], r["page"]) for r in spark.sql("select * from ssj").collect()}
    assert got == {(1, 9.99, "a")}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed CDC records (same event_id)
    collapse to one output row while state stays bounded by the watermark."""
    src = tmp_path / "ev"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},
        {"event_id": 1, "ts": "2024-01-01 10:00:05", "v": 1.0},   # duplicate delivery
        {"event_id": 2, "ts": "2024-01-01 10:01:00", "v": 2.0},
    ])
    stream = (
        spark.readStream.schema("event_id bigint, ts string, v double").json(str(src))
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "v")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory").queryName("dedup_stream").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select event_id, count(*) n from dedup_stream group by event_id").collect()
    assert {r["event_id"]: r["n"] for r in rows} == {1: 1, 2: 1}
