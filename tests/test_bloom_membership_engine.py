"""SyncEngine Bloom membership lane: INSERT-only batches bit_or into
the stored word relation (O(batch), no fact scan), only changed words
land in the sink, replay is idempotent, deletes fall back to the
authoritative recompute lane, and the maintained filter answers
membership probes with zero false negatives."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import MembershipViewSpec, ViewDef

ROW_SCHEMA = "id string, content_hash string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)
M_BITS = 4096


def _fact(spark, rows):
    spark.createDataFrame(rows, ROW_SCHEMA).createOrReplaceTempView("ingested")


def _view():
    def recompute(spark):
        from sinker_spark.ivm_bloom import initial_bloom_state

        words = initial_bloom_state(spark.table("ingested"), "content_hash", M_BITS)
        return words.select(
            F.col("word_idx").cast("string").alias("id"),
            F.struct("word_idx", "word").alias("doc"),
        )

    return ViewDef(
        name="seen_hashes",
        fn=recompute,
        deps={"ingested"},
        membership=MembershipViewSpec(
            table="ingested", value_col="content_hash", m_bits=M_BITS, row_schema=ROW_SCHEMA
        ),
    )


def _cdc(spark, records):
    rows = [
        (
            lsn,
            "public",
            "ingested",
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


def _probe_hits(spark, sink, keys):
    from sinker_spark.ivm_bloom import membership_probe

    docs = [sink.get("seen_hashes", i) for i in sink.ids("seen_hashes")]
    state = spark.createDataFrame(
        [(d["word_idx"], d["word"]) for d in docs], "word_idx int, word bigint"
    )
    rows = spark.createDataFrame([(k,) for k in keys], "key string")
    return {
        r["key"]: r["bloom_hit"]
        for r in membership_probe(rows, "key", state, M_BITS).collect()
    }


def test_insert_batch_folds_and_filter_answers(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), f"hash-{i}") for i in range(30)])
    eng.backfill()  # full word relation lands in the sink first
    batch = _cdc(spark, [
        (1, "INSERT", {"id": "n1", "content_hash": "hash-new-1"}, None),
        (2, "INSERT", {"id": "n2", "content_hash": "hash-new-2"}, None),
    ])
    eng.process_cdc_batch(batch)
    assert eng.last_stats["seen_hashes"].get("bloom_membership") == 1
    hits = _probe_hits(
        spark, sink, ["hash-0", "hash-29", "hash-new-1", "hash-new-2", "never-seen-xyz"]
    )
    # no false negatives ever
    for k in ("hash-0", "hash-29", "hash-new-1", "hash-new-2"):
        assert hits[k], k
    # 32 keys in 4096 bits -> fp rate ~ (1-e^-0.031)^4 ~ 1e-6
    assert not hits["never-seen-xyz"]


def test_only_touched_words_upserted(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), f"hash-{i}") for i in range(30)])
    batch = _cdc(spark, [(1, "INSERT", {"id": "n1", "content_hash": "hash-new-1"}, None)])
    eng.process_cdc_batch(batch)
    # one key -> at most 4 word slots touched
    assert 1 <= len(sink.ids("seen_hashes")) <= 4


def test_replay_is_idempotent(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), f"hash-{i}") for i in range(30)])
    batch = _cdc(spark, [(1, "INSERT", {"id": "x", "content_hash": "hash-xyz"}, None)])
    eng.process_cdc_batch(batch)
    first = {i: sink.get("seen_hashes", i) for i in sink.ids("seen_hashes")}
    eng.process_cdc_batch(batch)  # at-least-once replay: bit_or is a no-op
    assert eng.last_stats["seen_hashes"].get("bloom_membership") == 1
    assert {i: sink.get("seen_hashes", i) for i in sink.ids("seen_hashes")} == first


def test_delete_falls_back_to_recompute(spark, engine):
    eng, sink = engine
    _fact(spark, [(str(i), f"hash-{i}") for i in range(20)])
    batch = _cdc(spark, [
        (1, "DELETE", None, {"id": "3", "content_hash": "hash-3"}),
    ])
    eng.process_cdc_batch(batch)
    stats = eng.last_stats["seen_hashes"]
    assert "bloom_membership" not in stats  # monotone bits can't fold deletes
