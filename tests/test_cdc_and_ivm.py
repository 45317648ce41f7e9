"""Units for the CDC parsers, last-write-wins compaction, snapshot-diff,
the declarative action router, and the executor-side ES sink path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sinker_spark.cdc import latest_per_key, parse_debezium_json, parse_test_decoding
from sinker_spark.ivm import DELETE, UPSERT, SnapshotStore, snapshot_diff
from sinker_spark.runner import route_actions
from sinker_spark.sinks.elastic import ElasticsearchSink


def test_parse_test_decoding(spark):
    """Semantics of the reference's SLOT_RE (bulk_action_generator.py:15-19)
    + correct apostrophe handling (NOT the strip-all-quotes bug at :45)."""
    lines = [
        (1, "table public.person: INSERT: id[text]:'p-1' name[text]:'John'"),
        (2, "table sinker.person_mv: INSERT: id[text]:'p-1' doc[json]:'{\"name\" : \"O''Brien\"}'"),
        (3, "table public.person: DELETE: id[text]:'p-1'"),
        (4, "BEGIN 1234"),  # non-matching slot entries are dropped
        (5, 'table public."CamelTable": UPDATE: id[text]:\'x-9\' v[integer]:7'),
    ]
    df = spark.createDataFrame(lines, "lsn bigint, data string")
    out = {r["lsn"]: r.asDict() for r in parse_test_decoding(df).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["table"] == "person" and out[1]["op"] == "INSERT" and out[1]["id"] == "p-1"
    assert out[3]["op"] == "DELETE"
    assert out[5]["table"] == "CamelTable" and out[5]["schema"] == "public"
    # apostrophe inside the doc survives (divergence from reference bug)
    assert json.loads(out[2]["payload"]) == {"name": "O'Brien"}


def test_parse_debezium(spark):
    env = {
        "payload": {
            "op": "u",
            "lsn": 42,
            "source": {"schema": "public", "table": "person"},
            "before": {"id": "p-1", "name": "John"},
            "after": {"id": "p-1", "name": "Jane"},
        }
    }
    df = spark.createDataFrame([(json.dumps(env),)], "value string")
    row = parse_debezium_json(df).collect()[0]
    assert (row["lsn"], row["table"], row["op"], row["id"]) == (42, "person", "UPDATE", "p-1")
    assert json.loads(row["payload"])["name"] == "Jane"


def test_parse_debezium_schema_drift_new_columns(spark):
    """Source-side DDL adds a column mid-stream: the after-map schema is
    open (map<string,string>), so never-seen columns flow straight into
    the payload JSON — no parser change, no crash, no silent drop."""
    envs = [
        {"payload": {"op": "c", "lsn": 1,
                     "source": {"schema": "public", "table": "person"},
                     "before": None, "after": {"id": "p-1", "name": "A"}}},
        # later record carries a brand-new column
        {"payload": {"op": "u", "lsn": 2,
                     "source": {"schema": "public", "table": "person"},
                     "before": {"id": "p-1", "name": "A"},
                     "after": {"id": "p-1", "name": "A", "nickname": "Ace"}}},
    ]
    df = spark.createDataFrame([(json.dumps(e),) for e in envs], "value string")
    rows = {r["lsn"]: r for r in parse_debezium_json(df).collect()}
    assert "nickname" not in json.loads(rows[1]["payload"])
    assert json.loads(rows[2]["payload"])["nickname"] == "Ace"


def test_parse_debezium_malformed_envelope_drops_to_nulls(spark):
    """Garbage on the topic must not kill the stream: from_json yields
    nulls, and the null-table rows are filterable, not fatal."""
    df = spark.createDataFrame([("not json at all",), ("{}",)], "value string")
    out = parse_debezium_json(df)
    rows = out.collect()
    assert len(rows) == 2 and all(r["table"] is None for r in rows)
    assert out.where("table IS NOT NULL").count() == 0


def test_latest_per_key_compaction(spark):
    df = spark.createDataFrame(
        [
            (1, "s", "person", "INSERT", "p-1", "v1"),
            (3, "s", "person", "UPDATE", "p-1", "v3"),
            (2, "s", "person", "UPDATE", "p-1", "v2"),
            (1, "s", "course", "INSERT", "c-1", "x"),
        ],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )
    out = {(r["table"], r["id"]): r["payload"] for r in latest_per_key(df).collect()}
    assert out == {("person", "p-1"): "v3", ("course", "c-1"): "x"}


def test_snapshot_diff_upsert_delete_nochange(spark):
    old = spark.createDataFrame([("a", "doc-a"), ("b", "doc-b"), ("c", "doc-c")], "id string, doc string")
    new = spark.createDataFrame([("a", "doc-a"), ("b", "doc-B2"), ("d", "doc-d")], "id string, doc string")
    delta = {(r["id"], r["op"]) for r in snapshot_diff(old, new).collect()}
    assert delta == {("b", UPSERT), ("d", UPSERT), ("c", DELETE)}


def test_snapshot_diff_initial_backfill(spark):
    new = spark.createDataFrame([("a", "x"), ("b", "y")], "id string, doc string")
    delta = {(r["id"], r["op"]) for r in snapshot_diff(None, new).collect()}
    assert delta == {("a", UPSERT), ("b", UPSERT)}


def test_snapshot_store_versions_and_key_uniqueness(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    df1 = spark.createDataFrame([("a", "x"), ("a", "x"), ("b", "y")], "id string, doc string")
    v1 = store.write("v", df1)
    assert v1 == 1
    assert store.read("v").count() == 2  # dropDuplicates enforced the unique key
    df2 = spark.createDataFrame([("a", "x2"), ("b", "y")], "id string, doc string")
    delta = store.refresh("v", df2)
    assert {(r["id"], r["op"]) for r in delta.collect()} == {("a", UPSERT)}
    assert store.current_version("v") == 2


def test_route_actions_fast_lane(spark):
    """A15-A18: MV INSERT → upsert; parent DELETE → delete-by-proxy
    (sinker.py:110-120); everything else dropped; last-write-wins."""
    cdc = spark.createDataFrame(
        [
            (1, "sinker", "person_mv", "INSERT", "p-1", '{"name": "John"}'),
            (2, "sinker", "person_mv", "INSERT", "p-1", '{"name": "Jane"}'),
            (3, "public", "person", "DELETE", "p-2", None),
            (4, "public", "person", "INSERT", "p-9", None),  # parent INSERT: dropped
            (5, "public", "other", "DELETE", "z-1", None),  # unknown table: dropped
        ],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )
    acts = route_actions(cdc, {"person_mv": "people"}, {"person": "people"})
    got = {(r["index"], r["id"], r["op"]): r["doc"] for r in acts.collect()}
    assert set(got) == {("people", "p-1", UPSERT), ("people", "p-2", DELETE)}
    assert json.loads(got[("people", "p-1", UPSERT)])["name"] == "Jane"  # lsn 2 wins


def test_elastic_sink_action_building(spark, tmp_path):
    """Partition-level bulk-action construction with an injected bulk_fn
    (the real client isn't installed); actions land as the reference's
    index/delete dicts (bulk_action_generator.py:60-90 semantics)."""
    out_dir = tmp_path / "bulk"
    out_dir.mkdir()
    out_path = str(out_dir)

    def bulk_fn(actions):
        import json as _json
        import os
        import uuid

        acts = list(actions)
        if acts:
            with open(os.path.join(out_path, f"{uuid.uuid4()}.json"), "w") as fh:
                _json.dump(acts, fh)

    sink = ElasticsearchSink(bulk_fn=bulk_fn)
    actions = spark.createDataFrame(
        [("p-1", UPSERT, '{"name": "J"}'), ("p-2", DELETE, None)],
        "id string, op string, doc string",
    )
    sink.apply_actions("people", actions)
    collected = []
    for f_ in out_dir.iterdir():
        collected += json.load(open(f_))
    by_id = {a["_id"]: a for a in collected}
    assert by_id["p-1"]["_index"] == "people" and by_id["p-1"]["_source"] == {"name": "J"}
    assert by_id["p-2"]["_op_type"] == "delete"
