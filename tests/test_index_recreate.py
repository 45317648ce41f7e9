"""A21 — sink index (re)create from ``{index}.json`` mappings/settings.

Mirrors reference ``Sinker.recreate_index`` (sinker.py:74-86): delete the
index ignoring absence, then create it with the mappings and settings
from the definitions file (fixture shape tests/fixtures/courses.json —
``dynamic: strict`` + shard settings), before the backfill writes, as the
reference does during ``setup`` (test_e2e.py:60-67)."""

from __future__ import annotations

import json

from sinker_spark.config import EngineConfig
from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.elastic import ElasticsearchSink
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import ViewDef

from tests import school_fixtures as fx

COURSES_BODY = {
    "mappings": {
        "dynamic": "strict",
        "properties": {"name": {"type": "text"}, "teacher": {"properties": {"salary": {"type": "float"}}}},
    },
    "settings": {"index": {"number_of_shards": "1", "number_of_replicas": "0"}},
}


class _RecordingIndices:
    def __init__(self, log: list) -> None:
        self._log = log

    def delete(self, index: str, **kw) -> None:
        self._log.append(("delete", index, kw))

    def create(self, index: str, **kw) -> None:
        self._log.append(("create", index, kw))


class _RecordingClient:
    def __init__(self) -> None:
        self.log: list = []
        self.indices = _RecordingIndices(self.log)


def test_recreate_index_delete_then_create_with_mappings():
    client = _RecordingClient()
    sink = ElasticsearchSink(client_factory=lambda: client, bulk_fn=lambda a: None)
    sink.recreate_index("courses", COURSES_BODY)

    assert [op for op, *_ in client.log] == ["delete", "create"]
    op, index, kw = client.log[0]
    assert index == "courses" and kw == {"ignore_unavailable": True}
    op, index, kw = client.log[1]
    assert index == "courses"
    assert kw["mappings"]["dynamic"] == "strict"
    assert kw["settings"]["index"]["number_of_shards"] == "1"


def test_recreate_index_without_body_creates_bare_index():
    client = _RecordingClient()
    sink = ElasticsearchSink(client_factory=lambda: client, bulk_fn=lambda a: None)
    sink.recreate_index("people", None)
    assert client.log == [
        ("delete", "people", {"ignore_unavailable": True}),
        ("create", "people", {}),
    ]


def test_backfill_recreates_indices_before_first_write(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    views = [
        ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people"),
        ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index="courses"),
    ]
    sink = InMemorySink()
    # stale doc from a previous run — reference semantics drop it on setup
    sink.indices["courses"] = {"stale-id": {"name": "old"}}
    store = SnapshotStore(spark, str(tmp_path / "snapshots"))
    eng = SyncEngine(spark, views, sink, store)

    eng.backfill(index_bodies={"people": None, "courses": COURSES_BODY})

    assert "stale-id" not in sink.indices["courses"]  # dropped by recreate
    assert sink.index_bodies["courses"]["mappings"]["dynamic"] == "strict"
    assert sink.index_bodies["people"] is None
    # recreate precedes every document write, per index
    ops = [(idx, op) for idx, op, _ in sink.action_log]
    for index in ("people", "courses"):
        first_recreate = ops.index((index, "recreate"))
        first_write = next(i for i, (idx, op) in enumerate(ops) if idx == index and op != "recreate")
        assert first_recreate < first_write
    # and the backfilled docs are present
    assert len(sink.indices["courses"]) > 0 and len(sink.indices["people"]) > 0


def test_backfill_without_bodies_keeps_existing_behavior(spark, tmp_path):
    fx.register(spark, str(tmp_path / "tables"))
    views = [ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people")]
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snapshots"))
    SyncEngine(spark, views, sink, store).backfill()
    assert all(op != "recreate" for _, op, _ in sink.action_log)


def test_config_index_settings_feed_backfill(spark, tmp_path):
    defs = tmp_path / "defs"
    defs.mkdir()
    (defs / "views_to_indices.json").write_text(json.dumps({"person_mv": "people"}))
    (defs / "person_mv.sql").write_text(fx.PERSON_MV_SQL)
    (defs / "people.json").write_text(json.dumps(COURSES_BODY))
    cfg = EngineConfig(definitions_path=str(defs))
    views = cfg.load_views()
    bodies = {v.index: cfg.index_settings(v.index) for v in views}
    assert bodies["people"]["settings"]["index"]["number_of_replicas"] == "0"
