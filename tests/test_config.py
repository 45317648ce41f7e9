"""EngineConfig: definitions loading (A1/A2), index-mapping passthrough
(A21, reference sinker.py:74-86), env-var parity (settings.py)."""

from __future__ import annotations

import json

from sinker_spark.config import EngineConfig


def test_load_views_and_index_passthrough(tmp_path):
    (tmp_path / "person_mv.sql").write_text(
        'select id, json_build_object(\'name\', "name") as "person" from "person"'
    )
    (tmp_path / "views_to_indices.json").write_text(json.dumps({"person_mv": "people"}))
    mappings = {"mappings": {"dynamic": "strict", "properties": {"name": {"type": "keyword"}}}}
    (tmp_path / "people.json").write_text(json.dumps(mappings))

    cfg = EngineConfig(definitions_path=str(tmp_path))
    views = cfg.load_views()
    assert len(views) == 1
    v = views[0]
    assert v.name == "person_mv" and v.index == "people"
    assert v.deps == {"person"} and v.parent_table == "person"
    # ES mappings JSON passes through verbatim (dynamic:strict preserved)
    assert cfg.index_settings("people") == mappings
    assert cfg.index_settings("nonexistent") is None


def test_env_parity(monkeypatch):
    monkeypatch.setenv("SINKER_POLL_INTERVAL", "3")
    monkeypatch.setenv("ELASTICSEARCH_CHUNK_SIZE", "250")
    monkeypatch.setenv("ELASTICSEARCH_HOST", "es.internal")
    monkeypatch.setenv("ELASTICSEARCH_PORT", "9400")
    cfg = EngineConfig.from_env()
    assert cfg.poll_interval == 3
    assert cfg.es_chunk_size == 250
    assert cfg.es_hosts == ["http://es.internal:9400"]
