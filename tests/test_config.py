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


def test_secured_es_config(monkeypatch):
    """Reference settings.py:26-34 + es.py:15-25: basic auth, TLS
    verification, timeout — threaded into ES client kwargs."""
    for k in ("ELASTICSEARCH_USER", "ELASTICSEARCH_PASSWORD",
              "ELASTICSEARCH_VERIFY_CERTS", "ELASTICSEARCH_SSL_SHOW_WARN",
              "ELASTICSEARCH_TIMEOUT", "ELASTICSEARCH_SCHEME"):
        monkeypatch.delenv(k, raising=False)
    from sinker_spark.config import EngineConfig

    # defaults: no auth kwarg, verify on, warn off, 60s
    kw = EngineConfig.from_env().es_client_kwargs()
    assert kw == {"request_timeout": 60.0, "verify_certs": True, "ssl_show_warn": False}

    monkeypatch.setenv("ELASTICSEARCH_SCHEME", "https")
    monkeypatch.setenv("ELASTICSEARCH_USER", "elastic")
    monkeypatch.setenv("ELASTICSEARCH_PASSWORD", "s3cret")
    monkeypatch.setenv("ELASTICSEARCH_VERIFY_CERTS", "false")
    monkeypatch.setenv("ELASTICSEARCH_SSL_SHOW_WARN", "true")
    monkeypatch.setenv("ELASTICSEARCH_TIMEOUT", "12.5")
    cfg = EngineConfig.from_env()
    assert cfg.es_hosts == ["https://localhost:9200"]
    kw = cfg.es_client_kwargs()
    assert kw["basic_auth"] == ("elastic", "s3cret")
    assert kw["verify_certs"] is False
    assert kw["ssl_show_warn"] is True
    assert kw["request_timeout"] == 12.5


def test_secured_es_sink_threading(monkeypatch):
    """client_kwargs reach both the admin client and the executor-side
    bulk path; raise_on_error/exception mirror ELASTICSEARCH_BULK_KWARGS."""
    from sinker_spark.sinks.elastic import ElasticsearchSink

    seen = {}

    def factory():
        seen["called"] = True
        raise SystemExit  # admin path not exercised further here

    sink = ElasticsearchSink(
        hosts=["https://es:9200"],
        client_kwargs={"basic_auth": ("u", "p"), "verify_certs": False,
                       "request_timeout": 5},
        raise_on_error=False,
        raise_on_exception=False,
        client_factory=factory,
    )
    assert sink.client_kwargs == {
        "request_timeout": 5, "basic_auth": ("u", "p"), "verify_certs": False,
    }
    assert sink.raise_on_error is False and sink.raise_on_exception is False
    import pickle

    # the kwargs dict must survive pickling to the executors
    assert pickle.loads(pickle.dumps(sink.client_kwargs)) == sink.client_kwargs


def test_pg_conninfo_from_env(monkeypatch):
    """PGSSLMODE/PGSSLROOTCERT (reference settings.py:47-48) and the
    standard libpq vars compose into an explicit conninfo; unset → ''."""
    from sinker_spark.config import pg_conninfo

    for k in ("PGHOST", "PGPORT", "PGUSER", "PGPASSWORD", "PGDATABASE",
              "PGSSLMODE", "PGSSLROOTCERT"):
        monkeypatch.delenv(k, raising=False)
    assert pg_conninfo() == ""

    monkeypatch.setenv("PGHOST", "db.internal")
    monkeypatch.setenv("PGUSER", "sinker")
    monkeypatch.setenv("PGPASSWORD", "p'w")
    monkeypatch.setenv("PGSSLMODE", "verify-full")
    monkeypatch.setenv("PGSSLROOTCERT", "/etc/ssl/root.crt")
    ci = pg_conninfo()
    assert "host='db.internal'" in ci
    assert "user='sinker'" in ci
    assert "password='p\\'w'" in ci  # libpq quoting of embedded quote
    assert "sslmode='verify-full'" in ci
    assert "sslrootcert='/etc/ssl/root.crt'" in ci


def test_sql_doctree_env_knob(monkeypatch, tmp_path):
    import json as _json

    from sinker_spark.config import EngineConfig

    (tmp_path / "views_to_indices.json").write_text(
        _json.dumps({"v1": "idx1"})
    )
    (tmp_path / "v1.sql").write_text("select id, name from t1")
    monkeypatch.setenv("SINKER_SPARK_SQL_DOCTREE", "1")
    cfg = EngineConfig.from_env()
    assert cfg.sql_doctree is True
    cfg.definitions_path = str(tmp_path)
    views = cfg.load_views()
    assert views[0].sql_doctree is True
    monkeypatch.delenv("SINKER_SPARK_SQL_DOCTREE")
    assert EngineConfig.from_env().sql_doctree is False
