"""Engine configuration — env-var surface mirroring the reference's
settings.py so a sinker user can switch without relearning knobs.

Reference parity (settings.py:13-50): SINKER_DEFINITIONS_PATH holds one
``{view}.sql`` per view plus ``views_to_indices.json`` (view → ES index)
and optional ``{index}.json`` ES mapping files (passed through verbatim
at index creation, sinker.py:74-86). Spark-specific knobs get
SPARK_GRAFT_*-style envs (session.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from sinker_spark.views import ViewDef


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


def pg_conninfo() -> str:
    """libpq conninfo string from the standard PG env surface the
    reference relies on (settings.py:44-50: PGHOST/PGPORT/PGUSER/
    PGPASSWORD plus PGSSLMODE/PGSSLROOTCERT; the reference passes them
    implicitly via ``psycopg.connect()`` → libpq). Built explicitly here
    so the secured-connection surface is testable offline; unset vars
    are omitted and fall back to libpq defaults. Values are
    single-quoted per libpq conninfo quoting rules."""
    parts = []
    for key, env in [
        ("host", "PGHOST"), ("port", "PGPORT"), ("user", "PGUSER"),
        ("password", "PGPASSWORD"), ("dbname", "PGDATABASE"),
        ("sslmode", "PGSSLMODE"), ("sslrootcert", "PGSSLROOTCERT"),
    ]:
        val = os.environ.get(env)
        if val:
            quoted = val.replace("\\", "\\\\").replace("'", "\\'")
            parts.append(f"{key}='{quoted}'")
    return " ".join(parts)


@dataclass
class EngineConfig:
    definitions_path: str = "."
    poll_interval: int = 10          # SINKER_POLL_INTERVAL (settings.py:20)
    es_chunk_size: int = 100         # ELASTICSEARCH_CHUNK_SIZE (settings.py:23)
    es_max_retries: int = 5          # ELASTICSEARCH_MAX_RETRIES (settings.py:25)
    es_hosts: list[str] = field(default_factory=lambda: ["http://localhost:9200"])
    # secured-cluster surface (reference settings.py:26-34, es.py:15-25)
    es_user: str | None = None           # ELASTICSEARCH_USER
    es_password: str | None = None       # ELASTICSEARCH_PASSWORD
    es_verify_certs: bool = True         # ELASTICSEARCH_VERIFY_CERTS
    es_ssl_show_warn: bool = False       # ELASTICSEARCH_SSL_SHOW_WARN
    es_timeout: float = 60.0             # ELASTICSEARCH_TIMEOUT
    es_raise_on_error: bool = True       # ELASTICSEARCH_RAISE_ON_ERROR
    es_raise_on_exception: bool = True   # ELASTICSEARCH_RAISE_ON_EXCEPTION
    pg_conninfo: str = ""                # PGHOST/PGUSER/…/PGSSLMODE/PGSSLROOTCERT
    # opt-in SQL→doc-tree lane for every loaded view (ivm_doc_sql):
    # fully-incremental fold when the CDC stream carries before-images
    sql_doctree: bool = False            # SINKER_SPARK_SQL_DOCTREE
    snapshot_root: str = "/tmp/sinker_spark_snapshots"
    checkpoint_root: str = "/tmp/sinker_spark_checkpoints"

    @classmethod
    def from_env(cls) -> "EngineConfig":
        scheme = os.environ.get("ELASTICSEARCH_SCHEME", "http")
        host = os.environ.get("ELASTICSEARCH_HOST", "localhost")
        port = _env_int("ELASTICSEARCH_PORT", 9200)
        return cls(
            definitions_path=os.environ.get("SINKER_DEFINITIONS_PATH", "."),
            poll_interval=_env_int("SINKER_POLL_INTERVAL", 10),
            es_chunk_size=_env_int("ELASTICSEARCH_CHUNK_SIZE", 100),
            es_max_retries=_env_int("ELASTICSEARCH_MAX_RETRIES", 5),
            es_hosts=[f"{scheme}://{host}:{port}"],
            es_user=os.environ.get("ELASTICSEARCH_USER") or None,
            es_password=os.environ.get("ELASTICSEARCH_PASSWORD") or None,
            es_verify_certs=_env_bool("ELASTICSEARCH_VERIFY_CERTS", True),
            es_ssl_show_warn=_env_bool("ELASTICSEARCH_SSL_SHOW_WARN", False),
            es_timeout=_env_float("ELASTICSEARCH_TIMEOUT", 60.0),
            es_raise_on_error=_env_bool("ELASTICSEARCH_RAISE_ON_ERROR", True),
            es_raise_on_exception=_env_bool("ELASTICSEARCH_RAISE_ON_EXCEPTION", True),
            pg_conninfo=pg_conninfo(),
            sql_doctree=_env_bool("SINKER_SPARK_SQL_DOCTREE", False),
            snapshot_root=os.environ.get("SINKER_SPARK_SNAPSHOT_ROOT", "/tmp/sinker_spark_snapshots"),
            checkpoint_root=os.environ.get("SINKER_SPARK_CHECKPOINT_ROOT", "/tmp/sinker_spark_checkpoints"),
        )

    def es_client_kwargs(self) -> dict:
        """Keyword arguments for ``elasticsearch.Elasticsearch`` mirroring
        the reference's get_client (es.py:15-25). Divergence, deliberate:
        credentials go through ``basic_auth=`` rather than being embedded
        in the URL so they can't leak into connection-pool logs; the
        resulting Authorization header is identical."""
        kwargs: dict = {
            "request_timeout": self.es_timeout,
            "verify_certs": self.es_verify_certs,
            "ssl_show_warn": self.es_ssl_show_warn,
        }
        if self.es_user is not None:
            kwargs["basic_auth"] = (self.es_user, self.es_password or "")
        return kwargs

    def load_views(self) -> list[ViewDef]:
        """Read views_to_indices.json + per-view SQL files (reference
        runner.py:30-31, sinker.py:96-98)."""
        with open(os.path.join(self.definitions_path, "views_to_indices.json")) as fh:
            views_to_indices: dict[str, str] = json.load(fh)
        out = []
        for view, index in views_to_indices.items():
            with open(os.path.join(self.definitions_path, f"{view}.sql")) as fh:
                sql = fh.read()
            out.append(ViewDef(view, sql=sql, index=index, sql_doctree=self.sql_doctree))
        return out

    def index_settings(self, index: str) -> dict | None:
        """Optional ES mappings/settings JSON passthrough ({index}.json,
        reference sinker.py:74-86); None if absent."""
        path = os.path.join(self.definitions_path, f"{index}.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)
