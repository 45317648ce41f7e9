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


@dataclass
class EngineConfig:
    definitions_path: str = "."
    poll_interval: int = 10          # SINKER_POLL_INTERVAL (settings.py:20)
    es_chunk_size: int = 100         # ELASTICSEARCH_CHUNK_SIZE (settings.py:23)
    es_max_retries: int = 5          # ELASTICSEARCH_MAX_RETRIES (settings.py:25)
    es_hosts: list[str] = field(default_factory=lambda: ["http://localhost:9200"])
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
            snapshot_root=os.environ.get("SINKER_SPARK_SNAPSHOT_ROOT", "/tmp/sinker_spark_snapshots"),
            checkpoint_root=os.environ.get("SINKER_SPARK_CHECKPOINT_ROOT", "/tmp/sinker_spark_checkpoints"),
        )

    def load_views(self) -> list[ViewDef]:
        """Read views_to_indices.json + per-view SQL files (reference
        runner.py:30-31, sinker.py:96-98)."""
        with open(os.path.join(self.definitions_path, "views_to_indices.json")) as fh:
            views_to_indices: dict[str, str] = json.load(fh)
        out = []
        for view, index in views_to_indices.items():
            with open(os.path.join(self.definitions_path, f"{view}.sql")) as fh:
                sql = fh.read()
            out.append(ViewDef(view, sql=sql, index=index))
        return out

    def index_settings(self, index: str) -> dict | None:
        """Optional ES mappings/settings JSON passthrough ({index}.json,
        reference sinker.py:74-86); None if absent."""
        path = os.path.join(self.definitions_path, f"{index}.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)
