"""In-memory document sink — the test double for Elasticsearch.

Maintains per-index dict state with the same observable semantics the
reference's tests assert against a real ES (test_e2e.py): idempotent
``index`` upsert by _id, ``delete`` by _id, get-by-id. Collects actions
driver-side — test-only by construction (a real sink writes from
executors; see sinks/elastic.py)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from sinker_spark.ivm import DELETE, UPSERT


class InMemorySink:
    def __init__(self) -> None:
        self.indices: dict[str, dict[str, object]] = {}
        self.index_bodies: dict[str, dict | None] = {}  # recreate_index mappings
        self.action_log: list[tuple[str, str, str]] = []  # (index, op, id)

    def recreate_index(self, index: str, body: dict | None = None) -> None:
        """Delete+create parity with ElasticsearchSink.recreate_index:
        existing docs are dropped, the mapping body is recorded."""
        self.indices[index] = {}
        self.index_bodies[index] = body
        self.action_log.append((index, "recreate", ""))

    def apply_actions(self, index: str, actions: DataFrame) -> None:
        idx = self.indices.setdefault(index, {})
        cols = actions.columns
        for row in actions.collect():
            op = row["op"]
            key = row[cols[0]]
            self.action_log.append((index, op, key))
            if op == UPSERT:
                doc = row["doc"]
                if isinstance(doc, str):
                    doc = json.loads(doc)
                elif hasattr(doc, "asDict"):
                    doc = _row_to_plain(doc)
                idx[key] = doc
            elif op == DELETE:
                idx.pop(key, None)
            else:  # pragma: no cover
                raise ValueError(f"unknown op {op!r}")

    def get(self, index: str, doc_id: str):
        return self.indices.get(index, {}).get(doc_id)

    def ids(self, index: str) -> set[str]:
        return set(self.indices.get(index, {}))


def _row_to_plain(obj):
    if hasattr(obj, "asDict"):
        return {k: _row_to_plain(v) for k, v in obj.asDict().items()}
    if isinstance(obj, list):
        return [_row_to_plain(x) for x in obj]
    return obj
