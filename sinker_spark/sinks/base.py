"""Sink protocol: idempotent per-id upsert/delete of JSON documents.

Reference analog: Elasticsearch bulk actions — ``index`` (insert-or-
overwrite by _id, idempotent last-write-wins) and ``delete``
(bulk_action_generator.py:60-90). Idempotence by key is what upgrades
Spark's at-least-once replay (checkpointed offsets) into effectively
exactly-once end-to-end — strictly better than the reference's
destructive slot read, which is at-most-once on the tail (SURVEY.md §2
streaming table).
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame


class DocumentSink(Protocol):
    def apply_actions(self, index: str, actions: DataFrame) -> None:
        """Apply a (id STRING, op STRING, doc) actions DataFrame to ``index``.

        op ∈ {upsert, delete}; doc may be a struct or JSON string, null
        for deletes. Implementations must be idempotent per (index, id):
        re-applying the same actions must converge to the same state.
        """
        ...
