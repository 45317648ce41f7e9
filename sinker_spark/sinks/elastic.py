"""Elasticsearch bulk sink — executor-side, Arrow-batched, import-gated.

Reference analog: ``elasticsearch.helpers.bulk`` with chunk 100 / 5
retries (runner.py:114-115, settings.py:23-41) driven from a single
Python process. Here every *partition* streams its own bulk requests, so
sink throughput scales with executors; per-id idempotence (``index`` +
``delete`` ops) makes micro-batch replays converge.

The ``elasticsearch`` client is not installed in this container, so the
sink raises a clear error at construction unless the package (or an
injected ``bulk_fn``) is available; tests inject a recording ``bulk_fn``
to exercise the full partition-level action-building path.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sinker_spark.ivm import DELETE, UPSERT

DEFAULT_CHUNK = 100  # reference ELASTICSEARCH_CHUNK_SIZE (settings.py:23)
DEFAULT_RETRIES = 5  # reference ELASTICSEARCH_MAX_RETRIES (settings.py:25)


def _actions_for_partition(rows: Iterable, index: str) -> Iterable[dict]:
    for row in rows:
        if row["op"] == UPSERT:
            src = row["doc"]
            yield {
                "_index": index,
                "_id": row["id"],
                "_source": json.loads(src) if isinstance(src, str) else src,
            }
        elif row["op"] == DELETE:
            yield {"_op_type": "delete", "_index": index, "_id": row["id"]}


class ElasticsearchSink:
    def __init__(
        self,
        hosts: list[str] | None = None,
        chunk_size: int = DEFAULT_CHUNK,
        max_retries: int = DEFAULT_RETRIES,
        bulk_fn: Callable[[Iterable[dict]], None] | None = None,
        client_factory: Callable[[], object] | None = None,
        client_kwargs: dict | None = None,
        raise_on_error: bool = True,
        raise_on_exception: bool = True,
    ) -> None:
        """``client_kwargs`` carries the secured-cluster surface
        (``basic_auth``/``verify_certs``/``ssl_show_warn``/
        ``request_timeout`` — EngineConfig.es_client_kwargs, mirroring
        reference es.py:15-25); it is applied to BOTH the driver-side
        admin client and every executor-side bulk client.
        ``raise_on_error`` / ``raise_on_exception`` mirror the
        reference's ELASTICSEARCH_BULK_KWARGS (settings.py:36-41)."""
        self.hosts = hosts or ["http://localhost:9200"]
        self.chunk_size = chunk_size
        self.max_retries = max_retries
        self.client_kwargs = {"request_timeout": 60, **(client_kwargs or {})}
        self.raise_on_error = raise_on_error
        self.raise_on_exception = raise_on_exception
        self._bulk_fn = bulk_fn
        self._client_factory = client_factory
        if bulk_fn is None and client_factory is None:
            try:
                import elasticsearch  # noqa: F401
                import elasticsearch.helpers  # noqa: F401
            except ImportError as e:  # pragma: no cover - env-dependent
                raise RuntimeError(
                    "elasticsearch package not installed; pass bulk_fn= to "
                    "ElasticsearchSink or install the client"
                ) from e

    def _client(self):
        if self._client_factory is not None:
            return self._client_factory()
        from elasticsearch import Elasticsearch  # pragma: no cover

        return Elasticsearch(self.hosts, **self.client_kwargs)  # pragma: no cover

    def recreate_index(self, index: str, body: dict | None = None) -> None:
        """Drop and re-create ``index``, passing through the mappings and
        settings from the user's ``{index}.json`` definition (reference
        sinker.py:74-86; fixture shape tests/fixtures/courses.json —
        ``dynamic: strict`` mappings + shard settings). Driver-side: index
        DDL is a one-shot admin call, not per-partition work."""
        es = self._client()
        es.indices.delete(index=index, ignore_unavailable=True)
        kwargs: dict = {}
        if body:
            if body.get("mappings") is not None:
                kwargs["mappings"] = body["mappings"]
            if body.get("settings") is not None:
                kwargs["settings"] = body["settings"]
        es.indices.create(index=index, **kwargs)

    def apply_actions(self, index: str, actions: DataFrame) -> None:
        """foreachPartition bulk write; docs serialized as JSON strings so
        only Arrow-friendly types cross the JVM→Python boundary."""
        doc_type = dict(actions.dtypes).get("doc")
        id_col = actions.columns[0]
        prepared = actions.select(
            F.col(id_col).cast("string").alias("id"),
            "op",
            (F.col("doc") if doc_type == "string" else F.to_json("doc", {"ignoreNullFields": "false"})).alias("doc"),
        )
        hosts, chunk, retries, bulk_fn = self.hosts, self.chunk_size, self.max_retries, self._bulk_fn
        ckw = dict(self.client_kwargs)  # plain dict: picklable for executors
        roe, rox = self.raise_on_error, self.raise_on_exception

        def write_partition(rows: Iterable) -> None:
            acts = _actions_for_partition(rows, index)
            if bulk_fn is not None:
                bulk_fn(acts)
                return
            from elasticsearch import Elasticsearch  # pragma: no cover
            from elasticsearch.helpers import bulk  # pragma: no cover

            es = Elasticsearch(hosts, **ckw)  # pragma: no cover
            bulk(es, acts, chunk_size=chunk, max_retries=retries,  # pragma: no cover
                 initial_backoff=2, max_backoff=600,
                 raise_on_error=roe, raise_on_exception=rox)

        prepared.foreachPartition(write_partition)
