"""sinker_spark — a PySpark-native analytics/sync engine with the query and
data-processing capabilities of ``paradigmxyz/sinker`` (reference at
/root/reference, studied for behavior only; no code copied).

The reference is an incremental-materialized-view + CDC + sink middleware:
users declare SQL views producing ``(id, doc)`` documents; the engine
materializes them, watches source tables for changes, incrementally
refreshes, and syncs upserts/deletes to Elasticsearch
(reference README.md:11-15, src/sinker/*.py — ~500 LoC total).

This package re-expresses those capabilities Spark-first:

- **Query layer**: the full SQL surface of view definitions runs on Spark
  SQL / Catalyst (``spark.sql`` after a small Postgres→Spark dialect
  fixup, :mod:`sinker_spark.compiler`).
- **Materialization + IVM**: keyed snapshot tables + snapshot-diff
  (:mod:`sinker_spark.ivm`) replace ``REFRESH MATERIALIZED VIEW
  CONCURRENTLY`` (reference query_templates.py:13).
- **Streaming sync**: Structured Streaming over a CDC source with
  ``foreachBatch`` dirty-set → recompute → diff → sink
  (:mod:`sinker_spark.runner`), replacing the trigger/todo/poll loop
  (reference runner.py:68-117).
- **Sinks**: idempotent per-id upsert/delete bulk sinks
  (:mod:`sinker_spark.sinks`), replacing ``elasticsearch.helpers.bulk``
  (reference runner.py:114-115).
- **Scale extensions**: dedup / similarity / text-analysis / multimodal
  operators for large-scale training-data pipelines
  (:mod:`sinker_spark.operators`).

Everything is DataFrame/SQL-declarative so Catalyst + AQE own the physical
plan; Python UDFs appear only where Spark genuinely lacks the operator, and
then only as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from sinker_spark.session import get_spark  # noqa: F401
from sinker_spark.catalog import TABLES, load_tables, register_views  # noqa: F401
