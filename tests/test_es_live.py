"""Env-gated LIVE Elasticsearch integration — the last e2e parity gap
with reference test_e2e.py:60-171 (which runs against dockerized
Postgres 17 + ES 8.17).

Skipped unless BOTH hold:
- ``SINKER_SPARK_ES_URL`` points at a reachable Elasticsearch
- the ``elasticsearch`` client package is importable

Covers the reference's full scenario against a real cluster: index
(re)create with ``dynamic: strict`` mappings, backfill golden docs,
update propagation person→student→enrollment→course, cascade delete —
through the executor-side bulk sink (no injected bulk_fn)."""

from __future__ import annotations

import os
import uuid

import pytest

ES_URL = os.environ.get("SINKER_SPARK_ES_URL")

es_client = None
if ES_URL:
    try:
        import elasticsearch

        es_client = elasticsearch.Elasticsearch(ES_URL, request_timeout=30)
        if not es_client.ping():  # pragma: no cover - env-dependent
            es_client = None
    except Exception:  # pragma: no cover - env-dependent
        es_client = None

pytestmark = pytest.mark.skipif(
    es_client is None,
    reason="live ES integration needs SINKER_SPARK_ES_URL and the elasticsearch package",
)

PEOPLE_MAPPINGS = {
    "mappings": {"dynamic": "strict", "properties": {"name": {"type": "text"}}},
    "settings": {"index": {"number_of_shards": "1", "number_of_replicas": "0"}},
}


@pytest.fixture()
def engine(spark, tmp_path):  # pragma: no cover - env-gated
    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.elastic import ElasticsearchSink
    from sinker_spark.views import ViewDef

    from tests import school_fixtures as fx

    suffix = uuid.uuid4().hex[:8]
    people, courses = f"people_it_{suffix}", f"courses_it_{suffix}"
    fx.register(spark, str(tmp_path / "tables"))
    views = [
        ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index=people),
        ViewDef("course_mv", sql=fx.COURSE_MV_SQL, index=courses),
    ]
    sink = ElasticsearchSink(hosts=[ES_URL])
    eng = SyncEngine(spark, views, sink, SnapshotStore(spark, str(tmp_path / "snap")))
    yield eng, people, courses, fx, tmp_path
    for index in (people, courses):
        es_client.indices.delete(index=index, ignore_unavailable=True)


def _refresh(*indices):  # pragma: no cover - env-gated
    for i in indices:
        es_client.indices.refresh(index=i)


def _cdc(spark, records):  # pragma: no cover - env-gated
    return spark.createDataFrame(
        [(lsn, "public", t, op, i, None) for lsn, t, op, i in records],
        "lsn bigint, schema string, table string, op string, id string, payload string",
    )


def test_live_backfill_update_cascade_delete(spark, engine):  # pragma: no cover - env-gated
    eng, people, courses, fx, tmp_path = engine

    # setup: recreate with strict mappings (reference sinker.py:74-86)
    eng.backfill(index_bodies={people: PEOPLE_MAPPINGS, courses: None})
    _refresh(people, courses)
    got = es_client.get(index=courses, id="c-1")["_source"]
    assert got == fx.GOLDEN_C1
    mapping = es_client.indices.get_mapping(index=people)[people]["mappings"]
    assert mapping["dynamic"] == "strict"

    # update propagates person → … → course (reference test_e2e.py:99-138)
    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-1", "Jane") if r[0] == "p-1" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(_cdc(spark, [(1, "person", "UPDATE", "p-1")]))
    _refresh(people, courses)
    assert es_client.get(index=people, id="p-1")["_source"]["name"] == "Jane"
    c1 = es_client.get(index=courses, id="c-1")["_source"]
    assert any(e["student"]["person"]["name"] == "Jane" for e in c1["enrollments"])

    # cascade delete (reference test_e2e.py:141-171)
    rows["person"] = [r for r in rows["person"] if r[0] != "p-1"]
    rows["student"] = [r for r in rows["student"] if r[1] != "p-1"]
    rows["enrollment"] = [r for r in rows["enrollment"] if r[1] != "s-1"]
    fx.register(spark, str(tmp_path / "tables"), rows)
    eng.process_cdc_batch(
        _cdc(spark, [(2, "person", "DELETE", "p-1"), (3, "student", "DELETE", "s-1"),
                     (4, "enrollment", "DELETE", "e-1")])
    )
    _refresh(people, courses)
    import elasticsearch

    with pytest.raises(elasticsearch.NotFoundError):
        es_client.get(index=people, id="p-1")
    c1 = es_client.get(index=courses, id="c-1")["_source"]
    assert all(e["student"]["person"]["name"] != "Jane" for e in c1["enrollments"])
