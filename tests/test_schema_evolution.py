"""Doc-schema evolution across all three snapshot stores (ivm.py,
ivm_bucketed.py, ivm_manifest.py): a compatible field-add refresh
re-emits every document; a breaking change (remove/retype) raises
loudly with the reset+backfill remediation (reference parity: DROP +
CREATE MATERIALIZED VIEW, sinker.py:100-103); partial refreshes refuse
ANY schema change; the manifest store records the schema version per
commit."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SchemaEvolutionError, SnapshotStore, check_doc_schema_evolution
from sinker_spark.ivm_bucketed import BucketedSnapshotStore
from sinker_spark.ivm_manifest import ManifestSnapshotStore


def _docs_v1(spark):
    return spark.createDataFrame([("a", 1), ("b", 2)], "id string, x int").select(
        "id", F.struct("x").alias("doc")
    )


def _docs_v2_added(spark):  # adds doc.y — compatible
    return spark.createDataFrame(
        [("a", 1, "p"), ("b", 2, "q")], "id string, x int, y string"
    ).select("id", F.struct("x", "y").alias("doc"))


def _docs_v3_retyped(spark):  # doc.x int -> string — breaking
    return spark.createDataFrame([("a", "1")], "id string, x string").select(
        "id", F.struct("x").alias("doc")
    )


def _docs_v4_removed(spark):  # drops doc.x — breaking
    return spark.createDataFrame([("a", "p")], "id string, y string").select(
        "id", F.struct("y").alias("doc")
    )


STORES = {
    "plain": lambda spark, p: SnapshotStore(spark, p),
    "bucketed": lambda spark, p: BucketedSnapshotStore(spark, p, n_buckets=4),
    "manifest": lambda spark, p: ManifestSnapshotStore(spark, p, n_buckets=4),
}


@pytest.mark.parametrize("kind", sorted(STORES))
def test_compatible_field_add_reemits_all_docs(spark, tmp_path, kind):
    store = STORES[kind](spark, str(tmp_path / kind))
    store.write("v", _docs_v1(spark))
    delta = store.refresh("v", _docs_v2_added(spark)).collect()
    # every doc changed shape -> every key upserts, nothing deletes
    assert sorted((r["id"], r["op"]) for r in delta) == [("a", "upsert"), ("b", "upsert")]
    got = {r["id"]: r["doc"].asDict() for r in store.read("v").select("id", "doc").collect()}
    assert got == {"a": {"x": 1, "y": "p"}, "b": {"x": 2, "y": "q"}}


@pytest.mark.parametrize("kind", sorted(STORES))
@pytest.mark.parametrize("breaking", ["retyped", "removed"])
def test_breaking_change_raises_with_remediation(spark, tmp_path, kind, breaking):
    store = STORES[kind](spark, str(tmp_path / kind))
    store.write("v", _docs_v1(spark))
    bad = _docs_v3_retyped(spark) if breaking == "retyped" else _docs_v4_removed(spark)
    with pytest.raises(SchemaEvolutionError, match="reset.*backfill|backfill.*reset"):
        store.refresh("v", bad)
    # remediation actually works: reset -> full write succeeds
    store.reset("v")
    store.write("v", bad)
    assert store.read("v").count() == 1


@pytest.mark.parametrize("kind", sorted(STORES))
def test_partial_refresh_refuses_any_schema_change(spark, tmp_path, kind):
    store = STORES[kind](spark, str(tmp_path / kind))
    store.write("v", _docs_v1(spark))
    scoped = _docs_v2_added(spark).where("id = 'a'")
    with pytest.raises(SchemaEvolutionError, match="full refresh"):
        store.refresh_partial("v", scoped, scope_keys=scoped.select("id"))


def test_manifest_records_schema_version_per_commit(spark, tmp_path):
    store = ManifestSnapshotStore(spark, str(tmp_path / "m"), n_buckets=4)
    store.write("v", _docs_v1(spark))
    store.refresh("v", _docs_v1(spark))  # same schema: version stays
    store.refresh("v", _docs_v2_added(spark))  # field-add: bumps

    def manifest(version):
        with open(os.path.join(str(tmp_path / "m"), "v", "_manifests", f"v_{version}.json")) as fh:
            return json.load(fh)

    m1, m2, m3 = manifest(1), manifest(2), manifest(3)
    assert m1["schema_version"] == 1 and m2["schema_version"] == 1
    assert m3["schema_version"] == 2
    assert '"y"' in m3["doc_schema"] and '"y"' not in m1["doc_schema"]
    # partial refresh after the bump carries the schema forward unchanged
    scoped = _docs_v2_added(spark).where("id = 'a'")
    store.refresh_partial("v", scoped, scope_keys=scoped.select("id"))
    m4 = manifest(4)
    assert m4["schema_version"] == 2 and m4["doc_schema"] == m3["doc_schema"]


def test_checker_handles_nested_and_nullability():
    from pyspark.sql import types as T

    base = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField(
                "items", T.ArrayType(T.StructType([T.StructField("q", T.LongType())]))
            ),
        ]
    )
    nested_add = T.StructType(
        [
            T.StructField("a", T.IntegerType(), nullable=False),  # nullability ignored
            T.StructField(
                "items",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("q", T.LongType()), T.StructField("p", T.StringType())]
                    )
                ),
            ),
        ]
    )
    assert check_doc_schema_evolution("v", base, base) is False
    assert check_doc_schema_evolution("v", base, nested_add) is True
    nested_retype = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField(
                "items", T.ArrayType(T.StructType([T.StructField("q", T.StringType())]))
            ),
        ]
    )
    with pytest.raises(SchemaEvolutionError, match=r"items\[\]\.q"):
        check_doc_schema_evolution("v", base, nested_retype)


def test_engine_schema_change_policy(spark, tmp_path):
    """SyncEngine policy on a breaking view redefinition: 'fail'
    re-raises SchemaEvolutionError; 'reset' drops the snapshot and
    re-backfills in place (reference DROP + CREATE MATERIALIZED VIEW,
    sinker.py:100-103) — the sink converges to the new doc shape."""
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.views import ViewDef

    spark.createDataFrame(
        [("p-1", "John", 30), ("p-2", "Ann", 40)], "id string, name string, age int"
    ).createOrReplaceTempView("person_se")
    v_old = ViewDef(
        "mv_se", sql="select id, json_build_object('name', name) as d from person_se", index="people_se"
    )
    # breaking (name retyped) AND narrowing (p-2 dropped): the reset path
    # must both re-emit p-1 in the new shape and DELETE p-2's old-schema
    # ghost from the sink
    v_new_breaking = ViewDef(
        "mv_se",
        sql="select id, json_build_object('name', age) as d from person_se where id = 'p-1'",
        index="people_se",
    )

    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng = SyncEngine(spark, [v_old], sink, store)
    eng.backfill()
    assert sink.get("people_se", "p-1")["name"] == "John"
    assert sink.get("people_se", "p-2")["name"] == "Ann"

    # 'fail' (default): breaking redefinition raises
    eng_fail = SyncEngine(spark, [v_new_breaking], sink, store)
    with pytest.raises(SchemaEvolutionError):
        eng_fail.backfill()

    # 'reset': drop + re-backfill, sink converges — including the delete
    # of the key the redefined view no longer produces
    eng_reset = SyncEngine(spark, [v_new_breaking], sink, store, on_schema_change="reset")
    eng_reset.backfill()
    assert sink.get("people_se", "p-1")["name"] == 30
    assert sink.get("people_se", "p-2") is None
    assert eng_reset.last_stats["mv_se"] == {"upserts": 1, "deletes": 1}

    with pytest.raises(ValueError, match="on_schema_change"):
        SyncEngine(spark, [v_old], sink, store, on_schema_change="bogus")


def test_targeted_lane_escalates_on_schema_change(spark, tmp_path):
    """A schema-changing redefinition hitting the TARGETED lane first
    (affected-keys hook) must not splice mixed-schema rows: 'fail'
    re-raises; 'reset' escalates to the full-refresh lane (compatible
    add folds as full re-emit; breaking change resets + re-backfills)."""
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.views import ViewDef

    spark.createDataFrame(
        [("p-1", "John", 30), ("p-2", "Ann", 40)], "id string, name string, age int"
    ).createOrReplaceTempView("person_tse")
    v_old = ViewDef(
        "mv_tse", sql="select id, json_build_object('name', name) as d from person_tse", index="i_tse"
    )
    # field-add: compatible for full refresh, illegal for targeted merge
    v_added = ViewDef(
        "mv_tse",
        sql="select id, json_build_object('name', name, 'age', age) as d from person_tse",
        index="i_tse",
    )
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    SyncEngine(spark, [v_old], sink, store).backfill()

    scope = spark.createDataFrame([("p-1",)], "id string")
    eng_fail = SyncEngine(spark, [v_added], sink, store)
    with pytest.raises(SchemaEvolutionError, match="full refresh"):
        eng_fail._targeted_refresh_one(v_added, scope, epoch_id=0)

    eng_reset = SyncEngine(spark, [v_added], sink, store, on_schema_change="reset")
    eng_reset._targeted_refresh_one(v_added, scope, epoch_id=0)
    # escalated to full refresh: BOTH docs re-emitted in the new shape
    assert sink.get("i_tse", "p-1")["age"] == 30
    assert sink.get("i_tse", "p-2")["age"] == 40
