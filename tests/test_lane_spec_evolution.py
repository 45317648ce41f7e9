"""Lane-spec evolution: editing a view's lane spec (adding a sum,
widening the row schema, adding a group key) leaves stored lane state
without the columns the new spec requires. The fold must DECLINE —
re-deriving state from the live fact would double-apply the batch —
and route through the authoritative fallback, which rebuilds every
lane state under the new spec; the NEXT batch folds again. Semantic
edits that keep column names (a changed sum expression, a changed
value_col) are not schema-detectable and require a manual reset, the
same contract as any view redefinition (reference DROP+CREATE,
sinker.py:100-103) — pinned in SyncEngine._checked_state's docstring."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import (
    AggViewSpec,
    DistinctViewSpec,
    JoinViewSpec,
    TopKViewSpec,
    ViewDef,
)

CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


def _cdc(spark, table, records):
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("id", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


def _agg_view(sums_two: bool):
    def recompute(spark):
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("s1"),
        ]
        fields = ["region", "n_rows", F.col("s1").cast("double").alias("sum_amt")]
        if sums_two:
            aggs.append(F.sum(F.expr("CAST(qty AS DECIMAL(18,2))")).alias("s2"))
            fields.append(F.col("s2").cast("double").alias("sum_qty"))
        served = spark.table("ev_sales").groupBy("region").agg(*aggs)
        return served.select(F.col("region").alias("id"), F.struct(*fields).alias("doc"))

    sums = {"sum_amt": "CAST(amount AS DECIMAL(18,2))"}
    if sums_two:
        sums["sum_qty"] = "CAST(qty AS DECIMAL(18,2))"
    return ViewDef(
        name="ev_agg",
        fn=recompute,
        deps={"ev_sales"},
        agg=AggViewSpec(
            table="ev_sales",
            keys=["region"],
            sums=sums,
            row_schema="id string, region string, amount double, qty double",
        ),
    )


def test_agg_spec_edit_declines_then_refolds(spark, tmp_path):
    spark.createDataFrame(
        [("1", "eu", 10.0, 1.0), ("2", "eu", 20.0, 2.0)],
        "id string, region string, amount double, qty double",
    ).createOrReplaceTempView("ev_sales")
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng1 = SyncEngine(spark, [_agg_view(sums_two=False)], sink, store)
    eng1.backfill()
    assert sink.get("ev_agg", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 30.0}

    # spec edited: a second sum is declared; stored state lacks its columns
    eng2 = SyncEngine(spark, [_agg_view(sums_two=True)], sink, store)
    spark.createDataFrame(
        [("1", "eu", 10.0, 1.0), ("2", "eu", 20.0, 2.0), ("3", "us", 5.0, 7.0)],
        "id string, region string, amount double, qty double",
    ).createOrReplaceTempView("ev_sales")
    eng2.process_cdc_batch(_cdc(spark, "ev_sales", [
        (1, "INSERT", {"id": "3", "region": "us", "amount": 5.0, "qty": 7.0}, None),
    ]))
    stats = eng2.last_stats["ev_agg"]
    assert stats.get("lane_fallback") == 1 and "delta_agg" not in stats
    assert sink.get("ev_agg", "us") == {"region": "us", "n_rows": 1, "sum_amt": 5.0, "sum_qty": 7.0}
    assert sink.get("ev_agg", "eu") == {"region": "eu", "n_rows": 2, "sum_amt": 30.0, "sum_qty": 3.0}

    # rebuilt state carries the new columns: the next batch folds again
    spark.createDataFrame(
        [("1", "eu", 10.0, 1.0), ("2", "eu", 20.0, 2.0), ("3", "us", 5.0, 7.0),
         ("4", "us", 2.0, 1.0)],
        "id string, region string, amount double, qty double",
    ).createOrReplaceTempView("ev_sales")
    eng2.process_cdc_batch(_cdc(spark, "ev_sales", [
        (2, "INSERT", {"id": "4", "region": "us", "amount": 2.0, "qty": 1.0}, None),
    ]))
    assert eng2.last_stats["ev_agg"].get("delta_agg") == 1
    assert sink.get("ev_agg", "us") == {"region": "us", "n_rows": 2, "sum_amt": 7.0, "sum_qty": 8.0}


def _dc_view(two_keys: bool):
    keys = ["region", "tier"] if two_keys else ["region"]

    def recompute(spark):
        served = (
            spark.table("ev_visits")
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_distinct(F.col("user_id")).cast("bigint").alias("n_distinct"),
            )
        )
        gid = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        return served.select(gid.alias("id"), F.struct(*keys, "n_rows", "n_distinct").alias("doc"))

    return ViewDef(
        name="ev_dc",
        fn=recompute,
        deps={"ev_visits"},
        distinct=DistinctViewSpec(
            table="ev_visits",
            keys=keys,
            value_col="user_id",
            row_schema="id string, region string, tier string, user_id bigint",
            exact=True,
        ),
    )


def test_exact_distinct_key_edit_declines_then_refolds(spark, tmp_path):
    spark.createDataFrame(
        [("1", "eu", "gold", 10), ("2", "eu", "free", 10)],
        "id string, region string, tier string, user_id bigint",
    ).createOrReplaceTempView("ev_visits")
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng1 = SyncEngine(spark, [_dc_view(two_keys=False)], sink, store)
    eng1.backfill()
    assert sink.get("ev_dc", "eu") == {"region": "eu", "n_rows": 2, "n_distinct": 1}

    # spec edited: grouping gains the tier key; stored support rows lack it
    eng2 = SyncEngine(spark, [_dc_view(two_keys=True)], sink, store)
    spark.createDataFrame(
        [("1", "eu", "gold", 10), ("2", "eu", "free", 10), ("3", "eu", "free", 11)],
        "id string, region string, tier string, user_id bigint",
    ).createOrReplaceTempView("ev_visits")
    eng2.process_cdc_batch(_cdc(spark, "ev_visits", [
        (1, "INSERT", {"id": "3", "region": "eu", "tier": "free", "user_id": 11}, None),
    ]))
    stats = eng2.last_stats["ev_dc"]
    assert stats.get("lane_fallback") == 1 and "exact_distinct" not in stats
    assert sink.get("ev_dc", "eu|free") == {
        "region": "eu", "tier": "free", "n_rows": 2, "n_distinct": 2,
    }
    # the old single-key doc was retracted by the fallback's delete sweep
    assert sink.get("ev_dc", "eu") is None
    # next batch folds under the new spec
    spark.createDataFrame(
        [("1", "eu", "gold", 10), ("2", "eu", "free", 10), ("3", "eu", "free", 11),
         ("4", "eu", "gold", 12)],
        "id string, region string, tier string, user_id bigint",
    ).createOrReplaceTempView("ev_visits")
    eng2.process_cdc_batch(_cdc(spark, "ev_visits", [
        (2, "INSERT", {"id": "4", "region": "eu", "tier": "gold", "user_id": 12}, None),
    ]))
    assert eng2.last_stats["ev_dc"].get("exact_distinct") == 1
    assert sink.get("ev_dc", "eu|gold") == {
        "region": "eu", "tier": "gold", "n_rows": 2, "n_distinct": 2,
    }


def _topk_view(wide: bool):
    schema = "id string, grp string, score double" + (", label string" if wide else "")

    def recompute(spark):
        from pyspark.sql.window import Window

        w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("id"))
        ranked = (
            spark.table("ev_scores")
            .select(*[c for c in ["id", "grp", "score", "label"] if not (c == "label" and not wide)])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 2)
        )
        docs = ranked.groupBy("grp").agg(
            F.sort_array(F.collect_list(F.struct("rank", "id", "score"))).alias("top")
        )
        return docs.select(F.col("grp").alias("k"), F.struct("grp", "top").alias("doc"))

    return ViewDef(
        name="ev_topk",
        fn=recompute,
        deps={"ev_scores"},
        topk=TopKViewSpec(
            table="ev_scores",
            keys=["grp"],
            order_col="score",
            id_col="id",
            k=2,
            buffer=1,
            row_schema=schema,
        ),
    )


def test_topk_schema_widening_declines_then_refolds(spark, tmp_path):
    spark.createDataFrame(
        [("1", "a", 9.0, "x"), ("2", "a", 8.0, "x")],
        "id string, grp string, score double, label string",
    ).createOrReplaceTempView("ev_scores")
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng1 = SyncEngine(spark, [_topk_view(wide=False)], sink, store)
    eng1.backfill()

    eng2 = SyncEngine(spark, [_topk_view(wide=True)], sink, store)
    spark.createDataFrame(
        [("1", "a", 9.0, "x"), ("2", "a", 8.0, "x"), ("3", "a", 9.5, "y")],
        "id string, grp string, score double, label string",
    ).createOrReplaceTempView("ev_scores")
    eng2.process_cdc_batch(_cdc(spark, "ev_scores", [
        (1, "INSERT", {"id": "3", "grp": "a", "score": 9.5, "label": "y"}, None),
    ]))
    stats = eng2.last_stats["ev_topk"]
    assert stats.get("lane_fallback") == 1 and "topk" not in stats
    top = sink.get("ev_topk", "a")["top"]
    assert [(r["id"], r["score"]) for r in top] == [("3", 9.5), ("1", 9.0)]
    # next batch folds
    spark.createDataFrame(
        [("1", "a", 9.0, "x"), ("2", "a", 8.0, "x"), ("3", "a", 9.5, "y"),
         ("4", "a", 9.9, "y")],
        "id string, grp string, score double, label string",
    ).createOrReplaceTempView("ev_scores")
    eng2.process_cdc_batch(_cdc(spark, "ev_scores", [
        (2, "INSERT", {"id": "4", "grp": "a", "score": 9.9, "label": "y"}, None),
    ]))
    assert eng2.last_stats["ev_topk"].get("topk") == 1
    top = sink.get("ev_topk", "a")["top"]
    assert [(r["id"], r["score"]) for r in top] == [("4", 9.9), ("3", 9.5)]


def _join_view(wide_b: bool):
    b_schema = "region string, mgr string" + (", floor string" if wide_b else "")

    def recompute(spark):
        b = spark.table("ev_dims")
        if not wide_b:
            b = b.select("region", "mgr")
        j = spark.table("ev_rows").join(b, "region")
        fields = ["region", "id", "mgr"] + (["floor"] if wide_b else [])
        return j.select(
            F.col("id").alias("k"),
            F.struct(*fields, F.lit(1).cast("bigint").alias("n_rows")).alias("doc"),
        )

    return ViewDef(
        name="ev_join",
        fn=recompute,
        deps={"ev_rows", "ev_dims"},
        join=JoinViewSpec(
            table_a="ev_rows",
            table_b="ev_dims",
            on=["region"],
            row_schema_a="id string, region string",
            row_schema_b=b_schema,
            key_cols=["id"],
        ),
    )


def test_join_schema_widening_declines_then_refolds(spark, tmp_path):
    spark.createDataFrame(
        [("1", "eu")], "id string, region string"
    ).createOrReplaceTempView("ev_rows")
    spark.createDataFrame(
        [("eu", "ada", "f1")], "region string, mgr string, floor string"
    ).createOrReplaceTempView("ev_dims")
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng1 = SyncEngine(spark, [_join_view(wide_b=False)], sink, store)
    eng1.backfill()
    assert sink.get("ev_join", "1") == {"region": "eu", "id": "1", "mgr": "ada", "n_rows": 1}

    eng2 = SyncEngine(spark, [_join_view(wide_b=True)], sink, store)
    spark.createDataFrame(
        [("1", "eu"), ("2", "eu")], "id string, region string"
    ).createOrReplaceTempView("ev_rows")
    eng2.process_cdc_batch(_cdc(spark, "ev_rows", [
        (1, "INSERT", {"id": "2", "region": "eu"}, None),
    ]))
    stats = eng2.last_stats["ev_join"]
    assert stats.get("lane_fallback") == 1 and "delta_join" not in stats
    assert sink.get("ev_join", "2") == {
        "region": "eu", "id": "2", "mgr": "ada", "floor": "f1", "n_rows": 1,
    }
    # next batch folds under the widened schema
    spark.createDataFrame(
        [("1", "eu"), ("2", "eu"), ("3", "eu")], "id string, region string"
    ).createOrReplaceTempView("ev_rows")
    eng2.process_cdc_batch(_cdc(spark, "ev_rows", [
        (2, "INSERT", {"id": "3", "region": "eu"}, None),
    ]))
    assert eng2.last_stats["ev_join"].get("delta_join") == 1
    assert sink.get("ev_join", "3") == {
        "region": "eu", "id": "3", "mgr": "ada", "floor": "f1", "n_rows": 1,
    }


def _chain_view(agg_mode: bool):
    """Chain view whose two modes share IDENTICAL lane-state schemas
    (relation + join states) but produce different doc shapes/keys —
    the column-presence evolution check cannot tell them apart."""
    from sinker_spark.views import JoinChainViewSpec

    if agg_mode:
        def fn(spark):
            j = spark.table("ev2_sales").join(spark.table("ev2_dims"), "region")
            g = j.groupBy("mgr").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("__s"),
            )
            return g.select(
                F.col("mgr").alias("k"),
                F.struct("mgr", "n_rows", F.col("__s").cast("double").alias("sum_amt")).alias("doc"),
            )

        spec = JoinChainViewSpec(
            tables=["ev2_sales", "ev2_dims"], ons=[["region"]],
            row_schemas=["id string, region string, amount double",
                         "region string, mgr string"],
            keys=["mgr"], sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
        )
    else:
        def fn(spark):
            j = spark.table("ev2_sales").join(spark.table("ev2_dims"), "region")
            g = j.groupBy("region", "id", "amount", "mgr").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows")
            )
            return g.select(
                F.col("id").alias("k"),
                F.struct("region", "id", "amount", "mgr", "n_rows").alias("doc"),
            )

        spec = JoinChainViewSpec(
            tables=["ev2_sales", "ev2_dims"], ons=[["region"]],
            row_schemas=["id string, region string, amount double",
                         "region string, mgr string"],
            key_cols=["id"],
        )
    return ViewDef(name="ev2_chain", fn=fn, key="k",
                   deps={"ev2_sales", "ev2_dims"}, joinchain=spec)


def test_spec_edit_with_compatible_states_retracts_old_docs(spark, tmp_path):
    """Redefining a lane view so its doc SHAPE/KEYS change while the
    stored lane states stay schema-compatible (chain aggregate -> raw
    mode) must decline the fold and route through the fallback — the
    lane-spec fingerprint in the replay marker catches what the
    column-presence check cannot. Without it the old shape's docs stay
    in the sink forever (found by tools/soak_longhaul.py)."""
    spark.createDataFrame(
        [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0)],
        "id string, region string, amount double",
    ).createOrReplaceTempView("ev2_sales")
    spark.createDataFrame(
        [("eu", "m1"), ("us", "m2")], "region string, mgr string"
    ).createOrReplaceTempView("ev2_dims")
    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng1 = SyncEngine(spark, [_chain_view(agg_mode=True)], sink, store)
    eng1.backfill()
    assert set(sink.ids("ev2_chain")) == {"m1", "m2"}

    # redefinition: raw mode — same state schemas, different doc keys
    eng2 = SyncEngine(spark, [_chain_view(agg_mode=False)], sink, store,
                      on_schema_change="reset")
    spark.createDataFrame(
        [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0), ("4", "us", 2.0)],
        "id string, region string, amount double",
    ).createOrReplaceTempView("ev2_sales")
    eng2.process_cdc_batch(_cdc(spark, "ev2_sales", [
        (1, "INSERT", {"id": "4", "region": "us", "amount": 2.0}, None),
    ]))
    # old aggregate docs must be retracted, new per-row docs present
    assert set(sink.ids("ev2_chain")) == {"1", "2", "3", "4"}
    stats = eng2.last_stats["ev2_chain"]
    assert stats.get("lane_fallback") == 1

    # and the NEXT batch folds again under the new spec
    spark.createDataFrame(
        [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0), ("4", "us", 2.0),
         ("5", "eu", 1.0)],
        "id string, region string, amount double",
    ).createOrReplaceTempView("ev2_sales")
    eng2.process_cdc_batch(_cdc(spark, "ev2_sales", [
        (2, "INSERT", {"id": "5", "region": "eu", "amount": 1.0}, None),
    ]))
    assert set(sink.ids("ev2_chain")) == {"1", "2", "3", "4", "5"}
    assert eng2.last_stats["ev2_chain"].get("join_chain") == 1


def test_redefined_view_heals_without_dep_traffic(spark, tmp_path):
    """A redefined lane view must heal even when the batch touches NONE
    of its dependency tables: the engine checks every view's stored
    replay-marker fingerprint against the current definition once per
    lifetime and force-routes mismatches through the fallback. Without
    this, a redefinition whose deps never see traffic serves the OLD
    definition's documents forever (found by tools/soak_longhaul.py:
    an evolution step followed by batches that only touched other
    views' tables)."""
    spark.createDataFrame(
        [("1", "eu", 10.0), ("2", "eu", 20.0), ("3", "us", 5.0)],
        "id string, region string, amount double",
    ).createOrReplaceTempView("ev2_sales")
    spark.createDataFrame(
        [("eu", "m1"), ("us", "m2")], "region string, mgr string"
    ).createOrReplaceTempView("ev2_dims")
    spark.createDataFrame(
        [("x1", "a")], "id string, tag string"
    ).createOrReplaceTempView("ev3_other")

    def other_view():
        def fn(spark):
            return spark.table("ev3_other").select(
                F.col("id"), F.struct("id", "tag").alias("doc")
            )
        return ViewDef(name="ev3_view", fn=fn, deps={"ev3_other"})

    sink = InMemorySink()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    eng1 = SyncEngine(spark, [_chain_view(agg_mode=True), other_view()], sink, store)
    eng1.backfill()
    assert set(sink.ids("ev2_chain")) == {"m1", "m2"}

    # redefinition adopted by a FRESH engine; the only batch traffic is
    # the OTHER view's table — ev2_chain's deps see nothing
    eng2 = SyncEngine(spark, [_chain_view(agg_mode=False), other_view()], sink, store,
                      on_schema_change="reset")
    spark.createDataFrame(
        [("x1", "a"), ("x2", "b")], "id string, tag string"
    ).createOrReplaceTempView("ev3_other")
    eng2.process_cdc_batch(_cdc(spark, "ev3_other", [
        (1, "INSERT", {"id": "x2", "tag": "b"}, None),
    ]))
    # the redefined view healed anyway: aggregate docs retracted,
    # per-row docs served
    assert set(sink.ids("ev2_chain")) == {"1", "2", "3"}
    assert eng2.last_stats["ev2_chain"].get("lane_fallback") == 1
    # the check runs once per lifetime: the next unrelated batch does
    # NOT re-route the healed view
    spark.createDataFrame(
        [("x1", "a"), ("x2", "b"), ("x3", "c")], "id string, tag string"
    ).createOrReplaceTempView("ev3_other")
    eng2.process_cdc_batch(_cdc(spark, "ev3_other", [
        (2, "INSERT", {"id": "x3", "tag": "c"}, None),
    ]))
    assert "ev2_chain" not in eng2.last_stats or \
        eng2.last_stats["ev2_chain"].get("lane_fallback") == 1
