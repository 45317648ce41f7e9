"""IVM refresh-latency bench: the engine's headline value is per-batch
maintenance cost, not read-query latency — this module measures it so the
per-round bench artifact carries it (BENCH_r{N}.json "ivm" section)
instead of prose in PERF.md.

Three figures, all wall-clock end-to-end through the engine
(``SyncEngine.process_cdc_batch``: lane guard -> state fold -> reverse-
index walk -> doc serve -> snapshot merge -> sink write):

- ``seed_s``          one-time backfill of the flagship doc-tree view
                      (per-key state frames + every doc served once)
- ``fold_batch_s``    ONE mixed 1000-row CDC batch folded into that
                      state: parent inserts+deletes, child-array
                      inserts+deletes, dim renames at every level of the
                      chain (customer / nation / part) — the doc-tree
                      lane chases each through its stored reverse index,
                      so cost is O(|batch| * fan-out), never a rescan
- ``targeted_10key_s`` a 10-key id-only CDC batch against a PLAIN SQL
                      view (course_mv shape: correlated scalar subquery
                      + json_agg array) maintained by the auto-derived
                      correlation-tree hook: recompute scoped to the 10
                      parent keys (IN-filter pushed to the parent scan),
                      merged into the snapshot

The view shape mirrors tests/test_doctree_engine.py (reference
course_mv.sql:1-26 — parent + to-one dim chain + child array with
per-element dim lookups) over the real sf tables, so the numbers track
the code paths the gate queries certify.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

O_SCHEMA = "okey bigint, cust bigint"
C_SCHEMA = "ckey bigint, cname string, nkey bigint"
N_SCHEMA = "natkey bigint, nname string"
L_SCHEMA = "lokey bigint, line bigint, qty double, pkey bigint"
P_SCHEMA = "partkey bigint, pname string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)


class _NoopSink:
    """Executor-side termination without driver materialization — the
    same ``noop`` datasource bench.py uses for the read queries, so the
    sink cost measured is 'full pipeline execution', not a driver
    collect (a production sink writes from executors; sinks/elastic.py)."""

    def apply_actions(self, index: str, actions: DataFrame) -> None:
        actions.write.format("noop").mode("overwrite").save()


def _register(spark: SparkSession, sf_dir: str) -> None:
    from sinker_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("cust")
    ).createOrReplaceTempView("bi_orders")
    t["customer"].select(
        F.col("c_custkey").alias("ckey"), F.col("c_name").alias("cname"),
        F.col("c_nationkey").alias("nkey"),
    ).createOrReplaceTempView("bi_cust")
    t["nation"].select(
        F.col("n_nationkey").alias("natkey"), F.col("n_name").alias("nname")
    ).createOrReplaceTempView("bi_nation")
    t["lineitem"].select(
        F.col("l_orderkey").alias("lokey"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_partkey").alias("pkey"),
    ).createOrReplaceTempView("bi_lines")
    t["part"].select(
        F.col("p_partkey").alias("partkey"), F.col("p_name").alias("pname")
    ).createOrReplaceTempView("bi_part")


def _doctree_view():
    from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec, ViewDef

    def recompute(spark: SparkSession) -> DataFrame:
        o = spark.table("bi_orders")
        c = spark.table("bi_cust")
        n = spark.table("bi_nation")
        li = spark.table("bi_lines")
        p = spark.table("bi_part")
        elem = li.join(p, li["pkey"] == p["partkey"], "left").drop("partkey")
        pair = F.struct(
            F.col("line").alias("__o0"), F.col("qty").alias("__o1"),
            F.col("pkey").alias("__o2"),
            F.struct("line", "qty", "pkey", "pname").alias("__c"),
        )
        arrays = elem.groupBy("lokey").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("items")
        )
        cur = (
            o.join(c, o["cust"] == c["ckey"], "inner").drop("ckey")
            .join(n, F.col("nkey") == n["natkey"], "inner").drop("natkey")
            .join(arrays, F.col("okey") == F.col("lokey"), "left").drop("lokey")
        )
        arr_type = cur.schema["items"].dataType
        cur = cur.withColumn("items", F.coalesce(F.col("items"), F.array().cast(arr_type)))
        return cur.select(
            F.col("okey").cast("string").alias("k"),
            F.struct("okey", "cust", "cname", "nkey", "nname", "items").alias("doc"),
        )

    return ViewDef(
        name="bi_doc", fn=recompute, key="k", index="bi_doc",
        deps={"bi_orders", "bi_cust", "bi_nation", "bi_lines", "bi_part"},
        doctree=DocTreeViewSpec(
            parent_table="bi_orders", key="okey", row_schema_parent=O_SCHEMA,
            dims=[
                DimLookup("bi_cust", fk="cust", key="ckey", row_schema=C_SCHEMA),
                DimLookup("bi_nation", fk="nkey", key="natkey", row_schema=N_SCHEMA),
            ],
            children=[
                ChildArraySpec(
                    table="bi_lines", fk="lokey", row_schema=L_SCHEMA,
                    alias="items", order=["line", "qty", "pkey"],
                    dims=[DimLookup("bi_part", fk="pkey", key="partkey",
                                    row_schema=P_SCHEMA)],
                )
            ],
        ),
    )


def _cdc_row(lsn: int, table: str, op: str, after, before):
    key = next(iter((after or before or {"?": "?"}).values()))
    return (
        lsn, "public", table, op, str(key),
        json.dumps(after) if after is not None else None,
        json.dumps(before) if before is not None else None,
    )


def _mixed_batch(spark: SparkSession) -> DataFrame:
    """1000 CDC rows touching every constituent table: 200 parent
    inserts / 100 parent deletes / 300 child inserts / 100 child
    deletes / 248 customer renames / 50 part renames / 2 nation renames
    (the top-of-chain fan-out case: each reaches every doc in that
    nation through the stored reverse indexes)."""
    rows: list[tuple] = []
    lsn = 0

    def nxt() -> int:
        nonlocal lsn
        lsn += 1
        return lsn

    custs = [r["ckey"] for r in spark.table("bi_cust").limit(200).collect()]
    for i in range(200):
        rows.append(_cdc_row(nxt(), "bi_orders", "INSERT",
                             {"okey": 10_000_000 + i, "cust": custs[i % len(custs)]}, None))
    for r in spark.table("bi_orders").where(F.col("okey") % 97 == 0).limit(100).collect():
        rows.append(_cdc_row(nxt(), "bi_orders", "DELETE", None,
                             {"okey": r["okey"], "cust": r["cust"]}))
    okeys = [r["okey"] for r in spark.table("bi_orders")
             .where(F.col("okey") % 101 == 3).limit(100).collect()]
    parts = [r["partkey"] for r in spark.table("bi_part").limit(100).collect()]
    for j in range(300):
        rows.append(_cdc_row(nxt(), "bi_lines", "INSERT",
                             {"lokey": okeys[j % len(okeys)], "line": 900 + j // len(okeys),
                              "qty": 1.0 + (j % 5), "pkey": parts[j % len(parts)]}, None))
    for r in spark.table("bi_lines").where((F.col("lokey") + F.col("line")) % 113 == 0).limit(100).collect():
        rows.append(_cdc_row(nxt(), "bi_lines", "DELETE", None,
                             {"lokey": r["lokey"], "line": r["line"],
                              "qty": r["qty"], "pkey": r["pkey"]}))
    for r in spark.table("bi_cust").where(F.col("ckey") % 59 == 0).limit(248).collect():
        before = {"ckey": r["ckey"], "cname": r["cname"], "nkey": r["nkey"]}
        rows.append(_cdc_row(nxt(), "bi_cust", "UPDATE", {**before, "cname": r["cname"] + "*"}, before))
    for r in spark.table("bi_part").where(F.col("partkey") % 389 == 0).limit(50).collect():
        before = {"partkey": r["partkey"], "pname": r["pname"]}
        rows.append(_cdc_row(nxt(), "bi_part", "UPDATE", {**before, "pname": r["pname"] + "*"}, before))
    for r in spark.table("bi_nation").limit(2).collect():
        before = {"natkey": r["natkey"], "nname": r["nname"]}
        rows.append(_cdc_row(nxt(), "bi_nation", "UPDATE", {**before, "nname": r["nname"] + "*"}, before))
    return spark.createDataFrame(rows, CDC_COLS)


# course_mv shape over the real tables: to-one chain via a correlated
# scalar subquery + child array via correlated json_agg — exactly the
# view class the correlation-tree hook auto-targets (compiler/correlate;
# reference course_mv.sql:1-26). The bs_* views expose string keys and a
# literal ``id`` parent key column, matching the reference MV convention
# _selects_parent_id verifies (person_mv.sql:1).
_SQL_VIEW = """
SELECT id,
       json_build_object(
         'okey', id,
         'customer', (SELECT json_build_object('name', cname)
                      FROM bs_cust WHERE bs_cust.id = cust),
         'items', (SELECT json_agg(json_build_object('line', line, 'qty', qty))
                   FROM bs_lines WHERE bs_lines.lokey = bs_orders.id)
       ) AS doc
FROM bs_orders
"""


def _register_sql_tables(spark: SparkSession, sf_dir: str) -> None:
    """Every table exposes an ``id`` row-key column (string), matching
    the reference schema convention the correlation-tree hook's schema
    validation requires (schema.sql: every table's PK is ``id``)."""
    from sinker_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_custkey").cast("string").alias("cust"),
    ).createOrReplaceTempView("bs_orders")
    t["customer"].select(
        F.col("c_custkey").cast("string").alias("id"),
        F.col("c_name").alias("cname"),
    ).createOrReplaceTempView("bs_cust")
    t["lineitem"].select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").cast("string").alias("lokey"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("double").alias("qty"),
    ).createOrReplaceTempView("bs_lines")


def run(spark: SparkSession, sf_dir: str) -> dict:
    """Returns the IVM bench dict embedded in the bench artifact."""
    import shutil
    import tempfile

    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.runner import SyncEngine
    from sinker_spark.views import ViewDef

    _register(spark, sf_dir)
    out: dict = {}
    root = tempfile.mkdtemp(prefix="bench_ivm_")
    try:
        import os

        def _doctree_cycle(snap_root: str) -> tuple[float, float, dict]:
            """One seed + one mixed 1k-row fold against a fresh root;
            returns (seed_s, fold_s, lane stats)."""
            eng = SyncEngine(spark, [_doctree_view()], _NoopSink(),
                             SnapshotStore(spark, snap_root))
            t0 = time.perf_counter()
            eng.backfill()
            seed_s = round(time.perf_counter() - t0, 3)
            batch = _mixed_batch(spark)
            batch.count()  # materialize the plan so the fold timing is the fold
            os.environ["SINKER_SPARK_LANE_TIMING"] = "1"
            try:
                t0 = time.perf_counter()
                eng.process_cdc_batch(batch, epoch_id=1)
                fold_s = round(time.perf_counter() - t0, 3)
            finally:
                os.environ.pop("SINKER_SPARK_LANE_TIMING", None)
            return seed_s, fold_s, eng.last_stats.get("bi_doc", {})

        # --- doc-tree lane: seed + one mixed 1k-row fold ---
        # The fold executes ONCE per cycle (state is consumed), so unlike
        # the read queries it has no settle loop to shed a load
        # transient; run the whole cycle N times (fresh root each) and
        # report the min — the same min-of-passes estimator the headline
        # uses. Both series are recorded so an inflated run is visible.
        reps = max(1, int(os.environ.get("SINKER_BENCH_FOLD_REPS", "2")))
        seeds: list[float] = []
        folds: list[float] = []
        stats_by_fold: list[dict] = []
        for i in range(reps):
            seed_s, fold_s, stats = _doctree_cycle(root + f"/snap_dt{i}")
            seeds.append(seed_s)
            folds.append(fold_s)
            stats_by_fold.append(stats)
        best = folds.index(min(folds))
        stats = stats_by_fold[best]
        out["seed_s"] = min(seeds)
        out["fold_batch_s"] = folds[best]
        if reps > 1:
            out["seed_s_runs"] = seeds
            out["fold_batch_s_runs"] = folds
        if stats.get("phases"):
            out["fold_phases"] = stats["phases"]
        out["fold_lane"] = "doc_tree" if stats.get("doc_tree") else "fallback"
        out["fold_upserts"] = int(stats.get("upserts", 0))
        out["fold_deletes"] = int(stats.get("deletes", 0))
        out["fold_batch_rows"] = 1000

        # --- targeted refresh: 10 parent keys against the SQL view ---
        # same min-of-N estimator as the doc-tree cycle above (and the
        # headline's min-of-warm-passes): the single-shot numbers were
        # the artifact's last remaining one-sample figures, so one CPU-
        # steal wave recorded as the round's seed/targeted number. Both
        # series are recorded so an inflated run stays visible.
        _register_sql_tables(spark, sf_dir)
        ten = [r["id"] for r in spark.table("bs_orders").limit(10).collect()]
        cdc10_rows = [
            (i + 1, "public", "bs_orders", "UPDATE", k, None, None)
            for i, k in enumerate(ten)
        ]
        sql_seeds: list[float] = []
        targeteds: list[float] = []
        lanes: list[str] = []
        for i in range(reps):
            sql_view = ViewDef("bi_sqlmv", sql=_SQL_VIEW, index="bi_sqlmv")
            eng2 = SyncEngine(spark, [sql_view], _NoopSink(),
                              SnapshotStore(spark, root + f"/snap_sql{i}"))
            t0 = time.perf_counter()
            eng2.backfill()
            sql_seeds.append(round(time.perf_counter() - t0, 3))
            cdc10 = spark.createDataFrame(cdc10_rows, CDC_COLS)
            t0 = time.perf_counter()
            eng2.process_cdc_batch(cdc10, epoch_id=1)
            targeteds.append(round(time.perf_counter() - t0, 3))
            lanes.append(
                "targeted"
                if eng2.last_stats.get("bi_sqlmv", {}).get("targeted")
                else "full"
            )
        out["sql_seed_s"] = min(sql_seeds)
        best_t = targeteds.index(min(targeteds))
        out["targeted_10key_s"] = targeteds[best_t]
        out["targeted_lane"] = lanes[best_t]
        if reps > 1:
            out["sql_seed_s_runs"] = sql_seeds
            out["targeted_10key_s_runs"] = targeteds
        # --- sf1 scale-up point (SCALING.md's O(Δ) claim as a
        # measurement): the SAME doc-tree view and the SAME 1000-row
        # batch against 10× the data (tools/gen_sf1 replicates sf0.1
        # with key remapping, cached per container). seed_s should grow
        # ~10×; fold_batch_s should stay near-flat — per-batch cost is
        # O(|Δ|·fan-out) with bucket-pruned state I/O, not O(N).
        # SINKER_BENCH_SF1=0 skips (e.g. a time-boxed probe run).
        if (
            os.environ.get("SINKER_BENCH_SF1", "1") != "0"
            and sf_dir.rstrip("/").endswith("sf0.1")
        ):
            try:
                sys_tools = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools",
                )
                import sys as _sys

                if sys_tools not in _sys.path:
                    _sys.path.insert(0, sys_tools)
                import gen_sf1

                sf1_dir = gen_sf1.generate()
                _register(spark, sf1_dir)
                sf1: dict = {}
                eng3 = SyncEngine(spark, [_doctree_view()], _NoopSink(),
                                  SnapshotStore(spark, root + "/snap_sf1"))
                t0 = time.perf_counter()
                eng3.backfill()
                sf1["seed_s"] = round(time.perf_counter() - t0, 3)
                batch = _mixed_batch(spark)
                batch.count()
                os.environ["SINKER_SPARK_LANE_TIMING"] = "1"
                try:
                    t0 = time.perf_counter()
                    eng3.process_cdc_batch(batch, epoch_id=1)
                    sf1["fold_batch_s"] = round(time.perf_counter() - t0, 3)
                finally:
                    os.environ.pop("SINKER_SPARK_LANE_TIMING", None)
                stats3 = eng3.last_stats.get("bi_doc", {})
                if stats3.get("phases"):
                    sf1["fold_phases"] = stats3["phases"]
                sf1["fold_lane"] = (
                    "doc_tree" if stats3.get("doc_tree") else "fallback"
                )
                sf1["fold_batch_rows"] = 1000
                out["sf1"] = sf1
            except Exception as ex:  # noqa: BLE001 — fail-soft: the
                # sf0.1 figures above are the gate; sf1 is the scale
                # proof and records its own failure instead of sinking
                # the whole artifact
                out["sf1"] = {"error": f"{type(ex).__name__}: {ex}"}
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
