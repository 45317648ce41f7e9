"""Engine-wide randomized differential soak: one SyncEngine carrying
the algebraic delta lanes (keyed aggregate, buffered top-k, bilinear
inner/left join, aggregate-over-join, 3-table join chain in both row
and aggregate mode, nested parent+child-array documents,
exact-distinct support counts, HAVING-filtered aggregate) folds a
seeded random stream of
mixed CDC batches, and after EVERY batch each view's sink contents are
compared against a Python-side recompute from the mutated truth.

This is the harness the scenario tests can't replace: multi-batch
interactions (state carried across folds, group migrations, in-batch
insert→update→delete chains, delete-heavy watermark attacks) and two
deliberate missing-before-image batches that force the lane-fallback
repair mid-stream — after which the folds must STILL match truth.
The reference refreshes every view by full recompute
(query_templates.py:13), so its behavior is the oracle by construction;
here the oracle is recomputed independently per batch.

Contract exercised: backfill() seeds lane states at the snapshot
point, then every batch is processed under the live-table contract
(the catalog temp views always reflect the post-batch truth, as a real
lagging CDC feed guarantees).
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.sinks.memory import InMemorySink
from sinker_spark.views import (
    AggViewSpec,
    DistinctViewSpec,
    JoinAggViewSpec,
    JoinChainViewSpec,
    JoinViewSpec,
    NestedDocViewSpec,
    TopKViewSpec,
    ViewDef,
)

SALES_SCHEMA = "id string, region string, amount double"
DIMS_SCHEMA = "region string, mgr string"
ORG_SCHEMA = "mgr string, dept string"
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)
REGIONS = ["eu", "us", "ap", "af"]
# sales.region draws from this pool: NULL is a legal group key (its own
# GROUP BY group; never joins) and must survive every lane end-to-end
SALES_REGIONS = REGIONS + [None]
K = 2


def _views():
    def agg_fn(spark):
        return (
            spark.table("soak_sales")
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_amt"),
                F.max("amount").alias("max_amt"),
                F.min("amount").alias("min_amt"),
            )
            .select(
                # concat_ws id: NULL region is a legal group (served as id '')
                F.concat_ws("|", F.col("region")).alias("id"),
                F.struct(
                    "region",
                    "n_rows",
                    F.col("sum_amt").cast("double").alias("sum_amt"),
                    F.col("max_amt").cast("double").alias("max_amt"),
                    F.col("min_amt").cast("double").alias("min_amt"),
                ).alias("doc"),
            )
        )

    def topk_fn(spark):
        from pyspark.sql.window import Window

        w = Window.partitionBy("region").orderBy(F.desc("amount"), F.asc("id"))
        ranked = (
            spark.table("soak_sales")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= K)
        )
        return ranked.groupBy("region").agg(
            F.sort_array(F.collect_list(F.struct("rank", "id", "amount"))).alias("top")
        ).select(F.concat_ws("|", F.col("region")).alias("k"), F.struct("region", "top").alias("doc"))

    def join_fn(spark):
        j = spark.table("soak_sales").join(spark.table("soak_dims"), "region")
        return j.select(
            F.col("id").alias("k"),
            F.struct("region", "id", "amount", "mgr", F.lit(1).cast("bigint").alias("n_rows")).alias("doc"),
        )

    def loj_fn(spark):
        dims = spark.table("soak_dims").withColumn("__matched", F.lit(True))
        j = (
            spark.table("soak_sales")
            .join(dims, "region", "left")
            .withColumn("__matched", F.coalesce(F.col("__matched"), F.lit(False)))
        )
        return j.select(
            F.col("id").alias("k"),
            F.struct(
                "region", "id", "amount", "mgr", "__matched",
                F.lit(1).cast("bigint").alias("n_rows"),
            ).alias("doc"),
        )

    def joinagg_fn(spark):
        j = spark.table("soak_sales").join(spark.table("soak_dims"), "region")
        return (
            j.groupBy("mgr")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_amt"),
            )
            .select(
                F.col("mgr").alias("id"),
                F.struct("mgr", "n_rows", F.col("sum_amt").cast("double").alias("sum_amt")).alias("doc"),
            )
        )

    def dc_fn(spark):
        served = (
            spark.table("soak_sales")
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_distinct(F.col("amount")).cast("bigint").alias("n_distinct"),
            )
        )
        return served.select(
            F.concat_ws("|", F.col("region")).alias("id"),
            F.struct("region", "n_rows", "n_distinct").alias("doc"),
        )

    def chain_fn(spark):
        j = (
            spark.table("soak_sales")
            .join(spark.table("soak_dims"), "region")
            .join(spark.table("soak_org"), "mgr")
        )
        g = j.groupBy("region", "id", "amount", "mgr", "dept").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )
        return g.select(
            F.col("id").alias("k"),
            F.struct("region", "id", "amount", "mgr", "dept", "n_rows").alias("doc"),
        )

    def chainagg_fn(spark):
        j = (
            spark.table("soak_sales")
            .join(spark.table("soak_dims"), "region")
            .join(spark.table("soak_org"), "mgr")
        )
        g = j.groupBy("dept").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_dec"),
        )
        return g.select(
            F.col("dept").alias("k"),
            F.struct(
                "dept", "n_rows", F.col("sum_dec").cast("double").alias("sum_amt")
            ).alias("doc"),
        )

    def nesteddoc_fn(spark):
        c = spark.table("soak_sales")
        pair = F.struct(
            F.col("id").alias("__o0"),
            F.col("amount").alias("__o1"),
            F.struct("id", "amount").alias("__c"),
        )
        arrays = c.groupBy("region").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("rows")
        )
        out = spark.table("soak_dims").join(arrays, "region", "left")
        arr_type = out.schema["rows"].dataType
        out = out.withColumn("rows", F.coalesce(F.col("rows"), F.array().cast(arr_type)))
        return out.select(
            F.col("region").alias("k"),
            F.struct("region", "mgr", "rows").alias("doc"),
        )

    def having_fn(spark):
        served = (
            spark.table("soak_sales")
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("sum_dec"),
            )
            .select("region", "n_rows", F.col("sum_dec").cast("double").alias("sum_amt"))
            .where("n_rows >= 4")
        )
        return served.select(
            F.concat_ws("|", F.col("region")).alias("id"),
            F.struct("region", "n_rows", "sum_amt").alias("doc"),
        )

    return [
        ViewDef(
            name="soak_agg",
            fn=agg_fn,
            deps={"soak_sales"},
            agg=AggViewSpec(
                table="soak_sales",
                keys=["region"],
                sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
                maxes={"max_amt": "amount"},
                mins={"min_amt": "amount"},
                row_schema=SALES_SCHEMA,
            ),
        ),
        ViewDef(
            name="soak_topk",
            fn=topk_fn,
            deps={"soak_sales"},
            topk=TopKViewSpec(
                table="soak_sales",
                keys=["region"],
                order_col="amount",
                id_col="id",
                k=K,
                buffer=1,
                row_schema=SALES_SCHEMA,
            ),
        ),
        ViewDef(
            name="soak_join",
            fn=join_fn,
            deps={"soak_sales", "soak_dims"},
            join=JoinViewSpec(
                table_a="soak_sales",
                table_b="soak_dims",
                on=["region"],
                row_schema_a=SALES_SCHEMA,
                row_schema_b=DIMS_SCHEMA,
                key_cols=["id"],
            ),
        ),
        ViewDef(
            name="soak_loj",
            fn=loj_fn,
            deps={"soak_sales", "soak_dims"},
            join=JoinViewSpec(
                table_a="soak_sales",
                table_b="soak_dims",
                on=["region"],
                row_schema_a=SALES_SCHEMA,
                row_schema_b=DIMS_SCHEMA,
                key_cols=["id"],
                how="left",
            ),
        ),
        ViewDef(
            name="soak_joinagg",
            fn=joinagg_fn,
            deps={"soak_sales", "soak_dims"},
            joinagg=JoinAggViewSpec(
                table_a="soak_sales",
                table_b="soak_dims",
                on=["region"],
                row_schema_a=SALES_SCHEMA,
                row_schema_b=DIMS_SCHEMA,
                keys=["mgr"],
                sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            ),
        ),
        ViewDef(
            name="soak_dc",
            fn=dc_fn,
            deps={"soak_sales"},
            distinct=DistinctViewSpec(
                table="soak_sales",
                keys=["region"],
                value_col="amount",
                row_schema=SALES_SCHEMA,
                exact=True,
            ),
        ),
        ViewDef(
            name="soak_chain",
            fn=chain_fn,
            deps={"soak_sales", "soak_dims", "soak_org"},
            joinchain=JoinChainViewSpec(
                tables=["soak_sales", "soak_dims", "soak_org"],
                ons=[["region"], ["mgr"]],
                row_schemas=[SALES_SCHEMA, DIMS_SCHEMA, ORG_SCHEMA],
                key_cols=["id"],
            ),
        ),
        ViewDef(
            name="soak_chainagg",
            fn=chainagg_fn,
            deps={"soak_sales", "soak_dims", "soak_org"},
            joinchain=JoinChainViewSpec(
                tables=["soak_sales", "soak_dims", "soak_org"],
                ons=[["region"], ["mgr"]],
                row_schemas=[SALES_SCHEMA, DIMS_SCHEMA, ORG_SCHEMA],
                keys=["dept"],
                sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            ),
        ),
        ViewDef(
            name="soak_nesteddoc",
            fn=nesteddoc_fn,
            deps={"soak_dims", "soak_sales"},
            nesteddoc=NestedDocViewSpec(
                parent_table="soak_dims",
                child_table="soak_sales",
                on=["region"],
                row_schema_parent=DIMS_SCHEMA,
                row_schema_child=SALES_SCHEMA,
                child_alias="rows",
                child_order=["id", "amount"],
            ),
        ),
        ViewDef(
            name="soak_having",
            fn=having_fn,
            deps={"soak_sales"},
            agg=AggViewSpec(
                table="soak_sales",
                keys=["region"],
                sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
                row_schema=SALES_SCHEMA,
                having="n_rows >= 4",
            ),
        ),
    ]


# -- truth model ----------------------------------------------------------


def _register_truth(spark, sales, dims, org):
    spark.createDataFrame(
        [(sid, r, a) for sid, (r, a) in sorted(sales.items())] or [], SALES_SCHEMA
    ).createOrReplaceTempView("soak_sales")
    spark.createDataFrame(
        [(r, m) for r, m in sorted(dims.items())] or [], DIMS_SCHEMA
    ).createOrReplaceTempView("soak_dims")
    spark.createDataFrame(
        [(m, d) for m, d in sorted(org.items())] or [], ORG_SCHEMA
    ).createOrReplaceTempView("soak_org")


def expected_agg(sales):
    out = {}
    for _, (region, amount) in sales.items():
        e = out.setdefault(region, [0, 0.0, None, None])
        e[0] += 1
        e[1] += amount
        e[2] = amount if e[2] is None else max(e[2], amount)
        e[3] = amount if e[3] is None else min(e[3], amount)
    return {
        ("" if r is None else r): {
            "region": r, "n_rows": n, "sum_amt": round(s, 2), "max_amt": mx, "min_amt": mn
        }
        for r, (n, s, mx, mn) in out.items()
    }


def expected_topk(sales):
    groups = {}
    for sid, (region, amount) in sales.items():
        groups.setdefault(region, []).append((sid, amount))
    out = {}
    for r, rows in groups.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        out["" if r is None else r] = {
            "region": r,
            "top": [
                {"rank": i + 1, "id": sid, "amount": amt}
                for i, (sid, amt) in enumerate(rows[:K])
            ],
        }
    return out


def expected_join(sales, dims):
    return {
        sid: {"region": region, "id": sid, "amount": amount, "mgr": dims[region], "n_rows": 1}
        for sid, (region, amount) in sales.items()
        if region in dims
    }


def expected_loj(sales, dims):
    return {
        sid: {
            "region": region,
            "id": sid,
            "amount": amount,
            "mgr": dims.get(region),
            "__matched": region in dims,
            "n_rows": 1,
        }
        for sid, (region, amount) in sales.items()
    }


def expected_joinagg(sales, dims):
    out = {}
    for _, (region, amount) in sales.items():
        if region in dims:
            e = out.setdefault(dims[region], [0, 0.0])
            e[0] += 1
            e[1] += amount
    return {m: {"mgr": m, "n_rows": n, "sum_amt": round(s, 2)} for m, (n, s) in out.items()}


def expected_chain(sales, dims, org):
    return {
        sid: {
            "region": region,
            "id": sid,
            "amount": amount,
            "mgr": dims[region],
            "dept": org[dims[region]],
            "n_rows": 1,
        }
        for sid, (region, amount) in sales.items()
        if region in dims and dims[region] in org
    }


def expected_chainagg(sales, dims, org):
    out = {}
    for _, (region, amount) in sales.items():
        if region in dims and dims[region] in org:
            dept = org[dims[region]]
            n, s = out.get(dept, (0, 0.0))
            out[dept] = (n + 1, s + amount)
    return {
        d: {"dept": d, "n_rows": n, "sum_amt": round(s, 2)} for d, (n, s) in out.items()
    }


def expected_nesteddoc(sales, dims):
    return {
        r: {
            "region": r,
            "mgr": m,
            "rows": [
                {"id": sid, "amount": amount}
                for sid, amount in sorted(
                    (sid, a) for sid, (reg, a) in sales.items() if reg == r
                )
            ],
        }
        for r, m in dims.items()
    }


def expected_dc(sales):
    out = {}
    for _, (region, amount) in sales.items():
        e = out.setdefault(region, [0, set()])
        e[0] += 1
        e[1].add(amount)
    return {
        ("" if r is None else r): {"region": r, "n_rows": n, "n_distinct": len(vals)}
        for r, (n, vals) in out.items()
    }


def expected_having(sales, min_rows=4):
    out = {}
    for _, (region, amount) in sales.items():
        e = out.setdefault(region, [0, 0.0])
        e[0] += 1
        e[1] += amount
    return {
        ("" if r is None else r): {"region": r, "n_rows": n, "sum_amt": round(s, 2)}
        for r, (n, s) in out.items()
        if n >= min_rows
    }


def _check(sink, index, expected, batch_no):
    got = dict(sink.indices.get(index, {}))
    assert set(got) == set(expected), (
        f"batch {batch_no}, {index}: key sets differ — "
        f"extra={set(got) - set(expected)}, missing={set(expected) - set(got)}"
    )
    for key, want in expected.items():
        have = got[key]
        for field, val in want.items():
            if isinstance(val, float):
                assert have[field] == pytest.approx(val, abs=1e-9), (batch_no, index, key, field, have, want)
            else:
                assert have[field] == val, (batch_no, index, key, field, have, want)


def _check_all(sink, sales, dims, org, batch_no):
    _check(sink, "soak_agg", expected_agg(sales), batch_no)
    _check(sink, "soak_topk", expected_topk(sales), batch_no)
    _check(sink, "soak_join", expected_join(sales, dims), batch_no)
    _check(sink, "soak_loj", expected_loj(sales, dims), batch_no)
    _check(sink, "soak_joinagg", expected_joinagg(sales, dims), batch_no)
    _check(sink, "soak_chain", expected_chain(sales, dims, org), batch_no)
    _check(sink, "soak_chainagg", expected_chainagg(sales, dims, org), batch_no)
    _check(sink, "soak_nesteddoc", expected_nesteddoc(sales, dims), batch_no)
    _check(sink, "soak_dc", expected_dc(sales), batch_no)
    _check(sink, "soak_having", expected_having(sales), batch_no)


# -- batch generator ------------------------------------------------------


def _gen_batch(rng, sales, dims, org, next_id, lsn, drop_image_once):
    """Mutates sales/dims/org in place (the working truth), returns
    (cdc_rows, next_id, lsn). ``drop_image_once``: strip the before-image
    from one delete in this batch, forcing the lane-fallback repair."""
    records = []  # (lsn, table, op, after, before)
    n_ops = rng.randint(6, 10)
    chain_budget = 2
    dropped = not drop_image_once
    for _ in range(n_ops):
        roll = rng.random()
        if roll < 0.32 or not sales:  # insert (sometimes chained)
            sid = f"s{next_id:04d}"
            next_id += 1
            row = (rng.choice(SALES_REGIONS), rng.randrange(0, 201) / 4.0)
            sales[sid] = row
            records.append((lsn, "soak_sales", "INSERT", {"id": sid, "region": row[0], "amount": row[1]}, None))
            lsn += 1
            if chain_budget and rng.random() < 0.35:
                chain_budget -= 1
                if rng.random() < 0.5:  # insert -> update chain
                    new = (rng.choice(SALES_REGIONS), rng.randrange(0, 201) / 4.0)
                    records.append((
                        lsn, "soak_sales", "UPDATE",
                        {"id": sid, "region": new[0], "amount": new[1]},
                        {"id": sid, "region": row[0], "amount": row[1]},
                    ))
                    sales[sid] = new
                else:  # insert -> delete chain (same-batch phantom)
                    records.append((
                        lsn, "soak_sales", "DELETE", None,
                        {"id": sid, "region": row[0], "amount": row[1]},
                    ))
                    del sales[sid]
                lsn += 1
        elif roll < 0.60:  # update
            sid = rng.choice(sorted(sales))
            old = sales[sid]
            region = rng.choice(SALES_REGIONS) if rng.random() < 0.4 else old[0]
            new = (region, rng.randrange(0, 201) / 4.0)
            records.append((
                lsn, "soak_sales", "UPDATE",
                {"id": sid, "region": new[0], "amount": new[1]},
                {"id": sid, "region": old[0], "amount": old[1]},
            ))
            sales[sid] = new
            lsn += 1
        elif roll < 0.88:  # delete, biased toward group leaders (watermark attack)
            pool = sorted(sales)
            if rng.random() < 0.5:
                sid = max(pool, key=lambda s: (sales[s][1], s))
            else:
                sid = rng.choice(pool)
            old = sales[sid]
            before = {"id": sid, "region": old[0], "amount": old[1]}
            if not dropped:
                before = None  # missing image -> whole batch falls back
                dropped = True
            records.append((lsn, "soak_sales", "DELETE", None, before))
            del sales[sid]
            lsn += 1
        elif roll < 0.95 and dims:  # dims mgr re-parent (fan-out update)
            r = rng.choice(sorted(dims))
            old_m = dims[r]
            new_m = f"m{rng.randint(1, 3)}"
            records.append((
                lsn, "soak_dims", "UPDATE",
                {"region": r, "mgr": new_m}, {"region": r, "mgr": old_m},
            ))
            dims[r] = new_m
            lsn += 1
        elif roll < 0.975 and org:  # org mutate (chain stage-2 ΔC)
            m = rng.choice(sorted(org))
            if rng.random() < 0.6:  # dept re-assign
                old_d, new_d = org[m], f"d{rng.randint(1, 3)}"
                records.append((
                    lsn, "soak_org", "UPDATE",
                    {"mgr": m, "dept": new_d}, {"mgr": m, "dept": old_d},
                ))
                org[m] = new_d
            elif len(org) > 1:  # org delete: breaks every chain path via m
                records.append((lsn, "soak_org", "DELETE", None, {"mgr": m, "dept": org[m]}))
                del org[m]
            else:  # re-insert a missing mgr
                nm = next((x for x in ("m1", "m2", "m3") if x not in org), None)
                if nm is not None:
                    org[nm] = f"d{rng.randint(1, 3)}"
                    records.append((lsn, "soak_org", "INSERT", {"mgr": nm, "dept": org[nm]}, None))
            lsn += 1
        else:  # dims delete / re-insert
            missing = [r for r in REGIONS if r not in dims]
            if missing and rng.random() < 0.7:
                r = rng.choice(missing)
                dims[r] = f"m{rng.randint(1, 3)}"
                records.append((lsn, "soak_dims", "INSERT", {"region": r, "mgr": dims[r]}, None))
            elif len(dims) > 1:
                r = rng.choice(sorted(dims))
                records.append((lsn, "soak_dims", "DELETE", None, {"region": r, "mgr": dims[r]}))
                del dims[r]
            lsn += 1
    if drop_image_once and not any(
        rec[1] == "soak_sales" and rec[2] == "DELETE" and rec[4] is None for rec in records
    ) and sales:
        # the random mix produced no image-less delete: force one
        sid = rng.choice(sorted(sales))
        records.append((lsn, "soak_sales", "DELETE", None, None))
        del sales[sid]
        lsn += 1
    return records, next_id, lsn


def _cdc_df(spark, records):
    rows = [
        (
            lsn,
            "public",
            table,
            op,
            (after or before or {}).get("id") or (after or before or {}).get("region", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


# Env overrides turn this test into an extended bug hunt without
# inflating CI time: SINKER_SOAK_SEED / SINKER_SOAK_BATCHES, e.g.
#   for s in 1 2 3; do SINKER_SOAK_SEED=$s SINKER_SOAK_BATCHES=20 \
#     python -m pytest tests/test_ivm_soak.py -x -q; done
N_BATCHES = int(os.environ.get("SINKER_SOAK_BATCHES", "8"))
FALLBACK_BATCHES = {3, 6}  # 1-indexed: force the lane-fallback repair here
REPLAY_BATCHES = {2, 5, 6}  # re-deliver these verbatim (at-least-once)
SOAK_SEED = int(os.environ.get("SINKER_SOAK_SEED", "20260814"))


def test_soak_all_lanes_match_recompute(spark, tmp_path):
    rng = random.Random(SOAK_SEED)
    sales = {
        f"s{i:04d}": (SALES_REGIONS[i % len(SALES_REGIONS)], rng.randrange(0, 201) / 4.0)
        for i in range(12)
    }
    dims = {"eu": "m1", "us": "m1", "ap": "m2", "af": "m2"}
    org = {"m1": "d1", "m2": "d2", "m3": "d1"}
    next_id, lsn = 12, 1

    _register_truth(spark, sales, dims, org)
    sink = InMemorySink()
    eng = SyncEngine(spark, _views(), sink, SnapshotStore(spark, str(tmp_path / "snap")))
    eng.backfill()
    _check_all(sink, sales, dims, org, batch_no=0)

    saw_fallback = saw_fold = saw_dc_fold = saw_chain_fold = False
    for batch_no in range(1, N_BATCHES + 1):
        records, next_id, lsn = _gen_batch(
            rng, sales, dims, org, next_id, lsn,
            drop_image_once=batch_no in FALLBACK_BATCHES,
        )
        # live-table contract: the catalog reflects the batch before the
        # engine processes it (a real CDC feed lags the table)
        _register_truth(spark, sales, dims, org)
        batch_df = _cdc_df(spark, records)
        eng.process_cdc_batch(batch_df, epoch_id=batch_no)
        stats = eng.last_stats.get("soak_agg", {})
        if "lane_fallback" in stats:
            saw_fallback = True
        if "delta_agg" in stats:
            saw_fold = True
        if "exact_distinct" in eng.last_stats.get("soak_dc", {}):
            saw_dc_fold = True
        if "join_chain" in eng.last_stats.get("soak_chain", {}):
            saw_chain_fold = True
        _check_all(sink, sales, dims, org, batch_no)
        if batch_no in REPLAY_BATCHES:
            # at-least-once redelivery: the signed folds must not
            # double-apply (replay guard suppresses folded rows)
            eng.process_cdc_batch(batch_df, epoch_id=batch_no)
            _check_all(sink, sales, dims, org, f"{batch_no}-replay")

    # the soak must have exercised both regimes to prove anything
    assert saw_fallback and saw_fold and saw_dc_fold and saw_chain_fold
