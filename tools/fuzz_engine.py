"""Engine-level randomized topology fuzzer for the SyncEngine lanes.

Where tools/fuzz_ivm.py fuzzes the fold primitives and the engine soak
(tests/test_ivm_soak.py) drives one fixed view topology, this tool
randomizes the TOPOLOGY too: each run draws a fresh set of lane views —
random group-key subsets (1- and 2-column, nullable), random
sum/max/min combinations, random HAVING thresholds, random top-k
k/buffer, random distinct value columns, inner vs left joins — then
folds seeded random CDC batches (inserts, update chains, deletes, key
migrations, NULL keys, occasional missing before-images to force the
lane-fallback path, verbatim replays for at-least-once) through a
SyncEngine and compares EVERY view's sink documents against its own
recompute fn after EVERY batch.

The recompute fn is the engine's source of truth (the lane must serve
exactly what a full recompute of the view would), so the check needs no
hand-maintained expected-state model — any divergence is a lane bug,
a serve-format bug, or a fallback bug.

Usage: python tools/fuzz_engine.py [n_runs] [n_batches]
Exit non-zero on first divergence with the run seed + view + batch.
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.session import get_spark
from sinker_spark.sinks.memory import InMemorySink, _row_to_plain
from sinker_spark.views import (
    AggViewSpec,
    ChildArraySpec,
    DimLookup,
    DistinctViewSpec,
    DocTreeViewSpec,
    JoinAggViewSpec,
    JoinChainViewSpec,
    JoinViewSpec,
    MembershipViewSpec,
    NestedDocViewSpec,
    TopKViewSpec,
    ViewDef,
)

SALES_SCHEMA = "id string, region string, cat string, amount double"
DIM_SCHEMA = "region string, mgr string"
# the fz_dims TABLE carries a second fk (coach) so the doc-tree lane can
# fuzz BRANCHED dim forests; lanes that declare DIM_SCHEMA simply never
# parse/serve the extra column (from_json ignores it)
DIM3_SCHEMA = "region string, mgr string, coach string"
ORG_SCHEMA = "mgr string, dept string"
CATS_SCHEMA = "cat string, label string"
DEPTS_SCHEMA = "dept string, floor string"
NOTES_SCHEMA = "nid string, region string, txt string"
COACH_SCHEMA = "coach string, grade string"
LINES_SCHEMA = "lid string, sid string, val double"  # nested: sale → lines[]
CDC_COLS = (
    "lsn bigint, schema string, table string, op string, id string, "
    "payload string, payload_before string"
)
REGIONS = ["eu", "us", "ap", None]
CATS = ["a", "b", None]


# ------------------------------------------------------------ view builders

def make_agg_view(rng, name):
    keys = rng.choice([["region"], ["cat"], ["region", "cat"]])
    use_mm = rng.random() < 0.6
    having = rng.choice([None, "n_rows >= 2", "n_rows >= 3"])

    def fn(spark):
        df = spark.table("fz_sales").groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("__s"),
            *( [F.max("amount").alias("max_amt"), F.min("amount").alias("min_amt")]
               if use_mm else [] ),
        )
        served = df.select(
            *keys,
            "n_rows",
            F.col("__s").cast("double").alias("sum_amt"),
            *( [F.col("max_amt").cast("double").alias("max_amt"),
                F.col("min_amt").cast("double").alias("min_amt")] if use_mm else [] ),
        )
        if having:
            served = served.where(having)
        fields = [*keys, "n_rows", "sum_amt"] + (["max_amt", "min_amt"] if use_mm else [])
        return served.select(
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("id"),
            F.struct(*fields).alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, deps={"fz_sales"},
        agg=AggViewSpec(
            table="fz_sales", keys=keys,
            sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            maxes={"max_amt": "amount"} if use_mm else {},
            mins={"min_amt": "amount"} if use_mm else {},
            row_schema=SALES_SCHEMA, having=having,
        ),
    )


def make_topk_view(rng, name):
    keys = rng.choice([["region"], ["cat"]])
    k = rng.choice([1, 2, 3])
    buf = rng.choice([1, 2])

    def fn(spark):
        from pyspark.sql.window import Window

        w = Window.partitionBy(*keys).orderBy(F.desc("amount"), F.asc("id"))
        ranked = (
            spark.table("fz_sales")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        return ranked.groupBy(*keys).agg(
            F.sort_array(F.collect_list(F.struct("rank", "id", "amount"))).alias("top")
        ).select(
            F.concat_ws("|", *[F.col(kk).cast("string") for kk in keys]).alias("k"),
            F.struct(*keys, "top").alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, key="k", deps={"fz_sales"},
        topk=TopKViewSpec(
            table="fz_sales", keys=keys, order_col="amount", id_col="id",
            k=k, buffer=buf, row_schema=SALES_SCHEMA,
        ),
    )


def make_distinct_view(rng, name):
    keys = rng.choice([["region"], ["cat"], ["region", "cat"]])
    value_col = rng.choice(["amount", "cat" if "cat" not in keys else "amount"])

    def fn(spark):
        served = spark.table("fz_sales").groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col(value_col)).cast("bigint").alias("n_distinct"),
        )
        return served.select(
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("id"),
            F.struct(*keys, "n_rows", "n_distinct").alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, deps={"fz_sales"},
        distinct=DistinctViewSpec(
            table="fz_sales", keys=keys, value_col=value_col,
            row_schema=SALES_SCHEMA, exact=True,
        ),
    )


def make_join_view(rng, name):
    how = rng.choice(["inner", "left"])

    def fn(spark):
        if how == "inner":
            j = spark.table("fz_sales").join(spark.table("fz_dims"), "region")
            return j.select(
                F.col("id").alias("k"),
                F.struct(
                    "region", "id", "cat", "amount", "mgr",
                    F.lit(1).cast("bigint").alias("n_rows"),
                ).alias("doc"),
            )
        dims = spark.table("fz_dims").withColumn("__matched", F.lit(True))
        j = (
            spark.table("fz_sales")
            .join(dims, "region", "left")
            .withColumn("__matched", F.coalesce(F.col("__matched"), F.lit(False)))
        )
        return j.select(
            F.col("id").alias("k"),
            F.struct(
                "region", "id", "cat", "amount", "mgr", "__matched",
                F.lit(1).cast("bigint").alias("n_rows"),
            ).alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, key="k", deps={"fz_sales", "fz_dims"},
        join=JoinViewSpec(
            table_a="fz_sales", table_b="fz_dims", on=["region"],
            row_schema_a=SALES_SCHEMA, row_schema_b=DIM_SCHEMA,
            key_cols=["id"], how=how,
        ),
    )


def make_joinagg_view(rng, name):
    keys = rng.choice([["mgr"], ["region"], ["mgr", "cat"]])
    having = rng.choice([None, "n_rows >= 2"])

    def fn(spark):
        j = spark.table("fz_sales").join(spark.table("fz_dims"), "region")
        served = (
            j.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("__s"),
            )
            .select(*keys, "n_rows", F.col("__s").cast("double").alias("sum_amt"))
        )
        if having:
            served = served.where(having)
        return served.select(
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("id"),
            F.struct(*keys, "n_rows", "sum_amt").alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, deps={"fz_sales", "fz_dims"},
        joinagg=JoinAggViewSpec(
            table_a="fz_sales", table_b="fz_dims", on=["region"],
            row_schema_a=SALES_SCHEMA, row_schema_b=DIM_SCHEMA,
            keys=keys, sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
            having=having,
        ),
    )


def make_chain_view(rng, name):
    agg_mode = rng.random() < 0.5
    if agg_mode:
        keys = rng.choice([["dept"], ["mgr"], ["dept", "cat"]])

        def fn(spark):
            j = (
                spark.table("fz_sales")
                .join(spark.table("fz_dims"), "region")
                .join(spark.table("fz_org"), "mgr")
            )
            g = j.groupBy(*keys).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.expr("CAST(amount AS DECIMAL(18,2))")).alias("__s"),
            )
            return g.select(
                F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("k"),
                F.struct(*keys, "n_rows", F.col("__s").cast("double").alias("sum_amt")).alias("doc"),
            )

        spec = JoinChainViewSpec(
            tables=["fz_sales", "fz_dims", "fz_org"],
            ons=[["region"], ["mgr"]],
            row_schemas=[SALES_SCHEMA, DIM_SCHEMA, ORG_SCHEMA],
            keys=keys, sums={"sum_amt": "CAST(amount AS DECIMAL(18,2))"},
        )
    else:
        def fn(spark):
            j = (
                spark.table("fz_sales")
                .join(spark.table("fz_dims"), "region")
                .join(spark.table("fz_org"), "mgr")
            )
            g = j.groupBy("region", "id", "cat", "amount", "mgr", "dept").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows")
            )
            return g.select(
                F.col("id").alias("k"),
                F.struct("region", "id", "cat", "amount", "mgr", "dept", "n_rows").alias("doc"),
            )

        spec = JoinChainViewSpec(
            tables=["fz_sales", "fz_dims", "fz_org"],
            ons=[["region"], ["mgr"]],
            row_schemas=[SALES_SCHEMA, DIM_SCHEMA, ORG_SCHEMA],
            key_cols=["id"],
        )
    return ViewDef(
        name=name, fn=fn, key="k", deps={"fz_sales", "fz_dims", "fz_org"},
        joinchain=spec,
    )


def make_nesteddoc_view(rng, name):
    def fn(spark):
        c = spark.table("fz_sales")
        pair = F.struct(
            F.col("id").alias("__o0"),
            F.col("cat").alias("__o1"),
            F.col("amount").alias("__o2"),
            F.struct("id", "cat", "amount").alias("__c"),
        )
        arrays = c.groupBy("region").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("rows")
        )
        out = spark.table("fz_dims").join(arrays, "region", "left")
        arr_type = out.schema["rows"].dataType
        out = out.withColumn("rows", F.coalesce(F.col("rows"), F.array().cast(arr_type)))
        return out.select(
            F.col("region").alias("k"),
            F.struct("region", "mgr", "rows").alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, key="k", deps={"fz_dims", "fz_sales"},
        nesteddoc=NestedDocViewSpec(
            parent_table="fz_dims", child_table="fz_sales", on=["region"],
            row_schema_parent=DIM_SCHEMA, row_schema_child=SALES_SCHEMA,
            child_alias="rows", child_order=["id", "cat", "amount"],
        ),
    )


def make_membership_view(rng, name):
    """Bloom membership lane: INSERT-only batches bit_or into the word
    relation (idempotent under replay); any delete/update in the batch
    routes to the recompute fallback — both paths diffed against this
    recompute fn like every other lane."""
    col = rng.choice(["region", "cat", "id"])
    m_bits = rng.choice([256, 1024])

    def fn(spark):
        from sinker_spark.ivm_bloom import initial_bloom_state

        words = initial_bloom_state(spark.table("fz_sales"), col, m_bits)
        return words.select(
            F.col("word_idx").cast("string").alias("k"),
            F.struct("word_idx", "word").alias("doc"),
        )

    return ViewDef(
        name=name, fn=fn, key="k", deps={"fz_sales"},
        membership=MembershipViewSpec(
            table="fz_sales", value_col=col, m_bits=m_bits, row_schema=SALES_SCHEMA
        ),
    )


def make_doctree_view(rng, name):
    """Doc-tree lane (DocTreeViewSpec / runner._doctree_refresh) with the
    FULL flagship composition randomized: chain depth 0-2
    (fz_dims→fz_org→fz_depts, broken chain retracts the doc), a
    fz_sales child array optionally carrying a per-element dim lookup
    (sale.cat→fz_cats, LEFT-joined: missing cat serves NULL label), and
    optionally a SECOND independent child array (fz_notes) — so dim
    renames/deletes fan out through both the parent-chain and the
    element-dim reverse indexes under random CDC. Order columns drawn
    randomly (id is always included so the order is total)."""
    depth = rng.randrange(0, 3)
    elem_dim = rng.random() < 0.5
    two_children = rng.random() < 0.5
    # branch mode: a SECOND independent parent-anchored lookup
    # (dims.coach → fz_coach) alongside the org chain — the dim_forest
    # tree form, each branch walked through its own reverse index
    branch = rng.random() < 0.5
    # nested mode: the sales elements each carry their own fz_lines[]
    # sub-array (ChildArraySpec.children — two to-many levels; a line
    # delta ascends the rk index sale→region to reach the doc)
    nested = rng.random() < 0.5
    extra = rng.choice([[], ["cat"], ["amount"], ["cat", "amount"]])
    order = ["id", *extra]

    chain = [DimLookup("fz_org", fk="mgr", key="mgr", row_schema=ORG_SCHEMA),
             DimLookup("fz_depts", fk="dept", key="dept", row_schema=DEPTS_SCHEMA)][:depth]
    sales_dims = (
        [DimLookup("fz_cats", fk="cat", key="cat", row_schema=CATS_SCHEMA)]
        if elem_dim else []
    )
    children = [
        ChildArraySpec(
            table="fz_sales", fk="region",
            row_schema="region string, id string, cat string, amount double",
            alias="rows", order=order, dims=sales_dims,
            key="id" if nested else None,
            children=(
                [ChildArraySpec(table="fz_lines", fk="sid",
                                row_schema=LINES_SCHEMA, alias="lines",
                                order=["lid"])]
                if nested else []
            ),
        )
    ]
    if two_children:
        children.append(
            ChildArraySpec(
                table="fz_notes", fk="region",
                row_schema="region string, nid string, txt string",
                alias="notes", order=["nid"],
            )
        )
    doc_fields = (
        ["region", "mgr"]
        + (["coach"] if branch else [])
        + (["dept"] if depth >= 1 else [])
        + (["floor"] if depth >= 2 else [])
        + (["grade"] if branch else [])
        + ["rows"]
        + (["notes"] if two_children else [])
    )

    def fn(spark):
        cur = spark.table("fz_dims").where(F.col("region").isNotNull())
        if not branch:
            cur = cur.drop("coach")
        if depth >= 1:
            o = spark.table("fz_org")
            cur = cur.join(o, cur["mgr"] == o["mgr"], "inner").drop(o["mgr"])
        if depth >= 2:
            dp = spark.table("fz_depts")
            cur = cur.join(dp, cur["dept"] == dp["dept"], "inner").drop(dp["dept"])
        if branch:
            co = spark.table("fz_coach")
            cur = cur.join(co, cur["coach"] == co["coach"], "inner").drop(co["coach"])

        c = spark.table("fz_sales").where(F.col("region").isNotNull())
        payload = ["id", "cat", "amount"]
        if elem_dim:
            ct = spark.table("fz_cats")
            c = c.join(ct, c["cat"] == ct["cat"], "left").drop(ct["cat"])
            payload.append("label")
        if nested:
            ln = spark.table("fz_lines").where(F.col("sid").isNotNull())
            lpair = F.struct(
                F.col("lid").alias("__o0"), F.struct("lid", "val").alias("__c")
            )
            larr = ln.groupBy("sid").agg(
                F.transform(F.array_sort(F.collect_list(lpair)), lambda x: x["__c"]).alias("lines")
            )
            c = c.join(larr.withColumnRenamed("sid", "__s"),
                       F.col("id") == F.col("__s"), "left").drop("__s")
            lt = c.schema["lines"].dataType
            c = c.withColumn("lines", F.coalesce(F.col("lines"), F.array().cast(lt)))
            payload.append("lines")
        pair = F.struct(
            *[F.col(col).alias(f"__o{k}") for k, col in enumerate(order)],
            F.struct(*payload).alias("__c"),
        )
        arrays = c.groupBy("region").agg(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["__c"]).alias("rows")
        )
        cur = cur.join(arrays.withColumnRenamed("region", "__r"),
                       F.col("region") == F.col("__r"), "left").drop("__r")
        arr_type = cur.schema["rows"].dataType
        cur = cur.withColumn("rows", F.coalesce(F.col("rows"), F.array().cast(arr_type)))
        if two_children:
            nt = spark.table("fz_notes").where(F.col("region").isNotNull())
            npair = F.struct(
                F.col("nid").alias("__o0"), F.struct("nid", "txt").alias("__c")
            )
            narr = nt.groupBy("region").agg(
                F.transform(F.array_sort(F.collect_list(npair)), lambda x: x["__c"]).alias("notes")
            )
            cur = cur.join(narr.withColumnRenamed("region", "__r"),
                           F.col("region") == F.col("__r"), "left").drop("__r")
            narr_type = cur.schema["notes"].dataType
            cur = cur.withColumn(
                "notes", F.coalesce(F.col("notes"), F.array().cast(narr_type))
            )
        return cur.select(
            F.col("region").cast("string").alias("k"),
            F.struct(*doc_fields).alias("doc"),
        )

    if branch:
        # tree form: the org chain nests as children, the coach lookup
        # is a second parent-anchored root
        forest = []
        if chain:
            for prev, nxt in zip(chain, chain[1:]):
                prev.children.append(nxt)
            forest.append(chain[0])
        forest.append(
            DimLookup("fz_coach", fk="coach", key="coach", row_schema=COACH_SCHEMA)
        )
        spec = DocTreeViewSpec(
            parent_table="fz_dims", key="region", row_schema_parent=DIM3_SCHEMA,
            dim_forest=forest, children=children,
        )
    else:
        spec = DocTreeViewSpec(
            parent_table="fz_dims", key="region", row_schema_parent=DIM_SCHEMA,
            dims=chain, children=children,
        )
    return ViewDef(
        name=name, fn=fn, key="k", deps=spec.all_tables(), doctree=spec,
    )


def make_sql_doctree_view(rng, name):
    """SQL-DECLARED doc-tree lane (ivm_doc_sql.derive_sql_doctree →
    runner fold) randomized over the r6/r7 MV grammar: the to-one org
    lookup drawn as a main-FROM JOIN or a correlated subquery, plain
    AND correlated block filters (r7 — anchor refs fold into the serve
    join condition / element predicate via __af_ probe slots), root
    WHERE over parent and/or JOIN-DIM columns (r7), and declared
    json_agg ORDER BY. Truth for sql= views is the transpiled compile
    (check_views falls back to ViewDef.compile when fn is None), so
    every CDC batch differentially checks fold == compiled recompute."""
    join_spelled = rng.random() < 0.5
    dim_where = join_spelled and rng.random() < 0.6      # r7 grammar
    parent_where = rng.random() < 0.4
    corr_one = (not join_spelled) and rng.random() < 0.6  # r7 grammar
    corr_elem = rng.random() < 0.6                        # r7 grammar
    plain_elem = rng.random() < 0.5
    ordered = rng.random() < 0.5

    elem_filters = []
    if plain_elem:
        elem_filters.append(f"amount > {rng.choice([2, 5, 10])}")
    if corr_elem:
        # anchor-referencing OR branch: mgr churn (m0-m3) flips whole
        # arrays, amount churn flips single elements
        elem_filters.append(
            f"(amount > {rng.choice([8, 12])} or d.mgr = 'm{rng.randrange(3)}')"
        )
    ef = "".join(f" and {f}" for f in elem_filters)
    order_sql = " order by id" if ordered else ""
    sales_block = (
        "(select json_agg(json_build_object('sid', id, 'amount', amount)"
        f"{order_sql}) from fq_sales where fq_sales.region = d.id{ef})"
    )
    fields = ["'mgr', d.mgr", f"'sales', {sales_block}"]
    if rng.random() < 0.4:
        # r7: a to-many keyed on a NON-KEY parent column — peer dims by
        # mgr, self-correlated (the d2 alias hides the table name, so
        # the outer ref resolves per PG scoping); dim churn re-points
        # mgr values and must re-serve every peer group touched
        fields.append(
            "'peers', (select json_agg(json_build_object('pid', d2.id)) "
            "from fq_dims d2 where d2.mgr = d.mgr)"
        )
    if join_spelled:
        frm = "from fq_dims d join fq_org o on d.mgr = o.id"
        fields.insert(1, "'dept', o.dept")
    else:
        # correlated to-one filter: dept digit vs mgr digit collide on
        # d0-d2 × m0-m3 churn, so the predicate genuinely flips
        of = (
            " and substr(fq_org.dept, 2, 1) <> substr(d.mgr, 2, 1)"
            if corr_one else ""
        )
        fields.insert(
            1,
            "'org', (select json_build_object('dept', dept) "
            f"from fq_org where fq_org.id = d.mgr{of})",
        )
        frm = "from fq_dims d"
    conj = []
    if dim_where:
        conj.append(f"o.dept <> 'd{rng.randrange(3)}'")
    if parent_where:
        conj.append(f"d.mgr <> 'm{rng.randrange(4)}'")
    where = (" where " + " and ".join(conj)) if conj else ""
    sql = (
        f"select d.id, json_build_object({', '.join(fields)}) as doc "
        f"{frm}{where}"
    )
    return ViewDef(name=name, sql=sql, key="k", sql_doctree=True)


MAKERS = [
    make_agg_view, make_topk_view, make_distinct_view, make_join_view,
    make_joinagg_view, make_chain_view, make_nesteddoc_view,
    make_membership_view, make_doctree_view, make_sql_doctree_view,
]


# ------------------------------------------------------------ CDC generator

def register_truth(spark, sales, dims, org, cats, depts, notes, coaches,
                   lines=None):
    spark.createDataFrame(
        [(lid, s, v) for lid, (s, v) in sorted((lines or {}).items())] or [],
        LINES_SCHEMA,
    ).createOrReplaceTempView("fz_lines")
    spark.createDataFrame(
        [(sid, r, c, a) for sid, (r, c, a) in sorted(sales.items())] or [],
        SALES_SCHEMA,
    ).createOrReplaceTempView("fz_sales")
    spark.createDataFrame(
        [(r, m, co) for r, (m, co) in sorted(dims.items())] or [], DIM3_SCHEMA
    ).createOrReplaceTempView("fz_dims")
    spark.createDataFrame(
        [(co, g) for co, g in sorted(coaches.items())] or [], COACH_SCHEMA
    ).createOrReplaceTempView("fz_coach")
    spark.createDataFrame(
        [(m, d) for m, d in sorted(org.items())] or [], ORG_SCHEMA
    ).createOrReplaceTempView("fz_org")
    spark.createDataFrame(
        [(c, l) for c, l in sorted(cats.items())] or [], CATS_SCHEMA
    ).createOrReplaceTempView("fz_cats")
    spark.createDataFrame(
        [(d, f) for d, f in sorted(depts.items())] or [], DEPTS_SCHEMA
    ).createOrReplaceTempView("fz_depts")
    spark.createDataFrame(
        [(nid, r, t) for nid, (r, t) in sorted(notes.items())] or [], NOTES_SCHEMA
    ).createOrReplaceTempView("fz_notes")
    # id-keyed MIRRORS for the SQL-declared doc-tree lane: the PG MV
    # grammar keys every table on a literal `id` column (the engine
    # derives with id_col="id"), so the same python state is also
    # registered as renamed projections. Temp views capture the plan at
    # creation, so they re-register together with their fz_* sources.
    spark.sql("select region as id, mgr, coach from fz_dims") \
        .createOrReplaceTempView("fq_dims")
    spark.sql("select mgr as id, dept from fz_org") \
        .createOrReplaceTempView("fq_org")
    spark.sql("select id, region, amount from fz_sales") \
        .createOrReplaceTempView("fq_sales")


def gen_batch(rng, sales, dims, org, cats, depts, notes, coaches, next_id, lsn,
              drop_image, lines=None):
    records = []
    dropped = drop_image
    for _ in range(rng.randrange(2, 7)):
        roll = rng.random()
        if roll >= 0.94:  # element-dim / deep-chain-dim / second-child churn
            kind = rng.choice(
                ["cats", "depts", "notes", "coach"]
                + (["lines"] if lines is not None else [])
            )
            if kind == "lines":
                # nested-grandchild churn: insert / re-point (across
                # sales, incl. dead ones) / delete an fz_lines row
                sub = rng.random()
                sale_pool = sorted(sales) or ["s-dead"]
                if sub < 0.5 or not lines:
                    lid = f"l{next_id:04d}"
                    next_id += 1
                    lines[lid] = (rng.choice(sale_pool), rng.randrange(0, 20) / 2.0)
                    records.append((lsn, "fz_lines", "INSERT",
                                    {"lid": lid, "sid": lines[lid][0], "val": lines[lid][1]},
                                    None))
                elif sub < 0.8:
                    lid = rng.choice(sorted(lines))
                    old = lines[lid]
                    lines[lid] = (
                        rng.choice(sale_pool) if rng.random() < 0.5 else old[0],
                        rng.randrange(0, 20) / 2.0,
                    )
                    records.append((lsn, "fz_lines", "UPDATE",
                                    {"lid": lid, "sid": lines[lid][0], "val": lines[lid][1]},
                                    {"lid": lid, "sid": old[0], "val": old[1]}))
                else:
                    lid = rng.choice(sorted(lines))
                    old = lines.pop(lid)
                    records.append((lsn, "fz_lines", "DELETE", None,
                                    {"lid": lid, "sid": old[0], "val": old[1]}))
                lsn += 1
                continue
            if kind == "cats":
                c = rng.choice(["a", "b"])
                if c in cats and rng.random() < 0.4:
                    old = cats.pop(c)
                    records.append((lsn, "fz_cats", "DELETE", None, {"cat": c, "label": old}))
                else:
                    old = cats.get(c)
                    cats[c] = f"L{rng.randrange(3)}"
                    if old is None:
                        records.append((lsn, "fz_cats", "INSERT", {"cat": c, "label": cats[c]}, None))
                    else:
                        records.append((lsn, "fz_cats", "UPDATE",
                                        {"cat": c, "label": cats[c]}, {"cat": c, "label": old}))
            elif kind == "depts":
                d = f"d{rng.randrange(3)}"
                if d in depts and rng.random() < 0.4:
                    old = depts.pop(d)
                    records.append((lsn, "fz_depts", "DELETE", None, {"dept": d, "floor": old}))
                else:
                    old = depts.get(d)
                    depts[d] = f"f{rng.randrange(3)}"
                    if old is None:
                        records.append((lsn, "fz_depts", "INSERT", {"dept": d, "floor": depts[d]}, None))
                    else:
                        records.append((lsn, "fz_depts", "UPDATE",
                                        {"dept": d, "floor": depts[d]}, {"dept": d, "floor": old}))
            elif kind == "coach":
                co = f"c{rng.randrange(3)}"
                if co in coaches and rng.random() < 0.4:
                    old = coaches.pop(co)
                    records.append((lsn, "fz_coach", "DELETE", None,
                                    {"coach": co, "grade": old}))
                else:
                    old = coaches.get(co)
                    coaches[co] = f"g{rng.randrange(3)}"
                    if old is None:
                        records.append((lsn, "fz_coach", "INSERT",
                                        {"coach": co, "grade": coaches[co]}, None))
                    else:
                        records.append((lsn, "fz_coach", "UPDATE",
                                        {"coach": co, "grade": coaches[co]},
                                        {"coach": co, "grade": old}))
            else:
                sub = rng.random()
                if sub < 0.5 or not notes:
                    nid = f"n{next_id:04d}"
                    next_id += 1
                    notes[nid] = (rng.choice(REGIONS), f"t{rng.randrange(5)}")
                    records.append((lsn, "fz_notes", "INSERT",
                                    {"nid": nid, "region": notes[nid][0], "txt": notes[nid][1]}, None))
                elif sub < 0.8:
                    nid = rng.choice(sorted(notes))
                    old = notes[nid]
                    notes[nid] = (
                        rng.choice(REGIONS) if rng.random() < 0.5 else old[0],
                        f"t{rng.randrange(5)}",
                    )
                    records.append((lsn, "fz_notes", "UPDATE",
                                    {"nid": nid, "region": notes[nid][0], "txt": notes[nid][1]},
                                    {"nid": nid, "region": old[0], "txt": old[1]}))
                else:
                    nid = rng.choice(sorted(notes))
                    old = notes.pop(nid)
                    records.append((lsn, "fz_notes", "DELETE", None,
                                    {"nid": nid, "region": old[0], "txt": old[1]}))
            lsn += 1
            continue
        if roll < 0.35 or not sales:  # insert
            sid = f"s{next_id:04d}"
            next_id += 1
            row = (rng.choice(REGIONS), rng.choice(CATS), rng.randrange(0, 101) / 4.0)
            sales[sid] = row
            records.append((lsn, "fz_sales", "INSERT",
                            {"id": sid, "region": row[0], "cat": row[1], "amount": row[2]}, None))
            lsn += 1
        elif roll < 0.65:  # update (sometimes migrating keys)
            sid = rng.choice(sorted(sales))
            old = sales[sid]
            new = (
                rng.choice(REGIONS) if rng.random() < 0.5 else old[0],
                rng.choice(CATS) if rng.random() < 0.3 else old[1],
                rng.randrange(0, 101) / 4.0,
            )
            sales[sid] = new
            before = {"id": sid, "region": old[0], "cat": old[1], "amount": old[2]}
            if dropped:
                before, dropped = None, False  # REPLICA IDENTITY gap → fallback
            records.append((lsn, "fz_sales", "UPDATE",
                            {"id": sid, "region": new[0], "cat": new[1], "amount": new[2]},
                            before))
            lsn += 1
        elif roll < 0.88:  # delete
            sid = rng.choice(sorted(sales))
            old = sales.pop(sid)
            records.append((lsn, "fz_sales", "DELETE", None,
                            {"id": sid, "region": old[0], "cat": old[1], "amount": old[2]}))
            lsn += 1
        elif roll < 0.91:  # dim churn (mgr and/or coach re-point)
            r = rng.choice([r for r in REGIONS if r is not None])
            if r in dims and rng.random() < 0.5:
                old = dims.pop(r)
                records.append((lsn, "fz_dims", "DELETE", None,
                                {"region": r, "mgr": old[0], "coach": old[1]}))
            else:
                old = dims.get(r)
                new_mgr = f"m{rng.randrange(4)}"
                new_coach = (
                    f"c{rng.randrange(3)}" if old is None or rng.random() < 0.5
                    else old[1]
                )
                dims[r] = (new_mgr, new_coach)
                if old is None:
                    records.append((lsn, "fz_dims", "INSERT",
                                    {"region": r, "mgr": new_mgr, "coach": new_coach},
                                    None))
                else:
                    records.append((lsn, "fz_dims", "UPDATE",
                                    {"region": r, "mgr": new_mgr, "coach": new_coach},
                                    {"region": r, "mgr": old[0], "coach": old[1]}))
            lsn += 1
        else:  # org churn (re-parent a manager's dept)
            m = f"m{rng.randrange(4)}"
            if m in org and rng.random() < 0.4:
                old = org.pop(m)
                records.append((lsn, "fz_org", "DELETE", None, {"mgr": m, "dept": old}))
            else:
                old = org.get(m)
                org[m] = f"d{rng.randrange(3)}"
                if old is None:
                    records.append((lsn, "fz_org", "INSERT", {"mgr": m, "dept": org[m]}, None))
                else:
                    records.append((lsn, "fz_org", "UPDATE",
                                    {"mgr": m, "dept": org[m]}, {"mgr": m, "dept": old}))
            lsn += 1
    # twin records for the fq_* id-keyed mirrors (SQL doc-tree lane):
    # the same churn with renamed key fields, so fq-dependent views see
    # every mutation — including the occasional dropped before-image
    def _fq(table, pay):
        if pay is None:
            return None
        if table == "fz_dims":
            return {"id": pay["region"], "mgr": pay["mgr"], "coach": pay["coach"]}
        if table == "fz_org":
            return {"id": pay["mgr"], "dept": pay["dept"]}
        return {"id": pay["id"], "region": pay["region"], "amount": pay["amount"]}

    twins = []
    for _l, table, op, after, before in records:
        if table in ("fz_dims", "fz_org", "fz_sales"):
            twins.append((lsn, table.replace("fz_", "fq_"), op,
                          _fq(table, after), _fq(table, before)))
            lsn += 1
    records += twins
    return records, next_id, lsn


def cdc_df(spark, records):
    rows = [
        (
            lsn, "public", table, op,
            (after or before or {}).get("id") or (after or before or {}).get("region", "?"),
            json.dumps(after) if after else None,
            json.dumps(before) if before else None,
        )
        for lsn, table, op, after, before in records
    ]
    return spark.createDataFrame(rows, CDC_COLS)


# ----------------------------------------------------------------- checking

def check_views(spark, sink, views, tag):
    errs = []
    for v in views:
        src = v.fn(spark) if v.fn is not None else v.compile(spark)
        want = {
            r[0]: _row_to_plain(r[1])
            for r in src.collect()
        }
        got = sink.indices.get(v.index, {})
        if got != want:
            only_got = {k: got[k] for k in set(got) - set(want)}
            only_want = {k: want[k] for k in set(want) - set(got)}
            diff = {
                k: (got[k], want[k])
                for k in set(got) & set(want)
                if got[k] != want[k]
            }
            errs.append(
                f"{tag} view={v.name}: +got {only_got} -want {only_want} diff {diff}"
            )
    return errs


def one_run(spark, seed, n_batches):
    rng = random.Random(seed)
    n_views = rng.randrange(2, 5)
    views = [rng.choice(MAKERS)(rng, f"fzv{i}") for i in range(n_views)]
    sales = {
        f"s{i:04d}": (rng.choice(REGIONS), rng.choice(CATS), rng.randrange(0, 101) / 4.0)
        for i in range(10)
    }
    dims = {"eu": ("m1", "c1"), "us": ("m2", "c0")}
    org = {"m0": "d0", "m1": "d1", "m2": "d0"}
    cats = {"a": "L0", "b": "L1"}
    depts = {"d0": "f0", "d1": "f1"}
    coaches = {"c0": "g0", "c1": "g1"}
    notes = {
        f"n{i:04d}": (rng.choice(REGIONS), f"t{rng.randrange(5)}")
        for i in range(4)
    }
    lines = {
        f"l{i:04d}": (f"s{rng.randrange(10):04d}", rng.randrange(0, 20) / 2.0)
        for i in range(6)
    }
    next_id, lsn = 10, 1
    register_truth(spark, sales, dims, org, cats, depts, notes, coaches, lines)

    root = tempfile.mkdtemp(prefix="fz_engine_")
    try:
        sink = InMemorySink()
        eng = SyncEngine(spark, views, sink, SnapshotStore(spark, root))
        eng.backfill()
        errs = check_views(spark, sink, views, f"seed={seed} backfill")
        if errs:
            return errs
        for b in range(1, n_batches + 1):
            records, next_id, lsn = gen_batch(
                rng, sales, dims, org, cats, depts, notes, coaches, next_id, lsn,
                drop_image=(b % 4 == 0), lines=lines,
            )
            register_truth(spark, sales, dims, org, cats, depts, notes, coaches, lines)
            batch = cdc_df(spark, records)
            eng.process_cdc_batch(batch, epoch_id=b)
            errs = check_views(spark, sink, views, f"seed={seed} batch={b}")
            if errs:
                return errs
            if rng.random() < 0.3:  # at-least-once verbatim redelivery
                eng.process_cdc_batch(batch, epoch_id=b)
                errs = check_views(spark, sink, views, f"seed={seed} batch={b}-replay")
                if errs:
                    return errs
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return []


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    base_seed = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    spark = get_spark("engine-fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    failures = 0
    for i in range(n_runs):
        seed = base_seed + i
        errs = one_run(spark, seed, n_batches)
        if errs:
            failures += 1
            for e in errs:
                print(f"[FAIL] {e}")
        else:
            print(f"[ok  ] seed={seed}")
    print(f"{failures} failures / {n_runs} runs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
