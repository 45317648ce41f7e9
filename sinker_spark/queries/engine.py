"""Engine-layer operators exposed as gate queries: snapshot-diff IVM,
CDC record parsing, and UDF registration paths — the Table A rows of
SURVEY.md §2 as driver-checkable lanes. EVERY query here carries a full
DuckDB oracle (the pandas-UDF lanes included: their Python-side math is
mirrored by exact SQL twins, so the registry has zero rows-only lanes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables, register_views
from sinker_spark.cdc import parse_test_decoding
from sinker_spark.ivm import snapshot_diff
from sinker_spark.queries import query
from sinker_spark.queries.helpers import dsum_expr, msum_expr


def _order_docs(t, mutate_mod: int | None = None) -> DataFrame:
    """(id, doc struct(orderkey,totalprice)) snapshot; optionally perturb
    every ``mutate_mod``-th doc to simulate a previous version."""
    price = F.col("o_totalprice")
    if mutate_mod:
        price = F.when(F.col("o_orderkey") % mutate_mod == 0, F.col("o_totalprice") + 1.0).otherwise(price)
    return t["orders"].select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.struct(F.col("o_orderkey").alias("orderkey"), price.alias("totalprice")).alias("doc"),
    )


@query(
    "ivm_snapshot_diff",
    oracle="""
    WITH new_s AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             struct_pack(orderkey := o_orderkey, totalprice := o_totalprice) AS doc
      FROM orders
    ),
    old_s AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             struct_pack(orderkey := o_orderkey,
                         totalprice := CASE WHEN o_orderkey % 3 = 0
                                            THEN o_totalprice + 1.0 ELSE o_totalprice END) AS doc
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT COALESCE(n.id, o.id) AS id,
           CASE WHEN n.id IS NULL THEN 'delete' ELSE 'upsert' END AS op,
           CASE WHEN n.id IS NULL THEN NULL
                ELSE CAST(to_json(n.doc) AS VARCHAR) END AS doc
    FROM new_s n FULL OUTER JOIN old_s o ON n.id = o.id
    WHERE n.id IS NULL OR o.id IS NULL
       OR md5(CAST(to_json(n.doc) AS VARCHAR)) <> md5(CAST(to_json(o.doc) AS VARCHAR))""",
    doc="A11 snapshot-diff IVM (ivm.snapshot_diff = REFRESH CONCURRENTLY's delta): old snapshot lacks every 7th key and perturbs every 3rd → upserts for new/changed ids, deletes for vanished ids",
    tags=("A11", "ivm"),
)
def ivm_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    new = _order_docs(t)
    old = _order_docs(t, mutate_mod=3).where(F.col("doc.orderkey") % 7 != 0)
    delta = snapshot_diff(old, new)
    return delta.select("id", "op", F.to_json("doc", {"ignoreNullFields": "false"}).alias("doc"))


_SLOT_LINE_SQL = (
    "concat('table public.orders: INSERT: id[text]:''', CAST(o_orderkey AS {str_t}), "
    "''' totalprice[numeric]:', CAST(o_totalprice AS {str_t}))"
)


@query(
    "cdc_parse_slot_lines",
    oracle=f"""
    WITH lines AS (
      SELECT o_orderkey AS lsn, {_SLOT_LINE_SQL.format(str_t="VARCHAR")} AS data FROM orders
    )
    SELECT lsn,
           regexp_extract(data, 'table\\s+"?([\\w-]+)"?\\."?([\\w-]+)"?:\\s+([A-Z]+):\\s+id\\[text\\]:''([\\w-]+)''', 1) AS schema,
           regexp_extract(data, 'table\\s+"?([\\w-]+)"?\\."?([\\w-]+)"?:\\s+([A-Z]+):\\s+id\\[text\\]:''([\\w-]+)''', 2) AS "table",
           regexp_extract(data, 'table\\s+"?([\\w-]+)"?\\."?([\\w-]+)"?:\\s+([A-Z]+):\\s+id\\[text\\]:''([\\w-]+)''', 3) AS op,
           regexp_extract(data, 'table\\s+"?([\\w-]+)"?\\."?([\\w-]+)"?:\\s+([A-Z]+):\\s+id\\[text\\]:''([\\w-]+)''', 4) AS id,
           CAST(NULL AS VARCHAR) AS payload
    FROM lines""",
    doc="A13/A14 CDC scan+parse (cdc.parse_test_decoding, SLOT_RE semantics): synthesize test_decoding lines from orders, parse with JVM regexp — no Python row loop",
    tags=("A13", "A14", "cdc"),
)
def cdc_parse_slot_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lines = t["orders"].select(
        F.col("o_orderkey").alias("lsn"),
        F.expr(_SLOT_LINE_SQL.format(str_t="STRING")).alias("data"),
    )
    return parse_test_decoding(lines)


@query(
    "exact_percentiles_by_status",
    oracle="""
    SELECT o_orderstatus AS status,
           quantile_cont(o_totalprice, 0.5)  AS median_price,
           quantile_cont(o_totalprice, 0.9)  AS p90_price,
           quantile_cont(o_totalprice, 0.99) AS p99_price
    FROM orders GROUP BY o_orderstatus""",
    doc="exact interpolated percentiles (Spark percentile == DuckDB quantile_cont bit-for-bit); the sketch-based twin is approx_percentile_prices",
    tags=("percentile",),
)
def exact_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus AS status,
               percentile(o_totalprice, 0.5)  AS median_price,
               percentile(o_totalprice, 0.9)  AS p90_price,
               percentile(o_totalprice, 0.99) AS p99_price
        FROM orders GROUP BY o_orderstatus""")


@query(
    "referential_integrity_check",
    oracle="""
    SELECT 'orders->customer' AS fk, COUNT(*) AS orphans FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->orders', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)""",
    doc="B22 constraint surface: FK orphan counts via left-anti joins (quality.orphan_foreign_keys) — Spark enforces nothing, the engine checks at load time",
    tags=("B22", "quality"),
)
def referential_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.quality import orphan_foreign_keys

    t = load_tables(spark, sf_dir)
    checks = [
        ("orders->customer", orphan_foreign_keys(t["orders"], t["customer"], "o_custkey", "c_custkey")),
        ("lineitem->orders", orphan_foreign_keys(t["lineitem"], t["orders"], "l_orderkey", "o_orderkey")),
        ("lineitem->part", orphan_foreign_keys(t["lineitem"], t["part"], "l_partkey", "p_partkey")),
    ]
    out = None
    for name, viol in checks:
        row = viol.agg(F.count("*").alias("orphans")).select(F.lit(name).alias("fk"), "orphans")
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "zscore_orders_sql",
    oracle=f"""
    WITH stats AS (
      SELECT o_orderstatus AS status,
             {dsum_expr('o_totalprice')} / CAST(COUNT(*) AS DOUBLE) AS mu,
             {dsum_expr('o_totalprice * o_totalprice')} AS sumsq,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey AS orderkey, s.status,
           round((o.o_totalprice - s.mu)
                 / sqrt((s.sumsq - CAST(s.n AS DOUBLE) * s.mu * s.mu) / CAST(s.n - 1 AS DOUBLE)),
                 6) AS zscore
    FROM orders o JOIN stats s ON o.o_orderstatus = s.status""",
    doc="per-group z-score, decimal-exact moments — the SQL twin the pandas-UDF lane is cross-checked against (tests/test_functions.py)",
    tags=("functions-stats",),
)
def zscore_orders_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(f"""
    WITH stats AS (
      SELECT o_orderstatus AS status,
             {dsum_expr('o_totalprice')} / CAST(COUNT(*) AS DOUBLE) AS mu,
             {dsum_expr('o_totalprice * o_totalprice')} AS sumsq,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey AS orderkey, s.status,
           round((o.o_totalprice - s.mu)
                 / sqrt((s.sumsq - CAST(s.n AS DOUBLE) * s.mu * s.mu) / CAST(s.n - 1 AS DOUBLE)),
                 6) AS zscore
    FROM orders o JOIN stats s ON o.o_orderstatus = s.status""")


@query(
    "udaf_zscore_pandas",
    oracle=f"""
    WITH stats AS (
      SELECT o_orderstatus AS status,
             {dsum_expr('o_totalprice')} / CAST(COUNT(*) AS DOUBLE) AS mu,
             {dsum_expr('o_totalprice * o_totalprice')} AS sumsq,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey AS orderkey, s.status,
           round((o.o_totalprice - s.mu)
                 / sqrt((s.sumsq - CAST(s.n AS DOUBLE) * s.mu * s.mu) / CAST(s.n - 1 AS DOUBLE)),
                 6) AS zscore
    FROM orders o JOIN stats s ON o.o_orderstatus = s.status""",
    doc="UDAF-style grouped-map applyInPandas z-score (functions.zscore_by_group): Arrow-batched, one shuffle on the group key; numpy mean/std(ddof=1) agrees with the decimal-exact SQL formulation within the 6-decimal rounding, so the pandas lane is oracle-checked, not just rows-only",
    tags=("udf", "pandas"),
)
def udaf_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.functions import zscore_by_group

    t = load_tables(spark, sf_dir)
    df = t["orders"].select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )
    return zscore_by_group(df, "status", "totalprice", "orderkey")


@query(
    "udf_norm_l2_pandas",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2
    FROM embeddings""",
    doc="registered pandas UDF (functions.norm_l2) callable from SQL: vectorized L2 norm over array<double>; numpy pairwise sum vs sequential sum agree within the 6-decimal rounding",
    tags=("udf", "pandas"),
)
def udf_norm_l2_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.functions import register_engine_functions

    register_engine_functions(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT vec_id, round(norm_l2(CAST(embedding AS ARRAY<DOUBLE>)), 6) AS l2 FROM embeddings"
    )


# --- skew mitigation operators (operators/skew.py) -----------------------
# Gate queries prove the salted paths produce EXACTLY the plain-join /
# plain-agg answers (the oracle is the unsalted SQL): salting changes the
# physical distribution, never the result. At 100 TB these are the
# fallback when AQE skew-join can't help (skewed aggregation keys, or a
# dim side too big to broadcast but small enough to replicate S×).


@query(
    "salted_join_supplier_volume",
    oracle=f"""
    SELECT s_name, COUNT(*) AS n_lines,
           {msum_expr('l_extendedprice')} AS sum_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s_name""",
    doc=(
        "salted equi-join (operators/skew.salted_join): dim replicated "
        "8x, fact salted, join on (key, salt) spreads a hot supplier over "
        "8 partitions; aggregate result provably identical to the plain "
        "join (the oracle)"
    ),
    tags=("skew", "join-salted"),
)
def salted_join_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.skew import salted_join
    from sinker_spark.queries.helpers import msum

    t = load_tables(spark, sf_dir)
    fact = t["lineitem"].withColumnRenamed("l_suppkey", "suppkey")
    dim = t["supplier"].withColumnRenamed("s_suppkey", "suppkey")
    return (
        salted_join(fact, dim, "suppkey", salt_buckets=8)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_lines"), msum("l_extendedprice").alias("sum_price"))
    )


@query(
    "salted_agg_supplier_totals",
    oracle="""
    SELECT l_suppkey AS suppkey,
           COUNT(l_orderkey) AS n_lines,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_suppkey""",
    doc=(
        "salted two-phase aggregation (operators/skew.salted_aggregate): "
        "partial agg on (key, salt) then final on key — the map-side "
        "combine split made explicit for keys whose single reducer would "
        "overflow; decimal partials keep the sum exact through both phases"
    ),
    tags=("skew", "agg-salted"),
)
def salted_agg_supplier_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.skew import salted_aggregate

    t = load_tables(spark, sf_dir)
    df = (
        t["lineitem"]
        .withColumnRenamed("l_suppkey", "suppkey")
        .withColumn("q_dec", F.col("l_quantity").cast("decimal(8,2)"))
    )
    agg = salted_aggregate(
        df,
        "suppkey",
        {"n_lines": ("count", "l_orderkey"), "sum_qty_dec": ("sum", "q_dec")},
        salt_buckets=8,
    )
    return agg.select(
        "suppkey",
        "n_lines",
        F.round(F.col("sum_qty_dec"), 2).cast("double").alias("sum_qty"),
    )


@query(
    "ivm_delta_agg_orders",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0)
    GROUP BY o_custkey""",
    doc=(
        "delta aggregate maintenance (ivm_delta.apply_agg_delta): state "
        "initialized without every-7th order, then a CDC batch inserts "
        "them and deletes every-5th — signed-delta fold, O(batch) not "
        "O(table); oracle recomputes the final set from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta"),
)
def ivm_delta_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_agg_delta, initial_agg_state

    t = load_tables(spark, sf_dir)
    o = t["orders"].withColumn("p_dec", F.col("o_totalprice").cast("decimal(18,2)"))
    keys, sums = ["o_custkey"], {"sum_price_dec": "p_dec"}
    init = initial_agg_state(o.where(F.col("o_orderkey") % 7 != 0), keys, sums)
    batch = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o.where((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    new_state = apply_agg_delta(init, batch, keys, sums)
    return new_state.select(
        F.col("o_custkey").alias("custkey"),
        F.col("__cnt").alias("n_orders"),
        F.round(F.col("sum_price_dec"), 2).cast("double").alias("sum_price"),
    )


@query(
    "ivm_minmax_agg_orders",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0)
    GROUP BY o_custkey""",
    doc=(
        "hybrid min/max aggregate maintenance (ivm_delta.fold_agg_minmax): "
        "count/sum fold as signed deltas; extremes fold exactly under "
        "inserts and only groups whose deleted values reach the stored "
        "extreme (without a same-batch insert re-covering it) pay a "
        "key-scoped recompute (recompute_agg_groups, broadcast semi-join "
        "prunes the fact scan) — never a full rescan; oracle recomputes "
        "the final set from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-minmax"),
)
def ivm_minmax_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        fold_agg_minmax,
        initial_agg_state,
        recompute_agg_groups,
    )

    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("p_dec")
    )
    keys, sums = ["o_custkey"], {"sum_price_dec": "p_dec"}
    maxes, mins = {"max_price_dec": "p_dec"}, {"min_price_dec": "p_dec"}
    init = initial_agg_state(o.where(F.col("o_orderkey") % 7 != 0), keys, sums, maxes, mins)
    batch = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o.where((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    new_state, dirty = fold_agg_minmax(init, batch, keys, sums, maxes, mins)
    final_fact = o.where(~((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0)))
    healed = recompute_agg_groups(new_state, final_fact, dirty, keys, sums, maxes, mins)
    return healed.select(
        F.col("o_custkey").alias("custkey"),
        F.col("__cnt").alias("n_orders"),
        F.round(F.col("sum_price_dec"), 2).cast("double").alias("sum_price"),
        F.col("max_price_dec").cast("double").alias("max_price"),
        F.col("min_price_dec").cast("double").alias("min_price"),
    )


@query(
    "udtf_tokenize_lateral",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                                   (t, i) -> {'pos': i - 1, 'tok': t})) AS tk
      FROM documents)
    SELECT doc_id, CAST(tk.pos AS INT) AS pos, tk.tok AS token
    FROM s WHERE tk.tok <> '' AND tk.pos < 5""",
    doc=(
        "registered Python UDTF (functions.tokenize) as a correlated "
        "LATERAL table function: first-5 (position, token) rows per "
        "document — the UDF/UDAF/UDTF registration surface's table-"
        "function lane; split semantics pinned to single-space so the "
        "generate_series oracle sees the identical multiset"
    ),
    tags=("udtf", "udf", "B9", "join-lateral"),
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.functions import register_engine_functions

    register_engine_functions(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents d, LATERAL tokenize(d.text) t
        WHERE t.pos < 5"""
    )


@query(
    "ivm_left_join_orders",
    oracle="""
    WITH b AS (
      SELECT l_orderkey AS okey, l_linenumber AS lineno, l_returnflag AS flag
      FROM lineitem
      WHERE l_linenumber <= 2
        AND (l_orderkey % 3 = 0 OR l_orderkey % 5 <> 0)),
    a AS (SELECT o_orderkey AS okey, o_orderstatus AS status FROM orders)
    SELECT a.okey, a.status, b.lineno, b.flag,
           CAST(b.okey IS NOT NULL AS INT) AS matched,
           CAST(COUNT(*) AS BIGINT) AS mult
    FROM a LEFT JOIN b ON a.okey = b.okey
    GROUP BY a.okey, a.status, b.lineno, b.flag, matched""",
    doc=(
        "left-outer-join maintenance (ivm_delta.left_join_delta): the "
        "padded set changes only where a key's B-multiplicity crosses "
        "zero — state seeded with every-3rd order's lines missing "
        "(padded) and batch-folded through inserts giving them their "
        "first match AND deletes stripping every-5th order's last match "
        "(pads return); oracle recomputes the final LOJ from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join", "B14"),
)
def ivm_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        apply_join_state,
        initial_left_join_state,
        left_join_delta,
    )

    t = load_tables(spark, sf_dir)
    a_all = t["orders"].select(F.col("o_orderkey").alias("okey"), F.col("o_orderstatus").alias("status"))
    b_all = t["lineitem"].where(F.col("l_linenumber") <= 2).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("l_returnflag").alias("flag"),
    )
    b_old = b_all.where(F.col("okey") % 3 != 0)
    empty_a = a_all.limit(0).withColumn("__op", F.lit("insert"))
    b_ch = (
        b_all.where(F.col("okey") % 3 == 0)
        .withColumn("__op", F.lit("insert"))  # first matches: pads retract
        .unionByName(
            b_old.where(F.col("okey") % 5 == 0).withColumn("__op", F.lit("delete"))
        )  # last matches lost: pads return
    )
    state = initial_left_join_state(a_all, b_old, ["okey"])
    delta = left_join_delta(a_all, b_old, empty_a, b_ch, ["okey"])
    final = apply_join_state(state, delta)
    return final.select(
        "okey",
        "status",
        "lineno",
        "flag",
        F.col("__matched").cast("int").alias("matched"),
        F.col("__mult").alias("mult"),
    )


@query(
    "ivm_loj_agg_customers",
    oracle="""
    WITH b AS (
      SELECT o_custkey AS custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders WHERE o_orderkey % 3 <> 0)
    SELECT c_custkey AS custkey, COUNT(*) AS n_rows,
           CAST(ROUND(SUM(b.p), 2) AS DOUBLE) AS sum_price
    FROM customer c LEFT JOIN b ON c.c_custkey = b.custkey
    GROUP BY 1""",
    doc=(
        "aggregate over a LEFT OUTER join, incrementally maintained "
        "(left_join_delta → join_delta_to_changes → apply_agg_delta): "
        "the batch deletes every-3rd order, re-padding customers who "
        "lose their last order — their count stays at the LOJ row "
        "semantics and their SUM returns to NULL via the non-null input "
        "counter (not the fold's additive-identity 0); oracle recomputes "
        "the final LEFT JOIN aggregate from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join", "B14", "B15"),
)
def ivm_loj_agg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        _nn,
        apply_agg_delta,
        initial_agg_state,
        join_delta_to_changes,
        left_join_delta,
    )

    t = load_tables(spark, sf_dir)
    a_all = t["customer"].select(F.col("c_custkey").alias("custkey"))
    b_all = t["orders"].select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    keys, sums = ["custkey"], {"sum_price_dec": "p"}
    state = initial_agg_state(a_all.join(b_all, ["custkey"], "left"), keys, sums)
    empty_a = a_all.limit(0).withColumn("__op", F.lit("insert"))
    b_ch = b_all.where(F.col("okey") % 3 == 0).withColumn("__op", F.lit("delete"))
    delta = left_join_delta(a_all, b_all, empty_a, b_ch, ["custkey"])
    new_state = apply_agg_delta(state, join_delta_to_changes(delta), keys, sums)
    return new_state.select(
        "custkey",
        F.col("__cnt").alias("n_rows"),
        F.when(
            F.col(_nn("sum_price_dec")) > 0, F.round(F.col("sum_price_dec"), 2)
        ).cast("double").alias("sum_price"),
    )


@query(
    "ivm_full_join_orders",
    oracle="""
    WITH b AS (
      SELECT l_orderkey AS okey, l_linenumber AS lineno, l_returnflag AS flag
      FROM lineitem WHERE l_linenumber <= 2),
    a AS (SELECT o_orderkey AS okey, o_orderstatus AS status
          FROM orders WHERE o_orderkey % 13 <> 0)
    SELECT COALESCE(a.okey, b.okey) AS okey, a.status, b.lineno, b.flag,
           CAST(a.okey IS NOT NULL AND b.okey IS NOT NULL AS INT) AS matched,
           CAST(COUNT(*) AS BIGINT) AS mult
    FROM a FULL JOIN b ON a.okey = b.okey
    GROUP BY 1, 2, 3, 4, 5""",
    doc=(
        "full-outer-join maintenance (ivm_delta.full_join_delta): the "
        "batch deletes every-13th order, so its remaining lines flip to "
        "B-side pads (NULL order columns) while line-less deleted orders "
        "retract their A-side pads — both padding directions of the "
        "symmetric zero-crossing rule; oracle recomputes the final FOJ "
        "from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join", "B14"),
)
def ivm_full_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        apply_join_state,
        full_join_delta,
        initial_full_join_state,
    )

    t = load_tables(spark, sf_dir)
    a_all = t["orders"].select(
        F.col("o_orderkey").alias("okey"), F.col("o_orderstatus").alias("status")
    )
    b_all = t["lineitem"].where(F.col("l_linenumber") <= 2).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("l_returnflag").alias("flag"),
    )
    a_ch = a_all.where(F.col("okey") % 13 == 0).withColumn("__op", F.lit("delete"))
    empty_b = b_all.limit(0).withColumn("__op", F.lit("insert"))
    state = initial_full_join_state(a_all, b_all, ["okey"])
    delta = full_join_delta(a_all, b_all, a_ch, empty_b, ["okey"])
    final = apply_join_state(state, delta)
    return final.select(
        "okey",
        "status",
        "lineno",
        "flag",
        F.col("__matched").cast("int").alias("matched"),
        F.col("__mult").alias("mult"),
    )


@query(
    "ivm_delta_join_orders",
    oracle="""
    WITH jn AS (
      SELECT o_orderkey AS okey, o_orderstatus AS status, l_returnflag AS flag
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_linenumber < 5)
    SELECT okey, status, flag, COUNT(*) AS mult
    FROM jn GROUP BY okey, status, flag""",
    doc=(
        "delta join maintenance (ivm_delta.join_delta, the bilinear IVM "
        "rule ΔA⋈B ⊎ A⋈ΔB ⊎ ΔA⋈ΔB with signed multiplicities): join-view "
        "state seeded without every-7th order, a CDC batch inserts those "
        "orders and deletes high-linenumber lines — O(|Δ|·fan-out) per "
        "refresh, never recomputing the view; oracle recomputes from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join"),
)
def ivm_delta_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, initial_join_state, join_delta

    t = load_tables(spark, sf_dir)
    a_all = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_orderstatus")
    a_old = a_all.where(F.col("okey") % 7 != 0)
    a_ch = a_all.where(F.col("okey") % 7 == 0).withColumn("__op", F.lit("insert"))

    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"), "l_returnflag", "l_linenumber"
    )
    b_old = li.drop("l_linenumber")
    b_ch = (
        li.where(F.col("l_linenumber") >= 5)
        .drop("l_linenumber")
        .withColumn("__op", F.lit("delete"))
    )

    state = initial_join_state(a_old, b_old, ["okey"])
    delta = join_delta(a_old, b_old, a_ch, b_ch, ["okey"])
    new_state = apply_join_state(state, delta)
    return new_state.select(
        "okey",
        F.col("o_orderstatus").alias("status"),
        F.col("l_returnflag").alias("flag"),
        F.col("__mult").alias("mult"),
    )


@query(
    "quality_expectations_suite",
    oracle="""
    WITH wide AS (
      SELECT
        CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS price_positive,
        CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS custkey_not_null,
        CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS status_in_domain,
        CAST(SUM(CASE WHEN o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'
                 THEN 0 ELSE 1 END) AS BIGINT) AS orderdate_in_range,
        CAST(SUM(CASE WHEN length(o_orderpriority) > 0 THEN 0 ELSE 1 END) AS BIGINT) AS priority_nonempty
      FROM orders)
    SELECT 'price_positive' AS check_name, price_positive AS n_violations, price_positive = 0 AS passed FROM wide
    UNION ALL SELECT 'custkey_not_null', custkey_not_null, custkey_not_null = 0 FROM wide
    UNION ALL SELECT 'status_in_domain', status_in_domain, status_in_domain = 0 FROM wide
    UNION ALL SELECT 'orderdate_in_range', orderdate_in_range, orderdate_in_range = 0 FROM wide
    UNION ALL SELECT 'priority_nonempty', priority_nonempty, priority_nonempty = 0 FROM wide""",
    doc=(
        "declarative data-quality expectation suite (quality.expectations "
        "— the dbt-test analog): range / not-null / domain / date-window / "
        "non-empty checks over orders, ALL evaluated in one scan as "
        "conditional counts inside a single map-side-combined aggregation "
        "— a 20-check suite at 100 TB costs one pass, not 20"
    ),
    tags=("B22", "quality", "expectations"),
)
def quality_expectations_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.quality import expectations

    t = load_tables(spark, sf_dir)
    out = expectations(
        t["orders"],
        {
            "price_positive": F.col("o_totalprice") > 0,
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "orderdate_in_range": F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
            "priority_nonempty": F.length("o_orderpriority") > 0,
        },
    )
    return out.withColumnRenamed("check", "check_name")


@query(
    "ivm_topk_orders",
    oracle="""
    WITH final_fact AS (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
      WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0)
    )
    SELECT custkey, orderkey, cents, rank FROM (
      SELECT custkey, orderkey, cents,
             row_number() OVER (PARTITION BY custkey ORDER BY cents DESC, orderkey) AS rank
      FROM final_fact) t
    WHERE rank <= 3""",
    doc=(
        "incremental top-k view maintenance (ivm_topk): buffered "
        "top-(k+buffer) state per customer initialized without every-7th "
        "order, then one CDC batch inserts them and deletes every-5th — "
        "inserts fold in O(batch), deletes absorb into the buffer, and "
        "buffer-exhausted groups route through the scoped dirty-group "
        "recompute before serving. Oracle recomputes the final top-3 "
        "from scratch, so the full fold+heal protocol must land exactly"
    ),
    tags=("A11", "ivm", "ivm-topk", "window"),
)
def ivm_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_topk import (
        apply_topk_delta,
        initial_topk_state,
        recompute_groups,
        topk_view,
    )

    t = load_tables(spark, sf_dir)
    fact = t["orders"].select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    keys, k, buf = ["custkey"], 3, 2
    init_fact = fact.where(F.col("orderkey") % 7 != 0)
    rows, counts = initial_topk_state(init_fact, keys, "cents", "orderkey", k, buf)
    batch = (
        fact.where(F.col("orderkey") % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            fact.where((F.col("orderkey") % 5 == 0) & (F.col("orderkey") % 7 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    rows, counts, dirty = apply_topk_delta(rows, counts, batch, keys, "cents", "orderkey", k, buf)
    final_fact = fact.where(~((F.col("orderkey") % 5 == 0) & (F.col("orderkey") % 7 != 0)))
    rows = recompute_groups(rows, final_fact, dirty, keys, "cents", "orderkey", k, buf)
    return topk_view(rows, keys, "cents", "orderkey", k)


@query(
    "ivm_join_agg_orders",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 97 <> 0),
    l AS (SELECT l_orderkey, l_quantity FROM lineitem
          WHERE NOT (l_orderkey % 5 = 0 AND l_orderkey % 7 <> 0))
    SELECT o.o_custkey AS custkey, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM o JOIN l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey""",
    doc=(
        "composed IVM — aggregate over a join, Δ(γ(A⋈B)) "
        "(ivm_delta.join_delta → join_delta_to_changes → "
        "apply_agg_delta): per-customer line counts/quantity sums over "
        "orders⋈lineitem, state initialized without every-7th line, then "
        "ONE batch inserts those, deletes every-5th line AND deletes "
        "every-97th order (two-sided change incl. the ΔA⋈ΔB term) — all "
        "folded through signed multiplicities, never recomputing the "
        "join. Oracle recomputes the final aggregate from scratch"
    ),
    tags=("A11", "ivm", "ivm-join", "ivm-delta", "composition"),
)
def ivm_join_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark import ivm_delta

    t = load_tables(spark, sf_dir)
    o_full = t["orders"].select("o_orderkey", "o_custkey")
    l_full = t["lineitem"].select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    keys, sums = ["o_custkey"], {"sum_qty_dec": "CAST(l_quantity AS DECIMAL(18,2))"}
    o_init = o_full
    l_init = l_full.where(F.col("o_orderkey") % 7 != 0)
    a_state = ivm_delta.relation_state(o_init)
    b_state = ivm_delta.relation_state(l_init)
    agg = ivm_delta.initial_agg_state(o_init.join(l_init, "o_orderkey"), keys, sums)
    a_ch = o_full.where(F.col("o_orderkey") % 97 == 0).withColumn("__op", F.lit("delete"))
    b_ch = (
        l_full.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            l_full.where((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    delta = ivm_delta.join_delta(a_state, b_state, a_ch, b_ch, ["o_orderkey"])
    new_agg = ivm_delta.apply_agg_delta(
        agg, ivm_delta.join_delta_to_changes(delta), keys, sums
    )
    return new_agg.select(
        F.col("o_custkey").alias("custkey"),
        F.col("__cnt").alias("n_rows"),
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]


@query(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM orders"""
        for c in _PROFILE_COLS
    ),
    doc=(
        "table profiling — the 'describe my data' primitive every "
        "engine ships: per column of orders, row count, null count, "
        "exact distinct count, min and max (stringified so one relation "
        "carries every type). One aggregation pass per column over the "
        "same scan (Spark runs them as parallel jobs; at 100 TB swap "
        "exact distincts for approx_count_distinct — the approx lane "
        "next door). Timestamps render in DuckDB's canonical form in "
        "both engines. The onboarding/data-contract companion to the "
        "quality-expectation suite"
    ),
    tags=("profiling", "quality", "B19"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    parts = []
    for c in _PROFILE_COLS:
        col = F.col(c)

        def render(x, c=c):
            # min/max on the NATIVE type (numeric order, not lexicographic),
            # stringified after — timestamps in DuckDB's canonical form
            if dict(o.dtypes)[c].startswith("timestamp"):
                return F.date_format(x, "yyyy-MM-dd HH:mm:ss")
            return x.cast("string")

        parts.append(
            o.agg(
                F.lit(c).alias("col_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
                F.countDistinct(col).cast("bigint").alias("n_distinct"),
                render(F.min(col)).alias("min_val"),
                render(F.max(col)).alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "ivm_exact_distinct_orders",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS n_rows,
           COUNT(DISTINCT o_orderpriority) AS n_distinct
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0)
    GROUP BY o_custkey""",
    doc=(
        "EXACT distinct-count maintenance via support counts "
        "(ivm_delta.initial_distinct_state/apply_distinct_delta): one "
        "state row per distinct (group, value) with its multiplicity — "
        "the classic IVM duplicate-elimination annotation — so unlike "
        "the monotone HLL register lane, deletes fold in O(batch): a "
        "value leaves the distinct set exactly when its support hits 0. "
        "Seeds state from a 6/7 subset, folds inserts of the held-out "
        "sevenths plus deletes of the fifths, serves (n_rows, "
        "n_distinct) per group; oracle recomputes the final set from "
        "scratch. State is (group, value)-sized — the same order as the "
        "group-by's own shuffle keyspace — and stays co-partitioned "
        "with the merge"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-distinct"),
)
def ivm_exact_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        apply_distinct_delta,
        distinct_counts,
        initial_distinct_state,
    )

    t = load_tables(spark, sf_dir)
    o = t["orders"]
    keys = ["o_custkey"]
    init = initial_distinct_state(
        o.where(F.col("o_orderkey") % 7 != 0), keys, "o_orderpriority"
    )
    batch = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o.where((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    new_state = apply_distinct_delta(init, batch, keys, "o_orderpriority")
    return distinct_counts(new_state, keys).select(
        F.col("o_custkey").alias("custkey"), "n_rows", "n_distinct"
    )


@query(
    "ivm_having_agg_orders",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0)
    GROUP BY o_custkey
    HAVING COUNT(*) >= 2
       AND CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) > 200000.0""",
    doc=(
        "HAVING-filtered delta-aggregate maintenance (AggViewSpec."
        "having): the signed fold keeps state for EVERY group, the "
        "served set is filtered by the predicate over the doc-visible "
        "values, and boundary crossings emit upsert/retract — so a "
        "group that dips below the threshold retracts its doc while "
        "its state stays ready to cross back. The gate replays the "
        "delta-agg scenario and serves only passing groups; the oracle "
        "is the same recompute with SQL HAVING — both paths must agree "
        "on the predicate evaluated over the rounded double rendering"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-having"),
)
def ivm_having_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_agg_delta, initial_agg_state

    t = load_tables(spark, sf_dir)
    o = t["orders"].withColumn("p_dec", F.col("o_totalprice").cast("decimal(18,2)"))
    keys, sums = ["o_custkey"], {"sum_price_dec": "p_dec"}
    init = initial_agg_state(o.where(F.col("o_orderkey") % 7 != 0), keys, sums)
    batch = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o.where((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    new_state = apply_agg_delta(init, batch, keys, sums)
    doc_view = new_state.select(
        F.col("o_custkey").alias("custkey"),
        F.col("__cnt").alias("n_orders"),
        F.round(F.col("sum_price_dec"), 2).cast("double").alias("sum_price"),
    )
    return doc_view.where("n_orders >= 2 AND sum_price > 200000.0")


@query(
    "ivm_anti_join_customers",
    oracle="""
    SELECT c.c_custkey AS custkey
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % 10 = 7)""",
    doc=(
        "incrementally maintained ANTI-JOIN (customers with NO "
        "surviving orders) by composition: the LOJ-aggregate lane "
        "tracks a matched-row indicator sum per customer, whose "
        "non-null input counter hits 0 exactly when the last matching "
        "order leaves (the LOJ re-pad) — so `NOT EXISTS` falls out of "
        "machinery the engine already maintains in O(batch), no new "
        "operator and no fact scan. The batch deletes nine of every "
        "ten orders; "
        "customers whose orders all vanish (plus the never-matched) "
        "form the served set; oracle recomputes NOT EXISTS from "
        "scratch. The same composition with `n_matched IS NOT NULL` "
        "(or a count threshold via AggViewSpec.having) serves the "
        "SEMI-join"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join", "anti-join"),
)
def ivm_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        _nn,
        apply_agg_delta,
        initial_agg_state,
        join_delta_to_changes,
        left_join_delta,
    )

    t = load_tables(spark, sf_dir)
    a_all = t["customer"].select(F.col("c_custkey").alias("custkey"))
    b_all = t["orders"].select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
    )
    keys = ["custkey"]
    sums = {"n_matched": "CAST(CASE WHEN okey IS NOT NULL THEN 1 END AS DECIMAL(10,0))"}
    state = initial_agg_state(a_all.join(b_all, ["custkey"], "left"), keys, sums)
    empty_a = a_all.limit(0).withColumn("__op", F.lit("insert"))
    b_ch = b_all.where(F.col("okey") % 10 != 7).withColumn("__op", F.lit("delete"))
    delta = left_join_delta(a_all, b_all, empty_a, b_ch, ["custkey"])
    new_state = apply_agg_delta(state, join_delta_to_changes(delta), keys, sums)
    return new_state.where(F.col(_nn("n_matched")) == 0).select("custkey")


@query(
    "ivm_join_chain_orders",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS okey, o_custkey AS custkey FROM orders
      WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0)),
    c AS (
      SELECT c_custkey AS custkey, c_nationkey AS nkey FROM customer),
    n AS (
      SELECT n_nationkey AS nkey, n_name AS nname FROM nation
      WHERE n_nationkey % 7 <> 0)
    SELECT o.okey, o.custkey, c.nkey, n.nname, COUNT(*) AS mult
    FROM o JOIN c USING (custkey) JOIN n USING (nkey)
    GROUP BY 1, 2, 3, 4""",
    doc=(
        "N-WAY join-chain maintenance (JoinChainViewSpec cascade): "
        "orders⋈customer⋈nation refreshed by feeding stage 1's signed "
        "delta (expanded to change rows) into stage 2's bilinear rule "
        "against the stored prefix state — one batch mutates BOTH ends "
        "of the chain (order inserts+deletes AND nation deletes) and "
        "the cascade nets them in O(|Δ|·fan-out) with no 3-way product "
        "recomputed; oracle rebuilds the final chain from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join", "ivm-chain"),
)
def ivm_join_chain_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        apply_join_state,
        join_delta,
        join_delta_to_changes,
        relation_state,
    )

    t = load_tables(spark, sf_dir)
    o_all = t["orders"].select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("custkey")
    )
    o_old = o_all.where(F.col("okey") % 3 != 0)
    c_all = t["customer"].select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nkey")
    )
    n_all = t["nation"].select(
        F.col("n_nationkey").alias("nkey"), F.col("n_name").alias("nname")
    )
    r0, r1, r2 = relation_state(o_old), relation_state(c_all), relation_state(n_all)
    j2 = relation_state(o_old.join(c_all, ["custkey"]))
    j3 = relation_state(o_old.join(c_all, ["custkey"]).join(n_all, ["nkey"]))

    o_ch = (
        o_all.where(F.col("okey") % 3 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o_all.where((F.col("okey") % 5 == 0) & (F.col("okey") % 3 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    c_ch = c_all.limit(0).withColumn("__op", F.lit("insert"))
    n_ch = n_all.where(F.col("nkey") % 7 == 0).withColumn("__op", F.lit("delete"))

    d2 = join_delta(r0, r1, o_ch, c_ch, ["custkey"])
    d3 = join_delta(j2, r2, join_delta_to_changes(d2), n_ch, ["nkey"])
    final = apply_join_state(j3, d3)
    return final.select("okey", "custkey", "nkey", "nname", F.col("__mult").alias("mult"))


@query(
    "ivm_chain_agg_revenue",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS okey, o_custkey AS custkey, o_totalprice AS price
      FROM orders WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0)),
    c AS (
      SELECT c_custkey AS custkey, c_nationkey AS nkey FROM customer),
    n AS (
      SELECT n_nationkey AS nkey, n_name AS nname FROM nation
      WHERE n_nationkey % 7 <> 0)
    SELECT n.nname, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o.price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM o JOIN c USING (custkey) JOIN n USING (nkey)
    GROUP BY n.nname""",
    doc=(
        "aggregate OVER an N-way join chain, Δ(γ(T1⋈T2⋈T3)) "
        "(JoinChainViewSpec aggregate mode): per-nation order counts "
        "and revenue over orders⋈customer⋈nation — the chain cascade's "
        "final signed delta pipes into the linear aggregate fold "
        "(apply_agg_delta), so the denormalized-rollup view class "
        "refreshes in O(|Δ|·fan-out) with neither the 3-way join nor "
        "the aggregate ever recomputed. One batch mutates BOTH chain "
        "ends (order inserts+deletes AND nation deletes — group "
        "retractions); oracle rebuilds the rollup from scratch"
    ),
    tags=("A11", "ivm", "ivm-delta", "ivm-join", "ivm-chain", "composition"),
)
def ivm_chain_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import (
        apply_agg_delta,
        initial_agg_state,
        join_delta,
        join_delta_to_changes,
        relation_state,
    )

    t = load_tables(spark, sf_dir)
    o_all = t["orders"].select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("price"),
    )
    o_old = o_all.where(F.col("okey") % 3 != 0)
    c_all = t["customer"].select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nkey")
    )
    n_all = t["nation"].select(
        F.col("n_nationkey").alias("nkey"), F.col("n_name").alias("nname")
    )
    keys, sums = ["nname"], {"sum_price_dec": "CAST(price AS DECIMAL(18,2))"}
    r0, r1, r2 = relation_state(o_old), relation_state(c_all), relation_state(n_all)
    j2 = relation_state(o_old.join(c_all, ["custkey"]))
    agg = initial_agg_state(
        o_old.join(c_all, ["custkey"]).join(n_all, ["nkey"]), keys, sums
    )

    o_ch = (
        o_all.where(F.col("okey") % 3 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o_all.where((F.col("okey") % 5 == 0) & (F.col("okey") % 3 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    c_ch = c_all.limit(0).withColumn("__op", F.lit("insert"))
    n_ch = n_all.where(F.col("nkey") % 7 == 0).withColumn("__op", F.lit("delete"))

    d2 = join_delta(r0, r1, o_ch, c_ch, ["custkey"])
    d3 = join_delta(j2, r2, join_delta_to_changes(d2), n_ch, ["nkey"])
    new_agg = apply_agg_delta(agg, join_delta_to_changes(d3), keys, sums)
    return new_agg.select(
        "nname",
        F.col("__cnt").alias("n_rows"),
        F.col("sum_price_dec").cast("double").alias("sum_price"),
    )


@query(
    "ivm_nested_doc_orders",
    oracle="""
    WITH p AS (
      SELECT o_orderkey AS okey, o_custkey AS cust FROM orders
      WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0)),
    c AS (
      SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT o_orderkey AS okey FROM orders
      WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
      UNION
      SELECT DISTINCT l_orderkey FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0)
    SELECT p.okey, p.cust,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_lines,
           COALESCE(agg.s, '') AS lines_str
    FROM p JOIN touched USING (okey)
    LEFT JOIN (
      SELECT okey, COUNT(*) AS n,
             string_agg(line || ':' || qty, ';' ORDER BY line, qty) AS s
      FROM c GROUP BY okey) agg USING (okey)""",
    doc=(
        "nested-document maintenance (NestedDocViewSpec / ivm_doc): the "
        "reference's FLAGSHIP shape — one doc per order carrying a "
        "sorted lineitem array — refreshed from parent/child "
        "multiplicity states: ONE batch inserts+deletes orders AND "
        "inserts+deletes lines, and only the touched parents' arrays "
        "are rebuilt (build_docs over state restricted to touched keys "
        "— neither base table rescanned). Output = the touched docs "
        "the lane upserts, child array serialized line:qty;… for "
        "hashing; oracle rebuilds them from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "B4", "B7", "composition"),
)
def ivm_nested_doc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc import build_docs

    t = load_tables(spark, sf_dir)
    o_all = t["orders"].select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("cust")
    )
    l_all = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    o_old = o_all.where(F.col("okey") % 3 != 0)
    l_old = l_all.where((F.col("okey") + F.col("line")) % 7 != 0)
    p_state, c_state = relation_state(o_old), relation_state(l_old)

    p_ch = (
        o_all.where(F.col("okey") % 3 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            o_all.where((F.col("okey") % 5 == 0) & (F.col("okey") % 3 != 0))
            .withColumn("__op", F.lit("delete"))
        )
    )
    c_ch = (
        l_all.where((F.col("okey") + F.col("line")) % 7 == 0)
        .withColumn("__op", F.lit("insert"))
        .unionByName(
            l_all.where(
                (F.col("okey") % 11 == 0) & ((F.col("okey") + F.col("line")) % 7 != 0)
            ).withColumn("__op", F.lit("delete"))
        )
    )
    new_p = apply_join_state(p_state, changes_to_mult(p_ch))
    new_c = apply_join_state(c_state, changes_to_mult(c_ch))
    touched = p_ch.select("okey").unionByName(c_ch.select("okey")).distinct()
    docs = build_docs(
        new_p.join(touched, ["okey"], "left_semi"),
        new_c.join(touched, ["okey"], "left_semi"),
        ["okey"],
        child_alias="lines",
        child_order=["line", "qty"],
    )
    return docs.select(
        "okey",
        "cust",
        F.size("lines").cast("bigint").alias("n_lines"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("lines"),
                lambda x: F.concat_ws(":", x["line"].cast("string"), x["qty"].cast("string")),
            ),
        ).alias("lines_str"),
    )


@query(
    "ivm_flagship_doc",
    oracle="""
    WITH
    o_post AS (SELECT o_orderkey AS okey, o_custkey AS cust FROM orders
               WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (SELECT c_custkey AS ckey,
                      CASE WHEN c_custkey % 4 = 0 THEN c_name || '*' ELSE c_name END AS cname,
                      c_nationkey AS nkey FROM customer),
    n_post AS (SELECT n_nationkey AS natkey,
                      CASE WHEN n_nationkey % 2 = 0 THEN n_name || '!' ELSE n_name END AS nname,
                      n_regionkey AS rkey FROM nation),
    r_post AS (SELECT r_regionkey AS regkey,
                      CASE WHEN r_regionkey = 1 THEN r_name || '?' ELSE r_name END AS rname
               FROM region),
    l_post AS (SELECT l_orderkey AS lokey, CAST(l_linenumber AS BIGINT) AS line,
                      CAST(l_quantity AS BIGINT) AS qty, l_partkey AS pkey
               FROM lineitem
               WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    p_post AS (SELECT p_partkey AS partkey,
                      CASE WHEN p_partkey % 10 = 0 THEN p_name || '+' ELSE p_name END AS pname
               FROM part),
    touched AS (
      SELECT DISTINCT okey FROM (
        SELECT o_orderkey AS okey FROM orders
        WHERE o_orderkey % 3 = 0 OR (o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0)
        UNION ALL
        SELECT l_orderkey FROM lineitem
        WHERE (l_orderkey + l_linenumber) % 7 = 0
           OR (l_orderkey % 11 = 0 AND (l_orderkey + l_linenumber) % 7 <> 0)
        UNION ALL
        SELECT o.okey FROM o_post o WHERE o.cust % 4 = 0
        UNION ALL
        SELECT o.okey FROM o_post o JOIN c_post c ON o.cust = c.ckey
        WHERE c.nkey % 2 = 0
        UNION ALL
        SELECT o.okey FROM o_post o JOIN c_post c ON o.cust = c.ckey
        JOIN n_post n ON c.nkey = n.natkey WHERE n.rkey = 1
        UNION ALL
        SELECT l.lokey FROM l_post l WHERE l.pkey % 10 = 0
      )
    )
    SELECT o.okey, c.cname AS cust_name, n.nname AS nation_name, r.rname AS region_name,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_items, COALESCE(agg.s, '') AS items_str
    FROM o_post o
    JOIN touched ON o.okey = touched.okey
    JOIN c_post c ON o.cust = c.ckey
    JOIN n_post n ON c.nkey = n.natkey
    JOIN r_post r ON n.rkey = r.regkey
    LEFT JOIN (
      SELECT l.lokey, COUNT(*) AS n,
             string_agg(l.line || ':' || l.qty || ':' || l.pkey || ':' || COALESCE(p.pname, '?'),
                        ';' ORDER BY l.line, l.qty, l.pkey) AS s
      FROM l_post l LEFT JOIN p_post p ON l.pkey = p.partkey
      GROUP BY l.lokey) agg ON o.okey = agg.lokey""",
    doc=(
        "FULLY-INCREMENTAL FLAGSHIP DOC (DocTreeViewSpec / ivm_flagship): "
        "the COMPLETE course_mv shape — orders parent + to-one dim chain "
        "customer->nation->region (course->teacher->person) + lineitems "
        "array whose elements carry a part lookup (enrollment->student-> "
        "person) — refreshed as a PURE DELTA FOLD from ONE batch mutating "
        "ALL SIX tables (order insert+delete, lineitem insert+delete, "
        "customer/nation/region/part renames). Dim deltas walk per-hop "
        "reverse indexes back to affected parent keys (O(affected docs), "
        "no scoped recompute, no table rescans); docs rebuilt from state "
        "restricted to reachable keys. Output = the touched docs the lane "
        "upserts, arrays serialized line:qty:pkey:pname;... for hashing; "
        "oracle rebuilds them from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "B4", "B5", "B6", "B7", "composition", "flagship"),
)
def ivm_flagship_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_flagship import (
        relation_rows_for, serve_docs, touched_parent_keys,
    )
    from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec

    t = load_tables(spark, sf_dir)
    o_all = t["orders"].select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("cust")
    )
    c_all = t["customer"].select(
        F.col("c_custkey").alias("ckey"), F.col("c_name").alias("cname"),
        F.col("c_nationkey").alias("nkey"),
    )
    n_all = t["nation"].select(
        F.col("n_nationkey").alias("natkey"), F.col("n_name").alias("nname"),
        F.col("n_regionkey").alias("rkey"),
    )
    r_all = t["region"].select(
        F.col("r_regionkey").alias("regkey"), F.col("r_name").alias("rname")
    )
    l_all = t["lineitem"].select(
        F.col("l_orderkey").alias("lokey"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_partkey").alias("pkey"),
    )
    p_all = t["part"].select(
        F.col("p_partkey").alias("partkey"), F.col("p_name").alias("pname")
    )

    spec = DocTreeViewSpec(
        parent_table="orders", key="okey",
        row_schema_parent="okey bigint, cust bigint",
        dims=[
            DimLookup("customer", fk="cust", key="ckey",
                      row_schema="ckey bigint, cname string, nkey bigint"),
            DimLookup("nation", fk="nkey", key="natkey",
                      row_schema="natkey bigint, nname string, rkey bigint"),
            DimLookup("region", fk="rkey", key="regkey",
                      row_schema="regkey bigint, rname string"),
        ],
        children=[
            ChildArraySpec(
                table="lineitem", fk="lokey",
                row_schema="lokey bigint, line bigint, qty bigint, pkey bigint",
                alias="items", order=["line", "qty", "pkey"],
                dims=[DimLookup("part", fk="pkey", key="partkey",
                                row_schema="partkey bigint, pname string")],
            )
        ],
    )

    ins, dele = F.lit("insert"), F.lit("delete")

    # orders: insert %3==0, delete %5==0 (of the pre-batch rows)
    o_old = o_all.where(F.col("okey") % 3 != 0)
    o_ch = (
        o_all.where(F.col("okey") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("okey") % 5 == 0) & (F.col("okey") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    # customer/nation/region/part: RENAME every k-th row (update =
    # delete(before)+insert(after) — the dim fan-out the lane must chase)
    def rename(all_df, keycol, namecol, pred, suffix):
        new = all_df.withColumn(
            namecol,
            F.when(pred, F.concat(F.col(namecol), F.lit(suffix))).otherwise(F.col(namecol)),
        )
        ch = (
            all_df.where(pred).withColumn("__op", dele)
            .unionByName(new.where(pred).withColumn("__op", ins))
        )
        return new, ch

    c_new, c_ch = rename(c_all, "ckey", "cname", F.col("ckey") % 4 == 0, "*")
    n_new, n_ch = rename(n_all, "natkey", "nname", F.col("natkey") % 2 == 0, "!")
    r_new, r_ch = rename(r_all, "regkey", "rname", F.col("regkey") == 1, "?")
    p_new, p_ch = rename(p_all, "partkey", "pname", F.col("partkey") % 10 == 0, "+")
    # lineitem: insert (okey+line)%7==0, delete okey%11==0
    l_old = l_all.where((F.col("lokey") + F.col("line")) % 7 != 0)
    l_ch = (
        l_all.where((F.col("lokey") + F.col("line")) % 7 == 0).withColumn("__op", ins)
        .unionByName(
            l_all.where(
                (F.col("lokey") % 11 == 0) & ((F.col("lokey") + F.col("line")) % 7 != 0)
            ).withColumn("__op", dele)
        )
    )

    # fold every base state old → post (the lane's per-batch fold)
    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "d1": apply_join_state(relation_state(n_all), changes_to_mult(n_ch)),
        "d2": apply_join_state(relation_state(r_all), changes_to_mult(r_ch)),
        "c0": apply_join_state(relation_state(l_old), changes_to_mult(l_ch)),
        "c0d0": apply_join_state(relation_state(p_all), changes_to_mult(p_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("okey"),
        "d0": c_ch.select("ckey"),
        "d1": n_ch.select("natkey"),
        "d2": r_ch.select("regkey"),
        "c0": l_ch.select("lokey"),
        "c0d0": p_ch.select("partkey"),
    }
    touched = touched_parent_keys(spec, change_keys, rows_for)
    docs = serve_docs(spec, touched, rows_for)
    return docs.select(
        "okey",
        F.col("cname").alias("cust_name"),
        F.col("nname").alias("nation_name"),
        F.col("rname").alias("region_name"),
        F.size("items").cast("bigint").alias("n_items"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("items"),
                lambda x: F.concat_ws(
                    ":",
                    x["line"].cast("string"), x["qty"].cast("string"),
                    x["pkey"].cast("string"), F.coalesce(x["pname"], F.lit("?")),
                ),
            ),
        ).alias("items_str"),
    )


@query(
    "ivm_multi_child_doc",
    oracle="""
    WITH
    n_post AS (SELECT n_nationkey AS natkey,
                      CASE WHEN n_nationkey % 3 = 0 THEN n_name || '!' ELSE n_name END AS nname
               FROM nation),
    c_post AS (SELECT c_custkey AS ckey, c_nationkey AS cnat,
                      CAST(c_acctbal AS DOUBLE) AS cbal
               FROM customer
               WHERE c_custkey % 4 = 0 OR c_custkey % 5 <> 0),
    s_post AS (SELECT s_suppkey AS skey, s_nationkey AS snat, s_name AS sname
               FROM supplier
               WHERE s_suppkey % 6 = 0 OR s_suppkey % 7 <> 0),
    touched AS (
      SELECT DISTINCT natkey FROM (
        SELECT n_nationkey AS natkey FROM nation WHERE n_nationkey % 3 = 0
        UNION ALL
        SELECT c_nationkey FROM customer
        WHERE c_custkey % 4 = 0 OR (c_custkey % 5 = 0 AND c_custkey % 4 <> 0)
        UNION ALL
        SELECT s_nationkey FROM supplier
        WHERE s_suppkey % 6 = 0 OR (s_suppkey % 7 = 0 AND s_suppkey % 6 <> 0)
      )
    )
    SELECT n.natkey, n.nname AS nation_name,
           CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_custs,
           COALESCE(ca.s, '') AS custs_str,
           CAST(COALESCE(sa.n, 0) AS BIGINT) AS n_supps,
           COALESCE(sa.s, '') AS supps_str
    FROM n_post n
    JOIN touched ON n.natkey = touched.natkey
    LEFT JOIN (
      SELECT cnat, COUNT(*) AS n,
             string_agg(ckey || ':' || CAST(floor(cbal) AS BIGINT), ';' ORDER BY ckey) AS s
      FROM c_post GROUP BY cnat) ca ON n.natkey = ca.cnat
    LEFT JOIN (
      SELECT snat, COUNT(*) AS n,
             string_agg(skey || ':' || sname, ';' ORDER BY skey) AS s
      FROM s_post GROUP BY snat) sa ON n.natkey = sa.snat""",
    doc=(
        "MULTI-CHILD nested doc (DocTreeViewSpec, N=2 arrays): one doc "
        "per nation carrying BOTH a customers array and a suppliers "
        "array (the reference README person example nests multiple "
        "to-many relations) — ONE batch renames nations AND inserts+ "
        "deletes customers AND suppliers; only the touched nations' "
        "docs are re-served from state (both arrays rebuilt only where "
        "touched, no base rescans). Arrays serialized for hashing; "
        "oracle rebuilds from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "B7", "composition"),
)
def ivm_multi_child_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_flagship import (
        relation_rows_for, serve_docs, touched_parent_keys,
    )
    from sinker_spark.views import ChildArraySpec, DocTreeViewSpec

    t = load_tables(spark, sf_dir)
    n_all = t["nation"].select(
        F.col("n_nationkey").alias("natkey"), F.col("n_name").alias("nname")
    )
    c_all = t["customer"].select(
        F.col("c_custkey").alias("ckey"), F.col("c_nationkey").alias("cnat"),
        F.col("c_acctbal").cast("double").alias("cbal"),
    )
    s_all = t["supplier"].select(
        F.col("s_suppkey").alias("skey"), F.col("s_nationkey").alias("snat"),
        F.col("s_name").alias("sname"),
    )

    spec = DocTreeViewSpec(
        parent_table="nation", key="natkey",
        row_schema_parent="natkey bigint, nname string",
        children=[
            ChildArraySpec(table="customer", fk="cnat",
                           row_schema="ckey bigint, cnat bigint, cbal double",
                           alias="custs", order=["ckey"]),
            ChildArraySpec(table="supplier", fk="snat",
                           row_schema="skey bigint, snat bigint, sname string",
                           alias="supps", order=["skey"]),
        ],
    )

    ins, dele = F.lit("insert"), F.lit("delete")
    pred_n = F.col("natkey") % 3 == 0
    n_new = n_all.withColumn(
        "nname", F.when(pred_n, F.concat(F.col("nname"), F.lit("!"))).otherwise(F.col("nname"))
    )
    n_ch = (
        n_all.where(pred_n).withColumn("__op", dele)
        .unionByName(n_new.where(pred_n).withColumn("__op", ins))
    )
    c_old = c_all.where(F.col("ckey") % 4 != 0)
    c_ch = (
        c_all.where(F.col("ckey") % 4 == 0).withColumn("__op", ins)
        .unionByName(
            c_all.where((F.col("ckey") % 5 == 0) & (F.col("ckey") % 4 != 0))
            .withColumn("__op", dele)
        )
    )
    s_old = s_all.where(F.col("skey") % 6 != 0)
    s_ch = (
        s_all.where(F.col("skey") % 6 == 0).withColumn("__op", ins)
        .unionByName(
            s_all.where((F.col("skey") % 7 == 0) & (F.col("skey") % 6 != 0))
            .withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(n_all), changes_to_mult(n_ch)),
        "c0": apply_join_state(relation_state(c_old), changes_to_mult(c_ch)),
        "c1": apply_join_state(relation_state(s_old), changes_to_mult(s_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": n_ch.select("natkey"),
        "c0": c_ch.select("cnat"),
        "c1": s_ch.select("snat"),
    }
    touched = touched_parent_keys(spec, change_keys, rows_for)
    docs = serve_docs(spec, touched, rows_for)
    return docs.select(
        "natkey",
        F.col("nname").alias("nation_name"),
        F.size("custs").cast("bigint").alias("n_custs"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("custs"),
                lambda x: F.concat_ws(
                    ":", x["ckey"].cast("string"), F.floor(x["cbal"]).cast("bigint").cast("string")
                ),
            ),
        ).alias("custs_str"),
        F.size("supps").cast("bigint").alias("n_supps"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("supps"),
                lambda x: F.concat_ws(":", x["skey"].cast("string"), x["sname"]),
            ),
        ).alias("supps_str"),
    )


@query(
    "ivm_nested_child_doc",
    oracle="""
    WITH
    c_post AS (SELECT c_custkey AS ckey,
                      CASE WHEN c_custkey % 4 = 0 THEN c_name || '*' ELSE c_name END AS cname
               FROM customer),
    o_post AS (SELECT o_orderkey AS okey, o_custkey AS ocust, o_orderstatus AS ostat
               FROM orders WHERE o_orderkey % 9 <> 0),
    l_del AS (SELECT l_orderkey AS lord FROM lineitem
              WHERE (l_orderkey + l_linenumber) % 7 = 0),
    l_post AS (SELECT l_orderkey AS lord, l_linenumber AS lnum,
                      CAST(l_quantity AS BIGINT) AS lqty, l_partkey AS lpart
               FROM lineitem WHERE (l_orderkey + l_linenumber) % 7 <> 0),
    p_post AS (SELECT p_partkey AS pkey,
                      CASE WHEN p_partkey % 10 = 0 THEN p_name || '+' ELSE p_name END AS pname
               FROM part),
    touched AS (
      SELECT DISTINCT ckey FROM (
        SELECT c_custkey AS ckey FROM customer WHERE c_custkey % 4 = 0
        UNION ALL SELECT o_custkey FROM orders WHERE o_orderkey % 9 = 0
        UNION ALL SELECT o.ocust FROM o_post o JOIN l_del d ON o.okey = d.lord
        UNION ALL SELECT o.ocust FROM o_post o JOIN l_post l ON o.okey = l.lord
                  WHERE l.lpart % 10 = 0
      )
    ),
    items AS (
      SELECT l.lord, string_agg(
               l.lnum || ':' || l.lqty || ':' || p.pname, ','
               ORDER BY l.lnum, l.lqty, l.lpart, p.pname) AS s
      FROM l_post l LEFT JOIN p_post p ON l.lpart = p.pkey GROUP BY l.lord),
    ords AS (
      SELECT o.ocust, COUNT(*) AS n,
             string_agg(o.okey || '|' || o.ostat || '|' || COALESCE(i.s, ''), ';'
                        ORDER BY o.okey) AS s
      FROM o_post o LEFT JOIN items i ON o.okey = i.lord GROUP BY o.ocust)
    SELECT c.ckey, c.cname,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS n_ords,
           COALESCE(o.s, '') AS ords_str
    FROM c_post c
    JOIN touched USING (ckey)
    LEFT JOIN ords o ON c.ckey = o.ocust""",
    doc=(
        "NESTED to-many doc tree (ChildArraySpec.children / ivm_flagship "
        "recursion): one doc per customer carrying an orders[] array "
        "whose ELEMENTS each carry their own lineitems[] sub-array with "
        "a part element-dim — two to-many levels, maintained as a pure "
        "delta fold. ONE batch renames customers AND deletes orders AND "
        "deletes lineitems AND renames parts; a part rename walks "
        "part→lineitem→order→customer through the reverse indexes + the "
        "rk child-key ascent index, so only genuinely affected customer "
        "docs re-serve. Nested arrays serialized for hashing; oracle "
        "rebuilds the exact touched set + docs from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "B7", "composition", "nested"),
)
def ivm_nested_child_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_flagship import (
        relation_rows_for, serve_docs, touched_parent_keys,
    )
    from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec

    t = load_tables(spark, sf_dir)
    c_all = t["customer"].select(
        F.col("c_custkey").alias("ckey"), F.col("c_name").alias("cname")
    )
    o_all = t["orders"].select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("ocust"),
        F.col("o_orderstatus").alias("ostat"),
    )
    l_all = t["lineitem"].select(
        F.col("l_orderkey").alias("lord"), F.col("l_linenumber").alias("lnum"),
        F.col("l_quantity").cast("bigint").alias("lqty"),
        F.col("l_partkey").alias("lpart"),
    )
    p_all = t["part"].select(
        F.col("p_partkey").alias("pkey"), F.col("p_name").alias("pname")
    )

    spec = DocTreeViewSpec(
        parent_table="customer", key="ckey",
        row_schema_parent="ckey bigint, cname string",
        children=[ChildArraySpec(
            table="orders", fk="ocust",
            row_schema="okey bigint, ocust bigint, ostat string",
            alias="ords", order=["okey"], key="okey",
            children=[ChildArraySpec(
                table="lineitem", fk="lord",
                row_schema="lord bigint, lnum int, lqty bigint, lpart bigint",
                alias="items", order=["lnum", "lqty", "lpart"],
                dims=[DimLookup(table="part", fk="lpart", key="pkey",
                                row_schema="pkey bigint, pname string")],
            )],
        )],
    )

    ins, dele = F.lit("insert"), F.lit("delete")
    pred_c = F.col("ckey") % 4 == 0
    c_new = c_all.withColumn(
        "cname", F.when(pred_c, F.concat(F.col("cname"), F.lit("*"))).otherwise(F.col("cname"))
    )
    c_ch = (
        c_all.where(pred_c).withColumn("__op", dele)
        .unionByName(c_new.where(pred_c).withColumn("__op", ins))
    )
    o_ch = o_all.where(F.col("okey") % 9 == 0).withColumn("__op", dele)
    l_ch = l_all.where((F.col("lord") + F.col("lnum")) % 7 == 0).withColumn("__op", dele)
    pred_p = F.col("pkey") % 10 == 0
    p_new = p_all.withColumn(
        "pname", F.when(pred_p, F.concat(F.col("pname"), F.lit("+"))).otherwise(F.col("pname"))
    )
    p_ch = (
        p_all.where(pred_p).withColumn("__op", dele)
        .unionByName(p_new.where(pred_p).withColumn("__op", ins))
    )

    posts = {
        "p": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "c0": apply_join_state(relation_state(o_all), changes_to_mult(o_ch)),
        "c0x0": apply_join_state(relation_state(l_all), changes_to_mult(l_ch)),
        "c0x0d0": apply_join_state(relation_state(p_all), changes_to_mult(p_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": c_ch.select("ckey"),
        "c0": o_ch.select("ocust"),
        "c0x0": l_ch.select("lord"),
        "c0x0d0": p_ch.select("pkey"),
    }
    touched = touched_parent_keys(spec, change_keys, rows_for)
    docs = serve_docs(spec, touched, rows_for)
    return docs.select(
        "ckey",
        "cname",
        F.size("ords").cast("bigint").alias("n_ords"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("ords"),
                lambda o: F.concat_ws(
                    "|",
                    o["okey"].cast("string"),
                    o["ostat"],
                    F.concat_ws(
                        ",",
                        F.transform(
                            o["items"],
                            lambda x: F.concat_ws(
                                ":",
                                x["lnum"].cast("string"),
                                x["lqty"].cast("string"),
                                x["pname"],
                            ),
                        ),
                    ),
                ),
            ),
        ).alias("ords_str"),
    )


@query(
    "ivm_sql_doctree_course",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 4 = 0 THEN c_name || '*' ELSE c_name END AS name,
             c_nationkey AS nat
      FROM customer),
    n_post AS (
      SELECT n_nationkey AS id,
             CASE WHEN n_nationkey % 2 = 0 THEN n_name || '!' ELSE n_name END AS name
      FROM nation),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_quantity AS BIGINT) AS qty,
             l_partkey AS pk
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    p_post AS (
      SELECT p_partkey AS id,
             CASE WHEN p_partkey % 10 = 0 THEN p_name || '+' ELSE p_name END AS name
      FROM part),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT id FROM o_post WHERE cust % 4 = 0
        UNION ALL SELECT o.id FROM o_post o JOIN c_post c ON o.cust = c.id
                  WHERE c.nat % 2 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
        UNION ALL SELECT oid FROM i_post WHERE pk % 10 = 0
      )
    )
    SELECT o.id, o.status,
           c.name AS cust_name, n.name AS nation_name,
           CAST(COALESCE(ia.n, 0) AS BIGINT) AS n_items,
           COALESCE(ia.s, '') AS items_str
    FROM o_post o
    JOIN touched USING (id)
    LEFT JOIN c_post c ON o.cust = c.id
    LEFT JOIN n_post n ON c.nat = n.id
    LEFT JOIN (
      SELECT i.oid, COUNT(*) AS n,
             string_agg(i.qty || ':' || p.name, ';' ORDER BY i.qty, p.name) AS s
      FROM i_post i LEFT JOIN p_post p ON i.pk = p.id
      GROUP BY i.oid) ia ON o.id = ia.oid""",
    doc=(
        "SQL-DECLARED doc-tree lane (ivm_doc_sql): a course_mv-shaped "
        "view written as PG SQL over id-keyed mirrors of orders/customer/"
        "nation/lineitem/part is compiled to the doc-tree lane with ZERO "
        "Python — derive_sql_doctree parses the correlation tree + doc "
        "templates and the SAME multiplicity/reverse-index machinery "
        "folds one batch mutating all five tables (order inserts+deletes, "
        "customer/nation/part renames, item churn); serve_docs_sql "
        "rebuilds the touched docs in the TRANSPILED compile's nested "
        "shape. Output flattened for hashing; oracle rebuilds the same "
        "touched docs from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_doctree_course(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("sdt_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
    ).createOrReplaceTempView("sdt_cust")
    t["nation"].select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    ).createOrReplaceTempView("sdt_nation")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_partkey").alias("pk"),
    ).createOrReplaceTempView("sdt_item")
    t["part"].select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
    ).createOrReplaceTempView("sdt_part")

    # the reference MV grammar, zero Python in the declaration
    sql = """select id, json_build_object('status', status,
      'customer', (select json_build_object('name', name,
                     'nation', (select json_build_object('name', name)
                                from sdt_nation where sdt_nation.id = nat))
                   from sdt_cust where sdt_cust.id = cust),
      'items', (select json_agg(json_build_object('qty', qty,
                  'part', (select json_build_object('name', name)
                           from sdt_part where sdt_part.id = pk)))
                from sdt_item where sdt_item.oid = sdt_order.id)
    ) as doc from sdt_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "course-shaped SQL must derive the doc-tree lane"

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("sdt_order")
    c_all = spark.table("sdt_cust")
    n_all = spark.table("sdt_nation")
    i_all = spark.table("sdt_item").select("oid", "qty", "pk")  # state cols
    p_all = spark.table("sdt_part")
    i_lines = spark.table("sdt_item")  # incl. line, for the churn rules

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )

    def rename(all_df, pred, suffix):
        new = all_df.withColumn(
            "name",
            F.when(pred, F.concat(F.col("name"), F.lit(suffix))).otherwise(F.col("name")),
        )
        ch = (
            all_df.where(pred).withColumn("__op", dele)
            .unionByName(new.where(pred).withColumn("__op", ins))
        )
        return new, ch

    _c_new, c_ch = rename(c_all, F.col("id") % 4 == 0, "*")
    _n_new, n_ch = rename(n_all, F.col("id") % 2 == 0, "!")
    _p_new, p_ch = rename(p_all, F.col("id") % 10 == 0, "+")
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in).select("oid", "qty", "pk")
    i_ch = (
        i_lines.where(churn_in).select("oid", "qty", "pk").withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .select("oid", "qty", "pk").withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "d1": apply_join_state(relation_state(n_all), changes_to_mult(n_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
        "c0d0": apply_join_state(relation_state(p_all), changes_to_mult(p_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "d0": c_ch.select("id"),
        "d1": n_ch.select("id"),
        "c0": i_ch.select("oid"),
        "c0d0": p_ch.select("id"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.col("doc.customer.name").alias("cust_name"),
        F.col("doc.customer.nation.name").alias("nation_name"),
        F.size("doc.items").cast("bigint").alias("n_items"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.items"),
                lambda x: F.concat_ws(
                    ":", x["qty"].cast("bigint").cast("string"), x["part"]["name"]
                ),
            ),
        ).alias("items_str"),
    )


@query(
    "ivm_dim_anchored_doc",
    oracle="""
    WITH
    s_post AS (SELECT s_suppkey AS skey, s_name AS sname, s_nationkey AS snat
               FROM supplier WHERE s_suppkey % 9 <> 0),
    n_post AS (SELECT n_nationkey AS nkey,
                      CASE WHEN n_nationkey % 2 = 0 THEN n_name || '!' ELSE n_name END AS nname
               FROM nation),
    c_post AS (SELECT c_custkey AS ckey, c_nationkey AS cnat,
                      CASE WHEN c_custkey % 5 = 0 THEN c_name || '*' ELSE c_name END AS cname
               FROM customer WHERE c_custkey % 7 <> 0 OR c_custkey % 5 = 0),
    touched AS (
      SELECT DISTINCT skey FROM (
        SELECT s_suppkey AS skey FROM supplier WHERE s_suppkey % 9 = 0
        UNION ALL SELECT s.skey FROM s_post s WHERE s.snat % 2 = 0
        UNION ALL SELECT s.skey FROM s_post s
                  JOIN (SELECT DISTINCT c_nationkey AS nat FROM customer
                        WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0) x
                  ON s.snat = x.nat
      )
    ),
    ca AS (
      SELECT cnat, COUNT(*) AS n,
             string_agg(ckey || ':' || cname, ';' ORDER BY ckey) AS s
      FROM c_post GROUP BY cnat)
    SELECT s.skey, s.sname, n.nname AS nation_name,
           CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_custs,
           COALESCE(ca.s, '') AS custs_str
    FROM s_post s
    JOIN touched USING (skey)
    JOIN n_post n ON s.snat = n.nkey
    LEFT JOIN ca ON s.snat = ca.cnat""",
    doc=(
        "DIM-ANCHORED arrays (DimLookup.arrays / ivm_flagship): a "
        "supplier doc whose nation OBJECT carries the nation's "
        "customers[] array — a to-many hanging off a to-one dim, the "
        "remaining placement in the doc-tree shape lattice. ONE batch "
        "renames+deletes customers, renames nations, deletes suppliers; "
        "a customer delta's values are nation keys that ascend the "
        "dim's rp reverse-index walk to exactly the affected supplier "
        "docs. Oracle rebuilds the touched set + docs from post-batch "
        "tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "B7", "composition", "nested"),
)
def ivm_dim_anchored_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_flagship import (
        relation_rows_for, serve_docs, touched_parent_keys,
    )
    from sinker_spark.views import ChildArraySpec, DimLookup, DocTreeViewSpec

    t = load_tables(spark, sf_dir)
    s_all = t["supplier"].select(
        F.col("s_suppkey").alias("skey"), F.col("s_name").alias("sname"),
        F.col("s_nationkey").alias("snat"),
    )
    n_all = t["nation"].select(
        F.col("n_nationkey").alias("nkey"), F.col("n_name").alias("nname")
    )
    c_all = t["customer"].select(
        F.col("c_custkey").alias("ckey"), F.col("c_nationkey").alias("cnat"),
        F.col("c_name").alias("cname"),
    )

    spec = DocTreeViewSpec(
        parent_table="supplier", key="skey",
        row_schema_parent="skey bigint, sname string, snat bigint",
        dims=[DimLookup(
            "nation", fk="snat", key="nkey",
            row_schema="nkey bigint, nname string",
            arrays=[ChildArraySpec(
                table="customer", fk="cnat",
                row_schema="ckey bigint, cnat bigint, cname string",
                alias="ncusts", order=["ckey"],
            )],
        )],
    )

    ins, dele = F.lit("insert"), F.lit("delete")
    s_ch = s_all.where(F.col("skey") % 9 == 0).withColumn("__op", dele)
    pred_n = F.col("nkey") % 2 == 0
    n_new = n_all.withColumn(
        "nname", F.when(pred_n, F.concat(F.col("nname"), F.lit("!"))).otherwise(F.col("nname"))
    )
    n_ch = (
        n_all.where(pred_n).withColumn("__op", dele)
        .unionByName(n_new.where(pred_n).withColumn("__op", ins))
    )
    pred_c = F.col("ckey") % 5 == 0
    c_new = c_all.withColumn(
        "cname", F.when(pred_c, F.concat(F.col("cname"), F.lit("*"))).otherwise(F.col("cname"))
    )
    c_ch = (
        c_all.where(pred_c).withColumn("__op", dele)
        .unionByName(c_new.where(pred_c).withColumn("__op", ins))
        .unionByName(
            c_all.where((F.col("ckey") % 7 == 0) & ~pred_c).withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(s_all), changes_to_mult(s_ch)),
        "d0": apply_join_state(relation_state(n_all), changes_to_mult(n_ch)),
        "d0a0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": s_ch.select("skey"),
        "d0": n_ch.select("nkey"),
        "d0a0": c_ch.select("cnat"),
    }
    touched = touched_parent_keys(spec, change_keys, rows_for)
    docs = serve_docs(spec, touched, rows_for)
    return docs.select(
        "skey",
        "sname",
        F.col("nname").alias("nation_name"),
        F.size("ncusts").cast("bigint").alias("n_custs"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("ncusts"),
                lambda x: F.concat_ws(":", x["ckey"].cast("string"), x["cname"]),
            ),
        ).alias("custs_str"),
    )


@query(
    "ivm_sql_doctree_nested",
    oracle="""
    WITH
    c_post AS (SELECT c_custkey AS id,
                      CASE WHEN c_custkey % 4 = 0 THEN c_name || '*' ELSE c_name END AS name
               FROM customer),
    o_post AS (SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status
               FROM orders WHERE o_orderkey % 9 <> 0),
    i_del AS (SELECT l_orderkey AS oid FROM lineitem
              WHERE (l_orderkey + l_linenumber) % 7 = 0),
    i_post AS (SELECT l_orderkey AS oid, CAST(l_linenumber AS BIGINT) AS line,
                      CAST(l_quantity AS BIGINT) AS qty, l_partkey AS pk
               FROM lineitem WHERE (l_orderkey + l_linenumber) % 7 <> 0),
    p_post AS (SELECT p_partkey AS id,
                      CASE WHEN p_partkey % 10 = 0 THEN p_name || '+' ELSE p_name END AS name
               FROM part),
    touched AS (
      SELECT DISTINCT cid FROM (
        SELECT c_custkey AS cid FROM customer WHERE c_custkey % 4 = 0
        UNION ALL SELECT o_custkey FROM orders WHERE o_orderkey % 9 = 0
        UNION ALL SELECT o.cust FROM o_post o JOIN i_del d ON o.id = d.oid
        UNION ALL SELECT o.cust FROM o_post o JOIN i_post i ON o.id = i.oid
                  WHERE i.pk % 10 = 0
      )
    ),
    items AS (
      SELECT i.oid, string_agg(i.line || ':' || i.qty || ':' || p.name, ','
                               ORDER BY i.line, i.qty, p.name) AS s
      FROM i_post i LEFT JOIN p_post p ON i.pk = p.id GROUP BY i.oid),
    ords AS (
      SELECT o.cust, COUNT(*) AS n,
             string_agg(o.id || '|' || o.status || '|' || COALESCE(it.s, '~'), ';'
                        ORDER BY o.id) AS s
      FROM o_post o LEFT JOIN items it ON o.id = it.oid GROUP BY o.cust)
    SELECT c.id, c.name,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS n_ords,
           COALESCE(o.s, '') AS ords_str
    FROM c_post c
    JOIN touched ON c.id = touched.cid
    LEFT JOIN ords o ON c.id = o.cust""",
    doc=(
        "SQL-DECLARED NESTED doc tree (ivm_doc_sql × ChildArraySpec."
        "children): a customer→orders[]→lineitems[] view written as "
        "plain PG SQL — a json_agg INSIDE the child's element template "
        "— derives the two-level fold lane with zero Python (the "
        "transpiler pre-groups the inner json_agg into a derived-table "
        "join; the serve reproduces its semantics: nested empty arrays "
        "are NULL ('~' marker), root-level empty arrays []). ONE batch "
        "renames customers, deletes orders, deletes lineitems, renames "
        "parts; only genuinely affected customer docs re-serve"
    ),
    tags=("A11", "A2", "ivm", "ivm-doc", "B5", "B7", "composition", "nested"),
)
def ivm_sql_doctree_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import (
        doc_tree_states, relation_rows_for, touched_parent_keys,
    )

    t = load_tables(spark, sf_dir)
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    ).createOrReplaceTempView("sdn_cust")
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("sdn_order")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_partkey").alias("pk"),
    ).createOrReplaceTempView("sdn_item")
    t["part"].select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
    ).createOrReplaceTempView("sdn_part")

    sql = """select id, json_build_object('name', name,
      'orders', (select json_agg(json_build_object('okey', o.id, 'status', o.status,
                   'items', (select json_agg(json_build_object('line', line, 'qty', qty,
                               'part', (select json_build_object('name', name)
                                        from sdn_part where sdn_part.id = pk)))
                             from sdn_item where sdn_item.oid = o.id)))
                 from sdn_order o where o.cust = sdn_cust.id)
    ) as doc from sdn_cust"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "nested SQL must derive the two-level doc-tree lane"

    ins, dele = F.lit("insert"), F.lit("delete")
    sdefs = {s.suffix: s for s in doc_tree_states(sd.spec) if s.source is None}
    tables = {"p": "sdn_cust", "c0": "sdn_order", "c0x0": "sdn_item",
              "c0x0d0": "sdn_part"}
    alls = {sfx: spark.table(tables[sfx]).select(*sdefs[sfx].cols) for sfx in sdefs}

    pred_c = F.col("id") % 4 == 0
    c_new = alls["p"].withColumn(
        "name", F.when(pred_c, F.concat(F.col("name"), F.lit("*"))).otherwise(F.col("name"))
    )
    c_ch = (
        alls["p"].where(pred_c).withColumn("__op", dele)
        .unionByName(c_new.where(pred_c).withColumn("__op", ins))
    )
    o_ch = alls["c0"].where(F.col("id") % 9 == 0).withColumn("__op", dele)
    o_old = alls["c0"]
    i_ch = (
        alls["c0x0"].where((F.col("oid") + F.col("line")) % 7 == 0)
        .withColumn("__op", dele)
    )
    pred_p = F.col("id") % 10 == 0
    p_new = alls["c0x0d0"].withColumn(
        "name", F.when(pred_p, F.concat(F.col("name"), F.lit("+"))).otherwise(F.col("name"))
    )
    p_ch = (
        alls["c0x0d0"].where(pred_p).withColumn("__op", dele)
        .unionByName(p_new.where(pred_p).withColumn("__op", ins))
    )

    posts = {
        "p": apply_join_state(relation_state(alls["p"]), changes_to_mult(c_ch)),
        "c0": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "c0x0": apply_join_state(relation_state(alls["c0x0"]), changes_to_mult(i_ch)),
        "c0x0d0": apply_join_state(relation_state(alls["c0x0d0"]), changes_to_mult(p_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": c_ch.select("id"),
        "c0": o_ch.select("cust"),
        "c0x0": i_ch.select("oid"),
        "c0x0d0": p_ch.select("id"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.name").alias("name"),
        F.size("doc.orders").cast("bigint").alias("n_ords"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.orders"),
                lambda o: F.concat_ws(
                    "|",
                    o["okey"].cast("string"),
                    o["status"],
                    F.when(o["items"].isNull(), F.lit("~")).otherwise(
                        F.concat_ws(
                            ",",
                            F.transform(
                                o["items"],
                                lambda x: F.concat_ws(
                                    ":",
                                    x["line"].cast("string"),
                                    x["qty"].cast("string"),
                                    x["part"]["name"],
                                ),
                            ),
                        )
                    ),
                ),
            ),
        ).alias("ords_str"),
    )


@query(
    "ivm_sql_dim_anchored",
    oracle="""
    WITH
    s_post AS (SELECT s_suppkey AS id, s_name AS sname, s_nationkey AS nat
               FROM supplier WHERE s_suppkey % 9 <> 0),
    n_post AS (SELECT n_nationkey AS id,
                      CASE WHEN n_nationkey % 2 = 0 THEN n_name || '!' ELSE n_name END AS name
               FROM nation),
    c_post AS (SELECT c_custkey AS id, c_nationkey AS nat,
                      CASE WHEN c_custkey % 5 = 0 THEN c_name || '*' ELSE c_name END AS cname
               FROM customer WHERE c_custkey % 7 <> 0 OR c_custkey % 5 = 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT s_suppkey AS id FROM supplier WHERE s_suppkey % 9 = 0
        UNION ALL SELECT s.id FROM s_post s WHERE s.nat % 2 = 0
        UNION ALL SELECT s.id FROM s_post s
                  JOIN (SELECT DISTINCT c_nationkey AS nat FROM customer
                        WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0) x
                  ON s.nat = x.nat
      )
    ),
    ca AS (
      SELECT nat, string_agg(id || ':' || cname, ';' ORDER BY id, cname) AS s
      FROM c_post GROUP BY nat)
    SELECT s.id, s.sname, n.name AS nation_name,
           COALESCE(ca.s, '~') AS custs_str
    FROM s_post s
    JOIN touched USING (id)
    LEFT JOIN n_post n ON s.nat = n.id
    LEFT JOIN ca ON s.nat = ca.nat""",
    doc=(
        "SQL-DECLARED dim-anchored array (ivm_doc_sql × DimLookup."
        "arrays): a supplier view written as PG SQL whose nation BLOCK "
        "contains a json_agg keyed on the nation — derives the dim-"
        "anchored fold lane with zero Python. Customer deltas ascend "
        "the nation's rp reverse-index walk to exactly the affected "
        "supplier docs; serve matches the transpiled compile (empty "
        "dim-template array is NULL → '~' marker)"
    ),
    tags=("A11", "A2", "ivm", "ivm-doc", "B5", "B7", "composition", "nested"),
)
def ivm_sql_dim_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import (
        doc_tree_states, relation_rows_for, touched_parent_keys,
    )

    t = load_tables(spark, sf_dir)
    t["supplier"].select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("sname"),
        F.col("s_nationkey").alias("nat"),
    ).createOrReplaceTempView("sda_supp")
    t["nation"].select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    ).createOrReplaceTempView("sda_nation")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("nat"),
        F.col("c_name").alias("cname"),
    ).createOrReplaceTempView("sda_cust")

    sql = """select id, json_build_object('sname', sname,
      'nation', (select json_build_object('name', name,
                   'custs', (select json_agg(json_build_object('ckey', c.id, 'cname', c.cname))
                             from sda_cust c where c.nat = sda_nation.id))
                 from sda_nation where sda_nation.id = nat)
    ) as doc from sda_supp"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "dim-anchored SQL must derive the doc-tree lane"

    ins, dele = F.lit("insert"), F.lit("delete")
    sdefs = {s.suffix: s for s in doc_tree_states(sd.spec) if s.source is None}
    tables = {"p": "sda_supp", "d0": "sda_nation", "d0a0": "sda_cust"}
    alls = {sfx: spark.table(tables[sfx]).select(*sdefs[sfx].cols) for sfx in sdefs}

    s_ch = alls["p"].where(F.col("id") % 9 == 0).withColumn("__op", dele)
    pred_n = F.col("id") % 2 == 0
    n_new = alls["d0"].withColumn(
        "name", F.when(pred_n, F.concat(F.col("name"), F.lit("!"))).otherwise(F.col("name"))
    )
    n_ch = (
        alls["d0"].where(pred_n).withColumn("__op", dele)
        .unionByName(n_new.where(pred_n).withColumn("__op", ins))
    )
    pred_c = F.col("id") % 5 == 0
    c_new = alls["d0a0"].withColumn(
        "cname", F.when(pred_c, F.concat(F.col("cname"), F.lit("*"))).otherwise(F.col("cname"))
    )
    c_ch = (
        alls["d0a0"].where(pred_c).withColumn("__op", dele)
        .unionByName(c_new.where(pred_c).withColumn("__op", ins))
        .unionByName(
            alls["d0a0"].where((F.col("id") % 7 == 0) & ~pred_c).withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(alls["p"]), changes_to_mult(s_ch)),
        "d0": apply_join_state(relation_state(alls["d0"]), changes_to_mult(n_ch)),
        "d0a0": apply_join_state(relation_state(alls["d0a0"]), changes_to_mult(c_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": s_ch.select("id"),
        "d0": n_ch.select("id"),
        "d0a0": c_ch.select("nat"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.sname").alias("sname"),
        F.col("doc.nation.name").alias("nation_name"),
        F.when(F.col("doc.nation.custs").isNull(), F.lit("~")).otherwise(
            F.concat_ws(
                ";",
                F.transform(
                    F.col("doc.nation.custs"),
                    lambda x: F.concat_ws(":", x["ckey"].cast("string"), x["cname"]),
                ),
            )
        ).alias("custs_str"),
    )


@query(
    "correlate_affected_keys_walk",
    oracle="""
    WITH affected AS (
      -- customer renames (id %4): orders carrying those custs
      SELECT o_orderkey AS id FROM orders WHERE o_custkey % 4 = 0
      UNION
      -- nation renames (id %2): custs in those nations -> their orders
      SELECT o.o_orderkey FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey % 2 = 0
      UNION
      -- item re-points (oid %13): BOTH images' parent ids (the payload
      -- fk and the before-image fk)
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey % 13 = 0
      UNION
      SELECT DISTINCT l_orderkey + 1 FROM lineitem WHERE l_orderkey % 13 = 0
    )
    SELECT a.id FROM affected a JOIN orders o ON a.id = o.o_orderkey""",
    doc=(
        "REVERSE-LINEAGE WALK of the auto-derived targeted-refresh hook "
        "(compiler/correlate.derive_affected_rows_keys) AS A QUERY: the "
        "course-shaped SQL view's correlation tree maps a synthetic CDC "
        "batch (customer renames, nation renames, item re-points with "
        "payload + before-image fks) to the affected parent ids via "
        "semi-join walks - no driver-side key collection, both fk images "
        "of every re-pointed child reach the docs it joined AND left. "
        "Oracle recomputes the same affected set relationally (restricted "
        "to live parents, as the scoped recompute would)"
    ),
    tags=("A11", "A6", "targeted-refresh", "composition"),
)
def correlate_affected_keys_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.compiler.correlate import derive_affected_rows_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("caw_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
    ).createOrReplaceTempView("caw_cust")
    t["nation"].select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    ).createOrReplaceTempView("caw_nation")
    t["lineitem"].select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("oid"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("caw_item")

    sql = """select id, json_build_object('status', status,
      'customer', (select json_build_object('name', name,
                     'nation', (select json_build_object('name', name)
                                from caw_nation where caw_nation.id = nat))
                   from caw_cust where caw_cust.id = cust),
      'items', (select json_agg(json_build_object('qty', qty))
                from caw_item where caw_item.oid = caw_order.id)
    ) as doc from caw_order"""
    hook = derive_affected_rows_keys(sql)
    assert hook is not None, "course-shaped SQL must derive the walk hook"

    cust_ch = spark.table("caw_cust").where(F.col("id") % 4 == 0).select(
        F.lit("caw_cust").alias("table"), F.lit("UPDATE").alias("op"),
        F.col("id").cast("string").alias("id"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(None).cast("string").alias("payload_before"),
    )
    nat_ch = spark.table("caw_nation").where(F.col("id") % 2 == 0).select(
        F.lit("caw_nation").alias("table"), F.lit("UPDATE").alias("op"),
        F.col("id").cast("string").alias("id"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(None).cast("string").alias("payload_before"),
    )
    # item re-points: synthetic UPDATE whose payload fk is the CURRENT
    # parent and whose before-image fk is parent+1 (the doc it "left")
    item_ch = (
        spark.table("caw_item").where(F.col("oid") % 13 == 0)
        .select("oid").distinct()
        .select(
            F.lit("caw_item").alias("table"), F.lit("UPDATE").alias("op"),
            F.concat(F.lit("i"), F.col("oid").cast("string")).alias("id"),
            F.to_json(F.struct(F.col("oid"))).alias("payload"),
            F.to_json(F.struct((F.col("oid") + 1).alias("oid"))).alias("payload_before"),
        )
    )
    rows = cust_ch.unionByName(nat_ch).unionByName(item_ch)
    scope = hook(spark, rows)
    assert scope is not None, "fully-imaged batch must be targetable"
    # the scoped recompute only serves live parents — restrict like it
    return scope.join(
        spark.table("caw_order").select(F.col("id").cast("string").alias("id")),
        "id", "left_semi",
    ).select(F.col("id").cast("bigint").alias("id"))


@query(
    "ivm_sql_doctree_joined",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 6 = 0 THEN c_name || '*' ELSE c_name END AS name,
             c_nationkey AS nat
      FROM customer WHERE c_custkey % 4 <> 0),
    n_post AS (
      SELECT n_nationkey AS id,
             CASE WHEN n_nationkey % 2 = 0 THEN n_name || '!' ELSE n_name END AS name
      FROM nation),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT id FROM o_post WHERE cust % 4 = 0 OR cust % 6 = 0
        UNION ALL SELECT o.id FROM o_post o JOIN c_post c ON o.cust = c.id
                  WHERE c.nat % 2 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
      )
    )
    SELECT o.id, o.status,
           c.name AS cust_name, n.name AS nation_name,
           CAST(COALESCE(ia.n, 0) AS BIGINT) AS n_items,
           COALESCE(ia.s, '') AS items_str
    FROM o_post o
    JOIN touched USING (id)
    JOIN c_post c ON o.cust = c.id
    LEFT JOIN n_post n ON c.nat = n.id
    LEFT JOIN (
      SELECT oid, COUNT(*) AS n,
             string_agg(CAST(qty AS VARCHAR), ';' ORDER BY qty) AS s
      FROM i_post GROUP BY oid) ia ON o.id = ia.oid""",
    doc=(
        "SQL-DECLARED doc-tree lane, MAIN-FROM JOIN spelling (r6): the "
        "view is written `FROM order o JOIN cust c ON o.cust = c.id` "
        "with a flat jcol (c.name), a correlated nation block anchored "
        "ON THE JOIN DIM (c.nat), and an items array — derive_sql_"
        "doctree folds the join dim into the root dim tree (same hop "
        "algebra as correlated scalar subqueries) and maintains it as a "
        "pure delta fold. INNER-join semantics are part of the gate: "
        "the batch DELETES every 4th customer and their orders' docs "
        "must retract (serve drops them; the oracle inner-joins). "
        "Customer renames fan out through the join dim's reverse index, "
        "nation renames walk nation->cust->order"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "B13", "composition"),
)
def ivm_sql_doctree_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("sdtj_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
    ).createOrReplaceTempView("sdtj_cust")
    t["nation"].select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    ).createOrReplaceTempView("sdtj_nation")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("sdtj_item")

    sql = """select o.id, json_build_object('status', o.status,
      'cust_name', c.name,
      'nation', (select json_build_object('name', name)
                 from sdtj_nation where sdtj_nation.id = c.nat),
      'items', (select json_agg(json_build_object('qty', qty))
                from sdtj_item where sdtj_item.oid = o.id)
    ) as doc from sdtj_order o join sdtj_cust c on o.cust = c.id"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "join-spelled SQL must derive the doc-tree lane"
    assert sd.root_dims[0].corr.join_how == "inner"

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("sdtj_order")
    c_all = spark.table("sdtj_cust")
    n_all = spark.table("sdtj_nation")
    i_lines = spark.table("sdtj_item")
    i_all = i_lines.select("oid", "qty")

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    # customers: DELETE every 4th (inner-join retraction), rename every
    # 6th of the survivors (jcol fan-out)
    c_renamed = c_all.withColumn(
        "name",
        F.when(F.col("id") % 6 == 0, F.concat(F.col("name"), F.lit("*")))
        .otherwise(F.col("name")),
    )
    c_ch = (
        c_all.where((F.col("id") % 4 == 0) | (F.col("id") % 6 == 0))
        .withColumn("__op", dele)
        .unionByName(
            c_renamed.where((F.col("id") % 4 != 0) & (F.col("id") % 6 == 0))
            .withColumn("__op", ins)
        )
    )
    n_renamed = n_all.withColumn(
        "name",
        F.when(F.col("id") % 2 == 0, F.concat(F.col("name"), F.lit("!")))
        .otherwise(F.col("name")),
    )
    n_ch = (
        n_all.where(F.col("id") % 2 == 0).withColumn("__op", dele)
        .unionByName(n_renamed.where(F.col("id") % 2 == 0).withColumn("__op", ins))
    )
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in).select("oid", "qty")
    i_ch = (
        i_lines.where(churn_in).select("oid", "qty").withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .select("oid", "qty").withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "d1": apply_join_state(relation_state(n_all), changes_to_mult(n_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "d0": c_ch.select("id"),
        "d1": n_ch.select("id"),
        "c0": i_ch.select("oid"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.col("doc.cust_name").alias("cust_name"),
        F.col("doc.nation.name").alias("nation_name"),
        F.size("doc.items").cast("bigint").alias("n_items"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.items"),
                lambda x: x["qty"].cast("bigint").cast("string"),
            ),
        ).alias("items_str"),
    )


@query(
    "ivm_branched_doc",
    oracle="""
    WITH l_post AS (
      SELECT l_orderkey * 10 + l_linenumber AS lkey, l_partkey AS pkey,
             l_suppkey AS skey, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey * 10 + l_linenumber) % 3 = 0
         OR (l_orderkey * 10 + l_linenumber) % 5 <> 0),
    p_post AS (
      SELECT p_partkey AS partkey,
             CASE WHEN p_partkey % 10 = 0 THEN p_name || '+' ELSE p_name END AS pname
      FROM part),
    s_post AS (
      SELECT s_suppkey AS suppkey,
             CASE WHEN s_suppkey % 4 = 0 THEN s_name || '*' ELSE s_name END AS sname,
             s_nationkey AS snat
      FROM supplier),
    n_post AS (
      SELECT n_nationkey AS natkey,
             CASE WHEN n_nationkey % 2 = 0 THEN n_name || '!' ELSE n_name END AS nname
      FROM nation),
    touched AS (
      SELECT DISTINCT lkey FROM (
        SELECT l_orderkey * 10 + l_linenumber AS lkey FROM lineitem
        WHERE (l_orderkey * 10 + l_linenumber) % 3 = 0
           OR (l_orderkey * 10 + l_linenumber) % 5 = 0
        UNION ALL SELECT lkey FROM l_post WHERE pkey % 10 = 0
        UNION ALL SELECT lkey FROM l_post WHERE skey % 4 = 0
        UNION ALL SELECT l.lkey FROM l_post l JOIN s_post s ON l.skey = s.suppkey
                  WHERE s.snat % 2 = 0
      )
    )
    SELECT l.lkey, l.qty, p.pname, s.sname, n.nname
    FROM l_post l
    JOIN touched USING (lkey)
    JOIN p_post p ON l.pkey = p.partkey
    JOIN s_post s ON l.skey = s.suppkey
    JOIN n_post n ON s.snat = n.natkey""",
    doc=(
        "BRANCHED dim forest (r6, DocTreeViewSpec.dim_forest / "
        "ivm_flagship): one doc per lineitem with TWO INDEPENDENT root "
        "lookups — lineitem->part AND lineitem->supplier->nation — "
        "maintained as a pure delta fold. One batch churns lineitems, "
        "renames every 10th part (branch-1 reverse index rp0), every "
        "4th supplier (branch-2 rp1) and every 2nd nation (two-hop walk "
        "nation->supplier->lineitem through rp2 then rp1); only the "
        "affected docs re-serve, each branch walked independently. "
        "Oracle rebuilds the touched docs from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "composition"),
)
def ivm_branched_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_flagship import (
        relation_rows_for, serve_docs, touched_parent_keys,
    )
    from sinker_spark.views import DimLookup, DocTreeViewSpec

    t = load_tables(spark, sf_dir)
    l_all = t["lineitem"].select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lkey"),
        F.col("l_partkey").alias("pkey"),
        F.col("l_suppkey").alias("skey"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    p_all = t["part"].select(
        F.col("p_partkey").alias("partkey"), F.col("p_name").alias("pname")
    )
    s_all = t["supplier"].select(
        F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("sname"),
        F.col("s_nationkey").alias("snat"),
    )
    n_all = t["nation"].select(
        F.col("n_nationkey").alias("natkey"), F.col("n_name").alias("nname")
    )

    spec = DocTreeViewSpec(
        parent_table="lineitem", key="lkey",
        row_schema_parent="lkey bigint, pkey bigint, skey bigint, qty bigint",
        dim_forest=[
            DimLookup("part", fk="pkey", key="partkey",
                      row_schema="partkey bigint, pname string"),
            DimLookup("supplier", fk="skey", key="suppkey",
                      row_schema="suppkey bigint, sname string, snat bigint",
                      children=[DimLookup("nation", fk="snat", key="natkey",
                                          row_schema="natkey bigint, nname string")]),
        ],
    )

    ins, dele = F.lit("insert"), F.lit("delete")
    l_old = l_all.where(F.col("lkey") % 3 != 0)
    l_ch = (
        l_all.where(F.col("lkey") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            l_all.where((F.col("lkey") % 5 == 0) & (F.col("lkey") % 3 != 0))
            .withColumn("__op", dele)
        )
    )

    def rename(all_df, keycol, namecol, pred, suffix):
        new = all_df.withColumn(
            namecol,
            F.when(pred, F.concat(F.col(namecol), F.lit(suffix))).otherwise(F.col(namecol)),
        )
        ch = (
            all_df.where(pred).withColumn("__op", dele)
            .unionByName(new.where(pred).withColumn("__op", ins))
        )
        return new, ch

    _p_new, p_ch = rename(p_all, "partkey", "pname", F.col("partkey") % 10 == 0, "+")
    _s_new, s_ch = rename(s_all, "suppkey", "sname", F.col("suppkey") % 4 == 0, "*")
    _n_new, n_ch = rename(n_all, "natkey", "nname", F.col("natkey") % 2 == 0, "!")

    posts = {
        "p": apply_join_state(relation_state(l_old), changes_to_mult(l_ch)),
        "d0": apply_join_state(relation_state(p_all), changes_to_mult(p_ch)),
        "d1": apply_join_state(relation_state(s_all), changes_to_mult(s_ch)),
        "d2": apply_join_state(relation_state(n_all), changes_to_mult(n_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": l_ch.select("lkey"),
        "d0": p_ch.select("partkey"),
        "d1": s_ch.select("suppkey"),
        "d2": n_ch.select("natkey"),
    }
    touched = touched_parent_keys(spec, change_keys, rows_for)
    docs = serve_docs(spec, touched, rows_for)
    return docs.select("lkey", "qty", "pname", "sname", "nname")


@query(
    "ivm_sql_filtered_agg_doc",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 4 = 0 THEN c_name || '*' ELSE c_name END AS name
      FROM customer),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_linenumber AS BIGINT) AS line,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT o.id FROM o_post o WHERE o.cust % 4 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
      )
    )
    SELECT o.id, o.status,
           c.name AS cust_name,
           CAST(COALESCE(bi.n, 0) AS BIGINT) AS n_big,
           CAST(av.a AS DOUBLE) AS avg_qty,
           COALESCE(hi.s, '') AS top_items
    FROM o_post o
    JOIN touched USING (id)
    LEFT JOIN c_post c ON o.cust = c.id AND c.name NOT LIKE '%*'
    LEFT JOIN (SELECT oid, COUNT(*) AS n FROM i_post WHERE qty > 10
               GROUP BY oid) bi ON o.id = bi.oid
    LEFT JOIN (SELECT oid, AVG(qty) AS a FROM i_post GROUP BY oid) av
           ON o.id = av.oid
    LEFT JOIN (SELECT oid,
                      string_agg(line || ':' || qty, ';'
                                 ORDER BY qty DESC, line) AS s
               FROM i_post WHERE qty > 25 GROUP BY oid) hi ON o.id = hi.oid""",
    doc=(
        "SQL doc-tree lane, round-6 generality: per-block FILTER "
        "conjuncts (a to-one customer lookup guarded by `name not like "
        "'%*'` serving NULL when the post-rename row fails it; to-many "
        "blocks filtered on qty), correlated SCALAR AGGREGATES "
        "(count(*) over a filtered child set → 0 over empty; avg(qty) → "
        "NULL over empty) and a DECLARED `json_agg … ORDER BY qty DESC, "
        "line` honored exactly — all derived from the PG SQL with zero "
        "Python and folded as one batch churning all three tables. The "
        "avg block also uses the REVERSED correlation spelling "
        "(`sfa_order.id = i2.oid`). Oracle rebuilds the same touched "
        "docs from the post-batch tables"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_filtered_agg_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("sfa_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
    ).createOrReplaceTempView("sfa_cust")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("sfa_item")

    sql = """select id, json_build_object('status', status,
      'customer', (select json_build_object('name', name) from sfa_cust
                   where name not like '%*' and sfa_cust.id = cust),
      'n_big', (select count(*) from sfa_item
                where sfa_item.oid = sfa_order.id and qty > 10),
      'avg_qty', (select avg(qty) from sfa_item i2
                  where sfa_order.id = i2.oid),
      'top_items', (select json_agg(json_build_object('ln', line, 'qty', qty)
                                    order by qty desc, line)
                    from sfa_item i3 where i3.oid = sfa_order.id and qty > 25)
    ) as doc from sfa_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "filtered/agg/ordered SQL must derive the lane"

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("sfa_order")
    c_all = spark.table("sfa_cust")
    i_lines = spark.table("sfa_item")

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    ren = F.col("id") % 4 == 0
    c_new = c_all.withColumn(
        "name",
        F.when(ren, F.concat(F.col("name"), F.lit("*"))).otherwise(F.col("name")),
    )
    c_ch = (
        c_all.where(ren).withColumn("__op", dele)
        .unionByName(c_new.where(ren).withColumn("__op", ins))
    )
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in)
    i_ch = (
        i_lines.where(churn_in).withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .withColumn("__op", dele)
        )
    )

    # three sibling to-many blocks over the same child table share one
    # multiplicity relation (each state projects the columns it needs)
    i_state = apply_join_state(relation_state(i_old), changes_to_mult(i_ch))
    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "c0": i_state, "c1": i_state, "c2": i_state,
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "d0": c_ch.select("id"),
        "c0": i_ch.select("oid"), "c1": i_ch.select("oid"),
        "c2": i_ch.select("oid"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.col("doc.customer.name").alias("cust_name"),
        F.col("doc.n_big").cast("bigint").alias("n_big"),
        F.col("doc.avg_qty").cast("double").alias("avg_qty"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.top_items"),
                lambda x: F.concat_ws(
                    ":", x["ln"].cast("string"), x["qty"].cast("string")
                ),
            ),
        ).alias("top_items"),
    )


@query(
    "ivm_sql_expr_doc",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status,
             o_totalprice AS total
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 4 = 0 THEN c_name || '*' ELSE c_name END AS name,
             c_acctbal AS bal
      FROM customer),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_linenumber AS BIGINT) AS line,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT o.id FROM o_post o WHERE o.cust % 4 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
      )
    )
    SELECT o.id,
           lower(o.status) || '#' || CAST(o.id % 10 AS BIGINT) AS tag,
           CAST(o.total * 2 + 1 AS DOUBLE) AS taxed,
           upper(c.name) AS cust_uname,
           CASE WHEN c.bal >= 0 THEN 'ok' ELSE 'neg' END AS cust_band,
           COALESCE(ia.s, '') AS items_str
    FROM o_post o
    JOIN touched USING (id)
    LEFT JOIN c_post c ON o.cust = c.id
    LEFT JOIN (
      SELECT oid,
             string_agg(CAST(line AS VARCHAR) || 'x' || CAST(qty * 2 AS BIGINT),
                        ';' ORDER BY line,
                        CAST(line AS VARCHAR) || 'x' || CAST(qty * 2 AS BIGINT)) AS s
      FROM i_post GROUP BY oid) ia ON o.id = ia.oid""",
    doc=(
        "SQL doc-tree lane, expression template values: the root doc "
        "computes `lower(status) || '#' || (id % 10)::bigint` and an "
        "exact arithmetic amount (binary-safe: round-on-double diverges "
        "cross-engine by design policy, queries/helpers), the customer block computes upper() and a "
        "CASE band over its own columns, and the items elements carry "
        "`line || 'x' || qty*2` — all compiled against each block's own "
        "schema and computed as slot columns on the state rows by the "
        "fold lane, with the ordered-array spelling declared in the "
        "json_agg. Oracle rebuilds the same touched docs"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_expr_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    ).createOrReplaceTempView("sxe_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    ).createOrReplaceTempView("sxe_cust")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("sxe_item")

    sql = """select id, json_build_object(
      'tag', lower(status) || '#' || (id % 10)::bigint,
      'taxed', (total * 2 + 1)::double precision,
      'customer', (select json_build_object('uname', upper(name),
                     'band', case when bal >= 0 then 'ok' else 'neg' end)
                   from sxe_cust where sxe_cust.id = cust),
      'items', (select json_agg(json_build_object(
                  'istr', line::varchar || 'x' || qty * 2) order by line)
                from sxe_item where sxe_item.oid = sxe_order.id)
    ) as doc from sxe_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "expression-template SQL must derive the lane"

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("sxe_order")
    c_all = spark.table("sxe_cust")
    i_lines = spark.table("sxe_item")

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    ren = F.col("id") % 4 == 0
    c_new = c_all.withColumn(
        "name",
        F.when(ren, F.concat(F.col("name"), F.lit("*"))).otherwise(F.col("name")),
    )
    c_ch = (
        c_all.where(ren).withColumn("__op", dele)
        .unionByName(c_new.where(ren).withColumn("__op", ins))
    )
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in)
    i_ch = (
        i_lines.where(churn_in).withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "d0": c_ch.select("id"),
        "c0": i_ch.select("oid"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.tag").alias("tag"),
        F.col("doc.taxed").cast("double").alias("taxed"),
        F.col("doc.customer.uname").alias("cust_uname"),
        F.col("doc.customer.band").alias("cust_band"),
        F.concat_ws(
            ";", F.transform(F.col("doc.items"), lambda x: x["istr"])
        ).alias("items_str"),
    )


@query(
    "ivm_sql_element_tree",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    p_post AS (
      SELECT p_partkey AS id,
             CASE WHEN p_partkey % 10 = 0 THEN p_name || '+' ELSE p_name END AS name
      FROM part),
    s_post AS (
      SELECT s_suppkey AS id,
             CASE WHEN s_suppkey % 4 = 0 THEN s_name || '*' ELSE s_name END AS name
      FROM supplier),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_linenumber AS BIGINT) AS line,
             CAST(l_quantity AS BIGINT) AS qty, l_partkey AS pk,
             l_suppkey AS sk
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
        UNION ALL SELECT i.oid FROM i_post i WHERE i.pk % 10 = 0
        UNION ALL SELECT i.oid FROM i_post i WHERE i.sk % 4 = 0
      )
    )
    SELECT o.id, o.status, COALESCE(ia.s, '') AS items_str
    FROM o_post o
    JOIN touched USING (id)
    LEFT JOIN (
      SELECT i.oid,
             string_agg(i.qty || ':' || p.name || '/' || s.name, ';'
                        ORDER BY i.line, i.qty, p.name, s.name) AS s
      FROM i_post i
      LEFT JOIN p_post p ON i.pk = p.id
      LEFT JOIN s_post s ON i.sk = s.id
      GROUP BY i.oid) ia ON o.id = ia.oid""",
    doc=(
        "SQL doc-tree lane, BRANCHED element dim tree: each order item "
        "carries TWO independent to-one lookups — a part object AND a "
        "supplier object — deriving per-branch element-dim states and "
        "reverse indexes (views.edim_nodes DFS numbering); part renames "
        "walk the c0d0 index and supplier renames the SIBLING c0d1 "
        "index to exactly the affected docs in one churn batch across "
        "all four tables. Items declare ORDER BY line (duplicate line "
        "numbers in the synthetic data tie-break on the element, "
        "mirrored in the oracle). Completes the to-one tree lattice: "
        "root dims AND element dims are trees"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_element_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("set_order")
    t["part"].select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name"),
    ).createOrReplaceTempView("set_part")
    t["supplier"].select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"),
    ).createOrReplaceTempView("set_supp")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"),
    ).createOrReplaceTempView("set_item")

    sql = """select id, json_build_object('status', status,
      'items', (select json_agg(json_build_object('qty', qty,
          'part', (select json_build_object('name', set_part.name)
                   from set_part where set_part.id = pk),
          'supp', (select json_build_object('name', set_supp.name)
                   from set_supp where set_supp.id = sk))
          order by line)
        from set_item where set_item.oid = set_order.id)
    ) as doc from set_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "branched element tree must derive the lane"
    from sinker_spark.views import edim_nodes
    assert [(nd.idx, nd.dim.table, nd.parent)
            for nd in edim_nodes(sd.spec.children[0])] == [
        (0, "set_part", None), (1, "set_supp", None)
    ]

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("set_order")
    p_all = spark.table("set_part")
    s_all = spark.table("set_supp")
    i_lines = spark.table("set_item")

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )

    def rename(all_df, pred, suffix):
        new = all_df.withColumn(
            "name",
            F.when(pred, F.concat(F.col("name"), F.lit(suffix))).otherwise(F.col("name")),
        )
        ch = (
            all_df.where(pred).withColumn("__op", dele)
            .unionByName(new.where(pred).withColumn("__op", ins))
        )
        return new, ch

    _p_new, p_ch = rename(p_all, F.col("id") % 10 == 0, "+")
    _s_new, s_ch = rename(s_all, F.col("id") % 4 == 0, "*")
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in)
    i_ch = (
        i_lines.where(churn_in).withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
        "c0d0": apply_join_state(relation_state(p_all), changes_to_mult(p_ch)),
        "c0d1": apply_join_state(relation_state(s_all), changes_to_mult(s_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "c0": i_ch.select("oid"),
        "c0d0": p_ch.select("id"),
        "c0d1": s_ch.select("id"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.items"),
                lambda x: F.concat_ws(
                    "/",
                    F.concat_ws(":", x["qty"].cast("string"), x["part"]["name"]),
                    x["supp"]["name"],
                ),
            ),
        ).alias("items_str"),
    )


@query(
    "ivm_sql_dim_where",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (
      SELECT c_custkey AS id, c_name AS name,
             CASE WHEN c_custkey % 4 = 0 THEN -c_acctbal - 1 ELSE c_acctbal END AS bal
      FROM customer),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_linenumber AS BIGINT) AS line,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT o.id FROM o_post o WHERE o.cust % 4 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
      )
    )
    SELECT o.id, o.status, c.name AS cust_name,
           COALESCE(ia.s, '') AS items_str
    FROM o_post o
    JOIN touched USING (id)
    JOIN c_post c ON o.cust = c.id
    LEFT JOIN (
      SELECT oid, string_agg(line || ':' || qty, ';' ORDER BY line, qty) AS s
      FROM i_post GROUP BY oid) ia ON o.id = ia.oid
    WHERE c.bal >= 0 AND o.status <> 'P'""",
    doc=(
        "SQL doc-tree lane, round-7 grammar: root WHERE referencing a "
        "main-FROM JOIN-DIM column (`where c.bal >= 0 and o.status <> "
        "'P'` — r6 bailed any non-parent root predicate to targeted "
        "refresh). The predicate is compiled against the serve's joined "
        "frame (bare parent columns + __d0_-prefixed dim columns), the "
        "dim's filter column is pulled into its state schema, and a DIM "
        "delta flipping the predicate (every 4th customer's balance "
        "negated) retracts the parent docs through the dim's "
        "reverse-index walk — exactly as the compiled view drops the "
        "row. Oracle rebuilds the same touched docs from the post-batch "
        "tables with the same WHERE"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_dim_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("swd_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    ).createOrReplaceTempView("swd_cust")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("swd_item")

    sql = """select o.id, json_build_object('status', o.status,
      'cust_name', c.name,
      'items', (select json_agg(json_build_object('ln', line, 'qty', qty)
                                order by line, qty)
                from swd_item where swd_item.oid = o.id)
    ) as doc from swd_order o join swd_cust c on o.cust = c.id
    where c.bal >= 0 and o.status <> 'P'"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "dim-column root WHERE must derive the lane (r7)"
    assert sd.where_join_expr is not None and sd.where_expr is None

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("swd_order")
    c_all = spark.table("swd_cust")
    i_lines = spark.table("swd_item")

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    # the WHERE-flip delta: every 4th customer's balance negated —
    # passing docs retract, failing ones (bal < 0 pre-batch) re-admit
    flip = F.col("id") % 4 == 0
    c_new = c_all.withColumn(
        "bal", F.when(flip, -F.col("bal") - 1).otherwise(F.col("bal"))
    )
    c_ch = (
        c_all.where(flip).withColumn("__op", dele)
        .unionByName(c_new.where(flip).withColumn("__op", ins))
    )
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in)
    i_ch = (
        i_lines.where(churn_in).withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "d0": c_ch.select("id"),
        "c0": i_ch.select("oid"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.col("doc.cust_name").alias("cust_name"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.items"),
                lambda x: F.concat_ws(
                    ":", x["ln"].cast("string"), x["qty"].cast("string")
                ),
            ),
        ).alias("items_str"),
    )


@query(
    "ivm_sql_corr_filter",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust,
             CASE WHEN o_orderkey % 9 = 0 THEN 'P' ELSE o_orderstatus END AS status,
             o_totalprice AS total
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    c_post AS (
      SELECT c_custkey AS id, c_name AS name,
             CASE WHEN c_custkey % 4 = 0 THEN c_acctbal - 5000 ELSE c_acctbal END AS bal
      FROM customer),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_linenumber AS BIGINT) AS line,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0 OR o_orderkey % 9 = 0
        UNION ALL SELECT o.id FROM o_post o WHERE o.cust % 4 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
      )
    )
    SELECT o.id, o.status, c.name AS cust_name,
           COALESCE((SELECT string_agg(line || ':' || qty, ';' ORDER BY line, qty)
                     FROM i_post i
                     WHERE i.oid = o.id AND (i.qty > 25 OR o.status = 'P')),
                    '') AS items_str
    FROM o_post o
    JOIN touched USING (id)
    LEFT JOIN c_post c ON o.cust = c.id AND c.bal >= o.total / 100""",
    doc=(
        "SQL doc-tree lane, round-7 grammar: CORRELATED block filters "
        "(non-correlation conjuncts referencing the block's ANCHOR — r6 "
        "bailed them to targeted refresh). The to-one customer block is "
        "guarded by `c.bal >= o.total / 100`, compiled into the serve's "
        "JOIN condition so a failing dim row serves NULL exactly like "
        "the compiled subquery matching nothing; the to-many items "
        "block is filtered by `qty > 25 OR o.status = 'P'`, an element "
        "predicate whose anchor column travels on the probe as an "
        "__af_ slot. Anchor flips (status → 'P' on every 9th order), "
        "dim balance drops (every 4th customer) and child churn all "
        "fold through the normal walks. Oracle rebuilds the same "
        "touched docs with the same correlated predicates"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_corr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    ).createOrReplaceTempView("scf_order")
    t["customer"].select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    ).createOrReplaceTempView("scf_cust")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("scf_item")

    sql = """select id, json_build_object('status', status,
      'customer', (select json_build_object('name', name) from scf_cust
                   where scf_cust.id = cust
                     and scf_cust.bal >= scf_order.total / 100),
      'big_items', (select json_agg(json_build_object('ln', line, 'qty', qty)
                                    order by line, qty)
                    from scf_item where scf_item.oid = scf_order.id
                      and (qty > 25 or scf_order.status = 'P'))
    ) as doc from scf_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None, "correlated block filters must derive the lane (r7)"
    assert sd.corr_join_pred and sd.corr_elem_pred

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("scf_order")
    c_all = spark.table("scf_cust")
    i_lines = spark.table("scf_item")

    # orders: the usual %3-insert / %5-delete churn, PLUS an anchor flip
    # (status → 'P' on every 9th) that re-admits small items through the
    # element predicate's OR branch
    flip = F.col("id") % 9 == 0
    leave = (F.col("id") % 5 == 0) & (F.col("id") % 3 != 0)
    o_new = o_all.withColumn(
        "status", F.when(flip, F.lit("P")).otherwise(F.col("status"))
    )
    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_new.where(
            (F.col("id") % 3 == 0) | (flip & ~leave & (F.col("id") % 3 != 0))
        ).withColumn("__op", ins)
        .unionByName(
            o_all.where(leave | (flip & ~leave & (F.col("id") % 3 != 0)))
            .withColumn("__op", dele)
        )
    )
    cflip = F.col("id") % 4 == 0
    c_new = c_all.withColumn(
        "bal", F.when(cflip, F.col("bal") - 5000).otherwise(F.col("bal"))
    )
    c_ch = (
        c_all.where(cflip).withColumn("__op", dele)
        .unionByName(c_new.where(cflip).withColumn("__op", ins))
    )
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in)
    i_ch = (
        i_lines.where(churn_in).withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "d0": apply_join_state(relation_state(c_all), changes_to_mult(c_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "d0": c_ch.select("id"),
        "c0": i_ch.select("oid"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.col("doc.customer.name").alias("cust_name"),
        F.concat_ws(
            ";",
            F.transform(
                F.col("doc.big_items"),
                lambda x: F.concat_ws(
                    ":", x["ln"].cast("string"), x["qty"].cast("string")
                ),
            ),
        ).alias("items_str"),
    )


@query(
    "ivm_sql_distinct_agg",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    i_post AS (
      SELECT l_orderkey AS oid, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL SELECT l_orderkey FROM lineitem
                  WHERE (l_orderkey + l_linenumber) % 7 = 0 OR l_orderkey % 11 = 0
      )
    )
    SELECT o.id, o.status,
           COALESCE((SELECT string_agg(CAST(q AS VARCHAR), ';' ORDER BY q)
                     FROM (SELECT DISTINCT i.qty AS q FROM i_post i
                           WHERE i.oid = o.id) d), '') AS qtys_str
    FROM o_post o JOIN touched USING (id)""",
    doc=(
        "SQL doc-tree lane, round-7 grammar: `json_agg(DISTINCT "
        "json_build_object(…))` (PG MVs use it to dedup join fan-out — "
        "r6 bailed the derivation). The fold lane serves the array as "
        "sort_array(array_distinct(collect_list(…))), value-identical "
        "to the transpiled compile's collect_list(DISTINCT …); lineitem "
        "quantities repeat within an order, so the dedup is exercised "
        "on every doc. Churn on both tables folds through the normal "
        "walks. Oracle rebuilds the same touched docs with SELECT "
        "DISTINCT"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("sda_order")
    t["lineitem"].select(
        F.col("l_orderkey").alias("oid"),
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).createOrReplaceTempView("sda_item")

    sql = """select id, json_build_object('status', status,
      'qtys', (select json_agg(distinct json_build_object('q', qty))
               from sda_item where sda_item.oid = sda_order.id)
    ) as doc from sda_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None and sd.sql_children[0].distinct, \
        "DISTINCT json_agg must derive the fold lane (r7)"

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("sda_order")
    i_lines = spark.table("sda_item")

    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    churn_in = (F.col("oid") + F.col("line")) % 7 == 0
    i_old = i_lines.where(~churn_in).select("oid", "qty")
    i_ch = (
        i_lines.where(churn_in).select("oid", "qty").withColumn("__op", ins)
        .unionByName(
            i_lines.where((F.col("oid") % 11 == 0) & ~churn_in)
            .select("oid", "qty").withColumn("__op", dele)
        )
    )

    posts = {
        "p": apply_join_state(relation_state(o_old), changes_to_mult(o_ch)),
        "c0": apply_join_state(relation_state(i_old), changes_to_mult(i_ch)),
    }
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "c0": i_ch.select("oid"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.concat_ws(
            ";",
            F.transform(F.col("doc.qtys"), lambda x: x["q"].cast("string")),
        ).alias("qtys_str"),
    )


@query(
    "ivm_sql_alt_anchor",
    oracle="""
    WITH o_post AS (
      SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 <> 0),
    touched AS (
      SELECT DISTINCT id FROM (
        SELECT o_orderkey AS id FROM orders
        WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0
        UNION ALL
        SELECT o.id FROM o_post o
        JOIN (SELECT DISTINCT o_custkey AS cust FROM orders
              WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0) ch
          ON o.cust = ch.cust
      )
    )
    SELECT o.id, o.status,
           COALESCE(s.sibs, '') AS sibs_str,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_sibs
    FROM o_post o
    JOIN touched USING (id)
    LEFT JOIN (SELECT cust, string_agg(CAST(id AS VARCHAR), ';' ORDER BY id) AS sibs,
                      COUNT(*) AS n
               FROM o_post GROUP BY cust) s ON o.cust = s.cust""",
    doc=(
        "SQL doc-tree lane, round-7 grammar: a to-many block keyed on a "
        "NON-KEY parent column (`o2.cust = saa_order.cust` — each order "
        "doc lists every order of the same customer; r6 bailed any "
        "array not keyed on the anchor's id). The fold maintains an "
        "anchor→parent-key reverse index (ra state, bucket-pruned by "
        "the anchor) so an order churned in or out walks to EVERY "
        "sibling doc sharing its customer; a scalar count(*) over the "
        "same non-key anchor serves alongside the array — the oracle reproduces that "
        "fan-out in the touched set. Self-correlation also exercises "
        "PG alias scoping (the o2 alias hides the table name, making "
        "the outer ref resolvable)"
    ),
    tags=("A11", "ivm", "ivm-doc", "A2", "composition"),
)
def ivm_sql_alt_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.ivm_delta import apply_join_state, changes_to_mult, relation_state
    from sinker_spark.ivm_doc_sql import derive_sql_doctree, serve_docs_sql
    from sinker_spark.ivm_flagship import relation_rows_for, touched_parent_keys

    t = load_tables(spark, sf_dir)
    t["orders"].select(
        F.col("o_orderkey").alias("id"), F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
    ).createOrReplaceTempView("saa_order")

    sql = """select id, json_build_object('status', status,
      'sibs', (select json_agg(json_build_object('oid', o2.id))
               from saa_order o2 where o2.cust = saa_order.cust),
      'n_sibs', (select count(*) from saa_order o3
                 where o3.cust = saa_order.cust)
    ) as doc from saa_order"""
    sd = derive_sql_doctree(spark, sql)
    assert sd is not None and sd.sql_children[0].anchor == "cust", \
        "non-key parent anchor must derive the lane (r7)"

    ins, dele = F.lit("insert"), F.lit("delete")
    o_all = spark.table("saa_order")
    o_old = o_all.where(F.col("id") % 3 != 0)
    o_ch = (
        o_all.where(F.col("id") % 3 == 0).withColumn("__op", ins)
        .unionByName(
            o_all.where((F.col("id") % 5 == 0) & (F.col("id") % 3 != 0))
            .withColumn("__op", dele)
        )
    )
    o_state = apply_join_state(relation_state(o_old), changes_to_mult(o_ch))
    posts = {"p": o_state, "c0": o_state, "c1": o_state}
    rows_for = relation_rows_for(posts)
    change_keys = {
        "p": o_ch.select("id"),
        "c0": o_ch.select("cust"),
        "c1": o_ch.select("cust"),
    }
    touched = touched_parent_keys(sd.spec, change_keys, rows_for)
    docs = serve_docs_sql(sd, touched, rows_for)
    return docs.select(
        "id",
        F.col("doc.status").alias("status"),
        F.concat_ws(
            ";",
            F.transform(F.col("doc.sibs"), lambda x: x["oid"].cast("string")),
        ).alias("sibs_str"),
        F.col("doc.n_sibs").cast("bigint").alias("n_sibs"),
    )
