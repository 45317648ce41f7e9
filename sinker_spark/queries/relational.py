"""Relational SQL surface — SURVEY.md §2 Table B plus the "absent
category" operators (windows, top-k, set ops, rollup/cube, semi/anti,
range/theta joins, batteries) that the reference's full-SQL view language
inherits from Postgres (reference README.md:84-85) and we inherit from
Spark SQL.

Scale notes (100 TB design review per query):
- group-bys emit partial aggregates map-side; keys here (returnflag,
  nation, brand…) are low-cardinality → tiny shuffles.
- dimension joins (nation, region, bands) are explicit ``broadcast``;
  fact-fact joins (orders⋈lineitem) shuffle on the join key and AQE
  handles skew.
- every filter is a plain Catalyst predicate → pushed into the parquet
  scan (verified via .explain in tests/test_plans.py).
- top-k uses ``ORDER BY … LIMIT k`` which Spark executes as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  never a full sort of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables, register_views
from sinker_spark.queries import query
from sinker_spark.queries.helpers import (
    REVENUE_SQL,
    davg,
    davg_expr,
    dsum,
    dsum_expr,
    mavg,
    mavg_expr,
    msum,
    msum_expr,
    revenue,
)


def _sql(name: str, spark_sql: str, oracle: str, doc: str = "", tags: tuple[str, ...] = ()):
    """Register a query expressed as Spark SQL text (the reference's native
    mode: users hand the engine SQL, sinker.py:96-98)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = doc
    query(name, oracle=oracle, doc=doc, tags=tags)(fn)
    return fn


# --- B1/B2: scan + projection + aliasing ---------------------------------
@query(
    "scan_project_alias",
    oracle="""SELECT o_orderkey AS orderkey, o_orderstatus AS status,
                     o_totalprice AS totalprice FROM orders""",
    doc="B1/B2 table scan with pruned projection and aliases (person_mv.sql:1-4 shape)",
    tags=("B1", "B2"),
)
def scan_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )


# --- B3: filters / predicates --------------------------------------------
@query(
    "filter_compound_predicate",
    oracle="""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem
              WHERE l_returnflag = 'R' AND l_quantity > 30
                AND l_discount BETWEEN 0.02 AND 0.08
                AND l_shipdate >= TIMESTAMP '1997-01-01'""",
    doc="B3 compound predicate — all four conjuncts push into the parquet scan",
    tags=("B3",),
)
def filter_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") > 30)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --- B15/B19/B23: TPC-H Q1 pricing summary -------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {msum_expr('l_quantity')} AS sum_qty,
           {msum_expr('l_extendedprice')} AS sum_base_price,
           {REVENUE_SQL} AS sum_disc_price,
           {mavg_expr('l_quantity')} AS avg_qty,
           {mavg_expr('l_extendedprice')} AS avg_price,
           {mavg_expr('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1 shape: multi-aggregate GROUP BY; low-cardinality keys → map-side partials, tiny shuffle",
    tags=("B15", "B19", "B23"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            msum("l_quantity").alias("sum_qty"),
            msum("l_extendedprice").alias("sum_base_price"),
            revenue().alias("sum_disc_price"),
            mavg("l_quantity").alias("avg_qty"),
            mavg("l_extendedprice").alias("avg_price"),
            mavg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- B13 + top-k: TPC-H Q3 shipping priority -----------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey AS orderkey, {REVENUE_SQL} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority AS priority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, orderkey LIMIT 10""",
    doc="TPC-H Q3 shape: 3-way join + agg + deterministic top-k (TakeOrderedAndProject, no full sort)",
    tags=("B13", "B20"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate", "priority")
    )


# --- multi-join star query: TPC-H Q5 shape -------------------------------
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation, {REVENUE_SQL} AS revenue
    FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name""",
    doc="TPC-H Q5 shape: 6-way star join; nation/region broadcast, fact joins shuffle on orderkey",
    tags=("B13",),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(revenue().alias("revenue"))
    )


# --- TPC-H Q7 shape: bi-national volume shipping --------------------------
_sql(
    "q7_volume_shipping",
    spark_sql=f"""
    SELECT supp_region, cust_nation, l_year, {dsum_expr('volume')} AS revenue
    FROM (
      SELECT r1.r_name AS supp_region, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * CAST(1.0 - l.l_discount AS DECIMAL(18,4)) AS DOUBLE) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
         OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
    ) shipping
    GROUP BY supp_region, cust_nation, l_year""",
    oracle=f"""
    SELECT supp_region, cust_nation, l_year, {dsum_expr('volume')} AS revenue
    FROM (
      SELECT r1.r_name AS supp_region, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * CAST(1.0 - l.l_discount AS DECIMAL(18,4)) AS DOUBLE) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
         OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
    ) shipping
    GROUP BY supp_region, cust_nation, l_year""",
    doc="TPC-H Q7 shape: double nation-dim join with a disjunctive cross-filter, yearly revenue rollup",
    tags=("B13", "B15"),
)

# --- TPC-H Q9 shape: brand profit by nation and year ----------------------
_sql(
    "q9_brand_profit",
    spark_sql=f"""
    SELECT nation, yr, p_brand AS brand, {dsum_expr('volume')} AS revenue
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS yr, p.p_brand,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * CAST(1.0 - l.l_discount AS DECIMAL(18,4)) AS DOUBLE) AS volume
      FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, yr, p_brand""",
    oracle=f"""
    SELECT nation, yr, p_brand AS brand, {dsum_expr('volume')} AS revenue
    FROM (
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS yr, p.p_brand,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * CAST(1.0 - l.l_discount AS DECIMAL(18,4)) AS DOUBLE) AS volume
      FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, yr, p_brand""",
    doc="TPC-H Q9 shape: 5-way join with LIKE filter, 3-key rollup",
    tags=("B13", "B15"),
)

# --- funnel conversion over events ----------------------------------------
_sql(
    "funnel_signup_to_purchase",
    spark_sql="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id AND e.ts >= s.signup_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT date_format(date_trunc('day', s.signup_ts), 'yyyy-MM-dd') AS cohort_day,
           COUNT(*) AS signups,
           COUNT(p.purchase_ts) AS converted,
           round(CAST(COUNT(p.purchase_ts) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    GROUP BY date_format(date_trunc('day', s.signup_ts), 'yyyy-MM-dd')""",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id AND e.ts >= s.signup_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT strftime(date_trunc('day', s.signup_ts), '%Y-%m-%d') AS cohort_day,
           COUNT(*) AS signups,
           COUNT(p.purchase_ts) AS converted,
           round(CAST(COUNT(p.purchase_ts) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    GROUP BY strftime(date_trunc('day', s.signup_ts), '%Y-%m-%d')""",
    doc="funnel analysis: first-signup cohort → conversion to first subsequent purchase; event-sequence pattern over the stream table in pure SQL",
    tags=("funnel", "B12", "B14"),
)

# --- recursive CTE: month spine with zero-filled counts -------------------
_sql(
    "recursive_month_spine",
    spark_sql="""
    WITH RECURSIVE spine(month_start) AS (
      SELECT date_trunc('month', MIN(o_orderdate)) FROM orders
      UNION ALL
      SELECT month_start + INTERVAL 1 MONTH FROM spine
      WHERE month_start < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
    ),
    monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT date_format(s.month_start, 'yyyy-MM') AS month,
           COALESCE(mo.n, 0) AS n_orders
    FROM spine s LEFT JOIN monthly mo ON mo.m = s.month_start""",
    oracle="""
    WITH RECURSIVE spine(month_start) AS (
      SELECT date_trunc('month', MIN(o_orderdate)) FROM orders
      UNION ALL
      SELECT month_start + INTERVAL 1 MONTH FROM spine
      WHERE month_start < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
    ),
    monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT strftime(s.month_start, '%Y-%m') AS month,
           COALESCE(mo.n, 0) AS n_orders
    FROM spine s LEFT JOIN monthly mo ON mo.m = s.month_start""",
    doc="recursive CTE (Spark 4.1 WITH RECURSIVE): generated month spine left-joined to monthly order counts — gap months appear with 0",
    tags=("B12", "recursive-cte"),
)

# --- B12: CTE ------------------------------------------------------------
_sql(
    "cte_big_spenders",
    spark_sql=f"""
    WITH cust_totals AS (
      SELECT o_custkey, {dsum_expr('o_totalprice')} AS total_spent, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_name AS name, t.total_spent, t.n_orders
    FROM cust_totals t JOIN customer c ON c.c_custkey = t.o_custkey
    WHERE t.total_spent > 1000000""",
    oracle=f"""
    WITH cust_totals AS (
      SELECT o_custkey, {dsum_expr('o_totalprice')} AS total_spent, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_name AS name, t.total_spent, t.n_orders
    FROM cust_totals t JOIN customer c ON c.c_custkey = t.o_custkey
    WHERE t.total_spent > 1000000""",
    doc="B12 CTE (test_parse_schema_tables.py:22-38 shape): WITH + join + HAVING-style filter",
    tags=("B12", "B13", "B15"),
)

# --- B16: DISTINCT ON (first row per key) --------------------------------
_sql(
    "distinct_on_latest_order",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn = 1""",
    doc="B16 DISTINCT ON equivalent (test_parse_schema_tables.py:23-24): window row_number with explicit ordering",
    tags=("B16",),
)

# --- B14: left outer join with null handling -----------------------------
_sql(
    "left_join_order_counts",
    spark_sql="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(8,2))), 0), 2) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name""",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(8,2))), 0), 2) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name""",
    doc="B14 left join (test_parse_schema_tables.py:80): zero-order customers kept with count 0",
    tags=("B14", "B15"),
)

# --- semi/anti joins -----------------------------------------------------
@query(
    "semi_join_active_customers",
    oracle="""SELECT c_custkey, c_name FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'O')""",
    doc="left-semi join (EXISTS): customers with at least one open order; no row duplication, no payload shuffle of orders",
    tags=("join-semi",),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    open_orders = t["orders"].where(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "anti_join_idle_customers",
    oracle="""SELECT c_custkey, c_name FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'O')""",
    doc="left-anti join (NOT EXISTS): customers with no currently-open order",
    tags=("join-anti",),
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    open_orders = t["orders"].where(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# --- lateral correlated subquery in FROM ----------------------------------
_sql(
    "lateral_top_orders_per_segment",
    spark_sql="""
    SELECT c.c_mktsegment AS segment, c.c_custkey AS custkey,
           t.orderkey, t.totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
      FROM orders WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey < 50""",
    oracle="""
    SELECT c.c_mktsegment AS segment, c.c_custkey AS custkey,
           t.orderkey, t.totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
      FROM orders WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey < 50""",
    doc="LATERAL correlated derived table (top-2 orders per customer); Catalyst decorrelates into a ranked window join — no per-row execution",
    tags=("join-lateral", "B18"),
)

# --- B5: correlated scalar subquery --------------------------------------
_sql(
    "scalar_subquery_order_count",
    spark_sql="""
    SELECT c_custkey AS custkey,
           (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
    FROM customer""",
    oracle="""
    SELECT c_custkey AS custkey,
           (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
    FROM customer""",
    doc="B5 correlated scalar subquery (course_mv.sql:3-8 shape); Catalyst decorrelates into an aggregate + left join",
    tags=("B5",),
)

# --- B17/B18: derived table + subquery returning aggregate ----------------
_sql(
    "derived_table_avg_of_totals",
    spark_sql=f"""
    SELECT sub.status, {davg_expr('sub.cust_total')} AS avg_cust_total, COUNT(*) AS n_custs
    FROM (SELECT o_orderstatus AS status, o_custkey,
                 {dsum_expr('o_totalprice')} AS cust_total
          FROM orders GROUP BY o_orderstatus, o_custkey) sub
    GROUP BY sub.status""",
    oracle=f"""
    SELECT sub.status, {davg_expr('sub.cust_total')} AS avg_cust_total, COUNT(*) AS n_custs
    FROM (SELECT o_orderstatus AS status, o_custkey,
                 {dsum_expr('o_totalprice')} AS cust_total
          FROM orders GROUP BY o_orderstatus, o_custkey) sub
    GROUP BY sub.status""",
    doc="B18 derived table in FROM (test_parse_schema_tables.py:74-77): two-level aggregation",
    tags=("B17", "B18"),
)

# --- B8/B7: array aggregation with pinned order --------------------------
@query(
    "array_agg_order_parts",
    oracle="""SELECT l_orderkey AS orderkey,
                     array_to_string(list(DISTINCT l_partkey ORDER BY l_partkey), ',') AS partkeys,
                     COUNT(*) AS n_items
              FROM lineitem GROUP BY l_orderkey""",
    doc="B8 array_agg (test_parse_schema_tables.py:8-11): per-order sorted distinct part list; collect_set order pinned via sort_array. Result serialized to CSV string so the harness can hash it (top-level array columns are unhashable in pandas canonicalizers).",
    tags=("B7", "B8"),
)
def array_agg_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("l_partkey"))).alias("partkeys"),
            F.count("*").alias("n_items"),
        )
    )


# --- B9/B10: unnest + split_part -----------------------------------------
@query(
    "unnest_split_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE token <> '' GROUP BY token""",
    doc="B9 unnest-as-table-source (test_parse_schema_tables.py:8): explode(split(text)) → token counts",
    tags=("B9",),
)
def unnest_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "split_part_customer_number",
    oracle="""SELECT c_custkey, split_part(c_name, '#', 2) AS cust_number FROM customer""",
    doc="B10 split_part (test_parse_schema_tables.py:8-10): 1-based field extraction",
    tags=("B10",),
)
def split_part_customer_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["customer"].select("c_custkey", F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_number"))


# --- B11: jsonb_each_text lateral ----------------------------------------
@query(
    "json_each_event_props",
    oracle="""
    SELECT e.event_id, k.key AS key,
           json_extract_string(e.props, '$.' || k.key) AS value
    FROM events e, (SELECT event_id, unnest(json_keys(props)) AS key FROM events) k
    WHERE e.event_id = k.event_id""",
    doc="B11 jsonb_each_text lateral (test_parse_schema_tables.py:75-76): JSON map → (key, value) rows via from_json + explode",
    tags=("B11",),
)
def json_each_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["events"].select(
        "event_id",
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "value"),
    )


# --- set operations ------------------------------------------------------
_SET_SPARK = {
    "union": "UNION",
    "intersect": "INTERSECT",
    "except": "EXCEPT",
}
for _op, _kw in _SET_SPARK.items():
    _sql(
        f"set_{_op}_nations",
        spark_sql=f"""
        SELECT n_name AS nation FROM customer JOIN nation ON c_nationkey = n_nationkey
        {_kw}
        SELECT n_name AS nation FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
        oracle=f"""
        SELECT n_name AS nation FROM customer JOIN nation ON c_nationkey = n_nationkey
        {_kw}
        SELECT n_name AS nation FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
        doc=f"set operation {_kw}: customer nations vs supplier nations",
        tags=("set-ops",),
    )

# --- grouping sets / rollup / cube ---------------------------------------
_sql(
    "rollup_order_stats",
    spark_sql=f"""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n, {dsum_expr('o_totalprice')} AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    oracle=f"""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n, {dsum_expr('o_totalprice')} AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    doc="ROLLUP with GROUPING() disambiguation of null group labels",
    tags=("rollup",),
)

_sql(
    "cube_part_stats",
    spark_sql=f"""
    SELECT p_brand AS brand, p_type AS type,
           GROUPING(p_brand) AS g_brand, GROUPING(p_type) AS g_type,
           COUNT(*) AS n, {davg_expr('p_retailprice')} AS avg_price
    FROM part GROUP BY CUBE (p_brand, p_type)""",
    oracle=f"""
    SELECT p_brand AS brand, p_type AS type,
           GROUPING(p_brand) AS g_brand, GROUPING(p_type) AS g_type,
           COUNT(*) AS n, {davg_expr('p_retailprice')} AS avg_price
    FROM part GROUP BY CUBE (p_brand, p_type)""",
    doc="CUBE over brand×type",
    tags=("cube",),
)

_sql(
    "grouping_sets_mixed",
    spark_sql=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           {dsum_expr('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           {dsum_expr('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",
    doc="explicit GROUPING SETS",
    tags=("grouping-sets",),
)

# --- range / theta joins -------------------------------------------------
@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES ('budget', 0.0, 920.0), ('mid', 920.0, 960.0),
                                        ('premium', 960.0, 100000.0))
    SELECT b.band AS band, COUNT(*) AS n_parts,
           CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band""",
    doc="range (interval) join: fact × tiny band dim via non-equi condition; the dim side is broadcast so the theta join is a per-row predicate scan, not a cartesian shuffle",
    tags=("join-range",),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bands = t["part"].sparkSession.createDataFrame(
        [("budget", 0.0, 920.0), ("mid", 920.0, 960.0), ("premium", 960.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        t["part"]
        .join(F.broadcast(bands), (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


@query(
    "theta_join_ship_lag",
    oracle="""
    SELECT o.o_orderkey AS orderkey, COUNT(l.l_linenumber) AS n_shipped_within_30d
    FROM orders o LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey""",
    doc="equi + range theta join: lineitems shipped within 30 days of order date; equi key carries the shuffle, range predicate evaluated post-match",
    tags=("join-range", "B14"),
)
def theta_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    return (
        o.join(li, cond, "left")
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(F.count("l_linenumber").alias("n_shipped_within_30d"))
    )


# --- window functions ----------------------------------------------------
_sql(
    "w1_running_total",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(8,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(8,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders""",
    doc="window frame ROWS UNBOUNDED PRECEDING: per-customer running spend (decimal-exact accumulation)",
    tags=("window-frame",),
)

_sql(
    "w2_rank_orders",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
    doc="ranking windows: rank / dense_rank / ntile over a named window",
    tags=("window-rank",),
)

_sql(
    "w3_lag_days_between_orders",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           datediff(o_orderdate,
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey)) AS days_since_prev
    FROM orders""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           datediff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS days_since_prev
    FROM orders""",
    doc="lag + datediff: inter-order gap per customer (NULL for first order)",
    tags=("window-analytic",),
)

_sql(
    "w5_moving_avg_3",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(8,2))) OVER w, 2) AS DOUBLE)
             / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(8,2))) OVER w, 2) AS DOUBLE)
             / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    doc="bounded ROWS frame: 3-order moving average, decimal-exact",
    tags=("window-frame",),
)

_sql(
    "top_orders_per_customer",
    spark_sql="""
    SELECT custkey, orderkey, totalprice FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3""",
    oracle="""
    SELECT custkey, orderkey, totalprice FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3""",
    doc="top-k per group via row_number; Spark runs this as a single shuffle + per-partition sort with rank-limit pushdown",
    tags=("window-rank", "B20"),
)

# --- global aggregate battery + exact count distinct ----------------------
_sql(
    "agg_global_stats",
    spark_sql=f"""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           {dsum_expr('o_totalprice')} AS sum_price,
           date_format(MIN(o_orderdate), 'yyyy-MM-dd') AS first_order,
           date_format(MAX(o_orderdate), 'yyyy-MM-dd') AS last_order
    FROM orders""",
    oracle=f"""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           {dsum_expr('o_totalprice')} AS sum_price,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
    FROM orders""",
    doc="B19 global aggregates incl. exact COUNT DISTINCT (expands to two-stage partial agg)",
    tags=("B19",),
)


# --- approximate aggregates ----------------------------------------------
@query(
    "approx_distinct_customers",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(*) AS BIGINT) AS exact_rows,
           TRUE AS approx_within_bounds
    FROM customer GROUP BY c_mktsegment""",
    doc=(
        "approx_count_distinct (HyperLogLog++, rsd 0.02) per segment, "
        "hash-checked: the sketch estimate itself is engine-specific, so "
        "the gate emits the exact NDV plus a 3-sigma within-bounds "
        "VERDICT column (|approx - exact| <= 6% of exact) the oracle "
        "asserts TRUE — a sketch that strays out of its error envelope "
        "now fails the hash gate instead of hiding behind rows-only"
    ),
    tags=("approx",),
)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("exact_customers"),
            F.count("*").alias("exact_rows"),
            F.approx_count_distinct("c_custkey", 0.02).alias("__approx"),
        )
        .select(
            "segment",
            "exact_customers",
            "exact_rows",
            (
                F.abs(F.col("__approx") - F.col("exact_customers")).cast("double")
                <= F.lit(0.06) * F.col("exact_customers").cast("double")
            ).alias("approx_within_bounds"),
        )
    )


@query(
    "approx_percentile_prices",
    oracle="""
    SELECT status, quantile, price FROM (
      SELECT o_orderstatus AS status, 'p50' AS quantile,
             quantile_disc(CAST(o_totalprice AS DOUBLE), 0.5) AS price
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, 'p90', quantile_disc(CAST(o_totalprice AS DOUBLE), 0.9)
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, 'p99', quantile_disc(CAST(o_totalprice AS DOUBLE), 0.99)
      FROM orders GROUP BY o_orderstatus) u""",
    doc=(
        "approx_percentile over order totals per status, run in the "
        "sketch's exactness regime: the GK summary is rank-exact once "
        "accuracy > 2n (here 1e6 vs ~50k rows/group), so the sketch output "
        "IS the discrete order statistic and hash-matches DuckDB's "
        "quantile_disc — the approximate lane gets a full oracle instead "
        "of rows-only (boundary semantics cross-checked in "
        "tests/test_operators.py). Percentiles exploded to one row per "
        "(status, quantile) so no result column is array-typed."
    ),
    tags=("approx", "percentile"),
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pcts = (
        t["orders"]
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.percentile_approx(
                F.col("o_totalprice").cast("double"), [0.5, 0.9, 0.99], 1000000
            ).alias("pcts"),
        )
    )
    labels = F.array(F.lit("p50"), F.lit("p90"), F.lit("p99"))
    return (
        pcts.select("status", F.posexplode("pcts").alias("pos", "price"))
        .select(
            "status",
            F.element_at(labels, F.col("pos") + 1).alias("quantile"),
            "price",
        )
    )


# --- scalar function batteries -------------------------------------------
_sql(
    "battery_datetime",
    spark_sql="""
    SELECT o_orderkey AS orderkey,
           year(o_orderdate)  AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr, weekday(o_orderdate) AS dow_mon0,
           date_format(o_orderdate, 'yyyy-MM-dd') AS iso_date,
           date_format(o_orderdate + INTERVAL 45 DAY, 'yyyy-MM-dd') AS plus_45d,
           date_format(add_months(o_orderdate, 2), 'yyyy-MM-dd') AS plus_2mo,
           datediff(TIMESTAMP '2000-01-01', o_orderdate) AS days_to_y2k,
           date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start
    FROM orders""",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) - 1 AS INT) AS dow_mon0,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus_45d,
           strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders""",
    doc="date/time battery: extract/arith/trunc/format — cross-engine-aligned semantics (dow normalized to Monday=0)",
    tags=("functions-date",),
)

_sql(
    "battery_string",
    spark_sql="""
    SELECT c_custkey AS custkey,
           upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
           length(c_name) AS name_len,
           substring(c_name, 10, 9) AS cust_digits,
           concat(c_mktsegment, ':', c_name) AS tagged,
           trim('  pad  ') AS trimmed,
           lpad(CAST(c_custkey AS STRING), 8, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           CASE WHEN c_name LIKE 'Customer#%' THEN 1 ELSE 0 END AS is_customer,
           reverse(c_mktsegment) AS rseg,
           contains(c_name, '0000') AS has_zeros,
           startswith(c_name, 'Customer') AS is_cust_prefix
    FROM customer""",
    oracle="""
    SELECT c_custkey AS custkey,
           upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
           CAST(length(c_name) AS INT) AS name_len,
           substring(c_name, 10, 9) AS cust_digits,
           concat(c_mktsegment, ':', c_name) AS tagged,
           trim('  pad  ') AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           CASE WHEN c_name LIKE 'Customer#%' THEN 1 ELSE 0 END AS is_customer,
           reverse(c_mktsegment) AS rseg,
           contains(c_name, '0000') AS has_zeros,
           starts_with(c_name, 'Customer') AS is_cust_prefix
    FROM customer""",
    doc="string battery: case/length/substring/concat/pad/replace/regexp/like/reverse/contains",
    tags=("functions-string",),
)

_sql(
    "battery_math",
    spark_sql="""
    SELECT o_orderkey AS orderkey,
           round(o_totalprice, 1) AS rounded,
           floor(o_totalprice) AS floored, ceil(o_totalprice) AS ceiled,
           abs(o_totalprice - 100000.0) AS abs_diff,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           power(CAST(o_orderkey % 5 AS DOUBLE), 2.0) AS sq,
           sqrt(o_totalprice) AS sqrt_price,
           round(ln(o_totalprice), 6) AS ln_price6,
           sign(o_totalprice - 200000.0) AS sgn,
           greatest(o_totalprice, 150000.0) AS hi, least(o_totalprice, 150000.0) AS lo
    FROM orders""",
    oracle="""
    SELECT o_orderkey AS orderkey,
           round(o_totalprice, 1) AS rounded,
           CAST(floor(o_totalprice) AS BIGINT) AS floored, CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
           abs(o_totalprice - 100000.0) AS abs_diff,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           power(CAST(o_orderkey % 5 AS DOUBLE), 2.0) AS sq,
           sqrt(o_totalprice) AS sqrt_price,
           round(ln(o_totalprice), 6) AS ln_price6,
           CAST(sign(o_totalprice - 200000.0) AS DOUBLE) AS sgn,
           greatest(o_totalprice, 150000.0) AS hi, least(o_totalprice, 150000.0) AS lo
    FROM orders""",
    doc="math battery: round/floor/ceil/abs/mod/power/sqrt/ln/sign/greatest/least (ln rounded — libm may differ by 1 ulp)",
    tags=("functions-math",),
)

# --- conditional / null handling battery ---------------------------------
_sql(
    "battery_conditional",
    spark_sql="""
    SELECT o_orderkey AS orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word,
           coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'DEFAULT') AS prio_or_default,
           CASE WHEN o_totalprice > 300000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium' ELSE 'small' END AS size_bucket,
           (o_orderstatus = 'O' AND o_totalprice > 200000) AS big_open,
           ifnull(NULL, o_orderkey) AS filled
    FROM orders""",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word,
           coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'DEFAULT') AS prio_or_default,
           CASE WHEN o_totalprice > 300000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium' ELSE 'small' END AS size_bucket,
           (o_orderstatus = 'O' AND o_totalprice > 200000) AS big_open,
           ifnull(NULL, o_orderkey) AS filled
    FROM orders""",
    doc="conditional battery: CASE (simple+searched), coalesce/nullif/ifnull, boolean projection",
    tags=("functions-conditional",),
)


# --- iterative graph algorithms ------------------------------------------
def _pagerank_oracle(iterations: int, damping: float) -> str:
    """DuckDB twin of operators/graph.pagerank on the nation trade graph:
    the fixed iteration count is UNROLLED into chained CTEs (standard SQL
    forbids aggregates in recursive terms), each mirroring one Spark
    round — contribution join+sum, dangling-mass anti-join, rank update
    with the identical IEEE expression. Final ranks round to 9 digits in
    both engines, absorbing float group-sum ordering drift (~1e-14 after
    8 rounds vs the 1e-9 rounding grain)."""
    parts = [
        """
    WITH pairs AS MATERIALIZED (
      SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      GROUP BY cn.n_name, sn.n_name
    ),
    outw AS MATERIALIZED (SELECT src, SUM(w) AS out_w FROM pairs GROUP BY src),
    e AS MATERIALIZED (SELECT pairs.src, pairs.dst, pairs.w / outw.out_w AS p
          FROM pairs JOIN outw ON pairs.src = outw.src),
    nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    srcs AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
    r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""
    c{i} AS MATERIALIZED (SELECT e.dst AS node, SUM(e.p * {prev}.rank) AS c
             FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY e.dst),
    d{i} AS MATERIALIZED (SELECT coalesce(SUM({prev}.rank), 0.0) AS dmass
             FROM {prev} LEFT JOIN srcs ON {prev}.node = srcs.node
             WHERE srcs.node IS NULL),
    r{i} AS MATERIALIZED (SELECT nodes.node,
                    (1.0 - {damping}) / nn.n
                    + {damping} * (coalesce(c{i}.c, 0.0) + d{i}.dmass / nn.n) AS rank
             FROM nodes CROSS JOIN nn CROSS JOIN d{i} LEFT JOIN c{i} ON nodes.node = c{i}.node)"""
        )
        prev = f"r{i}"
    return (
        ",".join(parts)
        + f"\n    SELECT node AS nation, round(rank, 9) AS rank_r9 FROM {prev}"
    )


@query(
    "pagerank_nation_trade",
    oracle=_pagerank_oracle(iterations=8, damping=0.85),
    doc=(
        "weighted PageRank (operators/graph.pagerank) over the customer-"
        "nation → supplier-nation trade graph (Q7-shape edge extraction); "
        "iterative rank/edge join loop with localCheckpoint lineage cuts. "
        "Oracle-matched by UNROLLING the 8 fixed iterations into chained "
        "DuckDB CTEs; ranks rounded to 9 digits in both engines"
    ),
    tags=("graph-pagerank", "iterative"),
)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.graph import pagerank

    t = load_tables(spark, sf_dir)
    cn = t["nation"].select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = t["nation"].select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.count("*").alias("n_lines"))
    )
    ranks = pagerank(edges, src="cust_nation", dst="supp_nation", weight="n_lines", iterations=8)
    return ranks.select(F.col("node").alias("nation"), F.round("rank", 9).alias("rank_r9"))


@query(
    "triangle_count_trade_graph",
    oracle="""
    WITH pairs AS (
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, COUNT(*) AS n_lines
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      GROUP BY cn.n_name, sn.n_name
    ),
    e AS (
      SELECT DISTINCT least(cust_nation, supp_nation) AS u,
             greatest(cust_nation, supp_nation) AS v
      FROM pairs
      WHERE n_lines >= 3 AND cust_nation <> supp_nation
    ),
    tri AS (
      SELECT w.a, w.b, w.c
      FROM (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1 JOIN e e2 ON e1.v = e2.u) w
      JOIN e e3 ON e3.u = w.a AND e3.v = w.c
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM tri) t
    GROUP BY node""",
    doc=(
        "per-node triangle counts over the nation trade graph "
        "(operators/graph.triangle_count): canonical u<v<w ordered-edge "
        "joins count each triangle once — O(Σ deg²) wedges, never "
        "all-triples; completes the graph lane (components, PageRank, "
        "triangles)"
    ),
    tags=("graph-triangles",),
)
def triangle_count_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.graph import triangle_count

    t = load_tables(spark, sf_dir)
    cn = t["nation"].select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = t["nation"].select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.count("*").alias("n_lines"))
    )
    edges = pairs.where(
        (F.col("n_lines") >= 3) & (F.col("cust_nation") != F.col("supp_nation"))
    )
    return triangle_count(edges, src="cust_nation", dst="supp_nation")


def _sssp_oracle(rounds: int) -> str:
    """DuckDB twin of operators/graph.sssp on the nation trade graph:
    Bellman–Ford rounds unrolled into chained materialized CTEs —
    pure BIGINT min-plus, so the match is exact with no float caveats."""
    parts = [
        """
    WITH pairs AS MATERIALIZED (
      SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS cost
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY cn.n_name, sn.n_name
    ),
    d0 AS MATERIALIZED (SELECT 'NATION_1' AS node, CAST(0 AS BIGINT) AS dist)"""
    ]
    prev = "d0"
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    d{i} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT pairs.dst AS node, d.dist + pairs.cost AS dist
        FROM pairs JOIN {prev} d ON pairs.src = d.node
      ) u GROUP BY node
    )"""
        )
        prev = f"d{i}"
    return ",".join(parts) + f"\n    SELECT node AS nation, dist FROM {prev}"


@query(
    "sssp_nation_trade",
    oracle=_sssp_oracle(rounds=3),
    doc=(
        "hop-bounded single-source shortest paths (operators/graph.sssp): "
        "cheapest ≤3-hop route from NATION_1 over the nation trade graph "
        "with integer edge costs (lineitem counts, self-loops excluded) — "
        "Bellman–Ford min-plus rounds, one frontier⋈edges join + min-agg "
        "per round. Integer arithmetic end to end → the unrolled-CTE "
        "oracle matches exactly, no float rounding anywhere"
    ),
    tags=("graph-sssp", "iterative"),
)
def sssp_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.graph import sssp

    t = load_tables(spark, sf_dir)
    cn = t["nation"].select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = t["nation"].select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.count("*").cast("bigint").alias("cost"))
    )
    d = sssp(edges, source="NATION_1", rounds=3, src="cust_nation", dst="supp_nation")
    return d.select(F.col("node").alias("nation"), "dist")
