"""Flagship query — the reference's course_mv pattern on the star schema.

Reference: tests/fixtures/course_mv.sql:1-26 builds one nested JSON doc per
``course`` row: scalars + a to-one chain (course→teacher→person, correlated
scalar subqueries) + a to-many array (enrollments, correlated ``json_agg``).
Here ``orders`` plays course, ``customer→nation→region`` plays the to-one
chain, ``lineitem`` plays enrollments (SURVEY.md §7 M0, FIXTURES.md §2).

Spark-first shape: instead of correlated subqueries (which Catalyst would
decorrelate into joins anyway), we *declare* the joins:

- dims (``nation``, ``region``) are broadcast — no shuffle;
- ``lineitem`` is pre-aggregated to one array row per order **before** the
  join (map-side combine shrinks the shuffle to one row per order);
- the orders⋈customer and orders⋈items joins shuffle on the same key
  domain, which AQE coalesces; at 100 TB these become two sort-merge
  joins on ``o_orderkey``/``o_custkey`` — the plan has no correlated
  per-row lookups anywhere.

Array order is pinned (``sort_array`` by linenumber) because
``collect_list`` after a shuffle is nondeterministic — the reference's own
tests expose this gotcha (PG scan order, SURVEY.md §5). ``json_agg`` of
zero rows is NULL in Postgres; we keep that semantic (left join → null
array) and serialize with explicit nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables
from sinker_spark.queries import query


def order_document_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, doc struct) — typed form, used by the IVM/materialization layer."""
    t = load_tables(spark, sf_dir)

    items = (
        t["lineitem"]
        .select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("linenumber"),
                F.col("l_partkey").alias("partkey"),
                F.col("l_quantity").alias("quantity"),
                F.col("l_extendedprice").alias("extendedprice"),
                F.col("l_returnflag").alias("returnflag"),
            ).alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("item")).alias("lineitems"))
    )

    cust = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.struct(
                F.col("c_name").alias("name"),
                F.col("c_acctbal").alias("acctbal"),
                F.struct(
                    F.col("n_name").alias("name"),
                    F.struct(F.col("r_name").alias("name")).alias("region"),
                ).alias("nation"),
            ).alias("customer"),
        )
    )

    return (
        t["orders"]
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(items, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("totalprice"),
                F.col("o_orderpriority").alias("priority"),
                F.col("customer"),
                F.col("lineitems"),
            ).alias("doc"),
        )
    )


_ORACLE = """
WITH items AS (
  SELECT l_orderkey,
         list(struct_pack(linenumber := l_linenumber, partkey := l_partkey,
                          quantity := l_quantity, extendedprice := l_extendedprice,
                          returnflag := l_returnflag)
              ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice, l_returnflag) AS lineitems
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey AS id,
       CAST(to_json(struct_pack(
         orderkey := o.o_orderkey,
         orderdate := strftime(o.o_orderdate, '%Y-%m-%d'),
         status := o.o_orderstatus,
         totalprice := o.o_totalprice,
         priority := o.o_orderpriority,
         customer := struct_pack(
            name := c.c_name, acctbal := c.c_acctbal,
            nation := struct_pack(name := n.n_name,
                                  region := struct_pack(name := r.r_name))),
         lineitems := i.lineitems
       )) AS VARCHAR) AS doc
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
"""


@query(
    "flagship_order_document",
    oracle=_ORACLE,
    doc="course_mv pattern (course_mv.sql:1-26): nested to-one chain + ordered to-many array, JSON doc per order",
    tags=("B1", "B2", "B4", "B5", "B6", "B7", "B13", "B14", "A3"),
)
def flagship_order_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = order_document_df(spark, sf_dir)
    return df.select(
        "id",
        F.to_json("doc", {"ignoreNullFields": "false"}).alias("doc"),
    )
