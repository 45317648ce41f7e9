"""Correlated-subquery TPC-H shapes (Q4/Q13/Q18/Q21/Q22 adapted to the
driver's trimmed star schema — no partsupp/commitdate/receiptdate/phone
columns, so "late" is re-derived from ship-vs-order date and country
code from the customer-name tail) plus bitwise and higher-moment
aggregate batteries.

These exercise the subquery forms Postgres view definitions lean on
(reference README.md:84-85, course_mv.sql's correlated shapes): EXISTS /
NOT EXISTS with multi-table correlation, IN over a grouped HAVING
subquery, and an uncorrelated scalar aggregate subquery in WHERE.
Catalyst decorrelates every one of them into joins/aggregates — no
per-row re-execution (asserted in tests/test_plans.py for the lateral
case; same machinery here).

Scale notes:
- Q4/Q21's EXISTS/NOT EXISTS become left-semi/anti joins shuffling on
  l_orderkey — the natural co-partitioning key shared with the fact
  join, so AQE coalesces into one exchange per side.
- Q18's HAVING subquery is a pre-aggregation of lineitem on the SAME
  key as the main join: at 100 TB both sides shuffle once on orderkey.
- Q22's scalar subquery is a one-row broadcast; NOT EXISTS on orders is
  a shuffle-on-custkey anti join.
- the moment battery is a single map-side-combinable pass: 5 decimal
  sums per group, exact and order-independent, then identical IEEE
  double arithmetic on both engines (same trick as
  battery_stats_moments).
"""

from __future__ import annotations

from sinker_spark.queries.helpers import davg_expr, dsum_expr, msum_expr
from sinker_spark.queries.relational import _sql

# --- Q4: order-priority checking (EXISTS) --------------------------------
_Q4 = """
    SELECT o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority"""
_sql(
    "q4_order_priority",
    spark_sql=_Q4,
    oracle=_Q4,
    doc=(
        "TPC-H Q4 shape: correlated EXISTS (late-shipment orders by "
        "priority); Catalyst rewrites to a left-semi join on l_orderkey"
    ),
    tags=("B5", "join-semi", "subquery-exists"),
)

# --- Q13: customer order-count distribution ------------------------------
_Q13 = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count"""
_sql(
    "q13_customer_distribution",
    spark_sql=_Q13,
    oracle=_Q13,
    doc=(
        "TPC-H Q13 shape: filtered left join + two-level aggregation "
        "(orders-per-customer histogram); second group-by key is tiny so "
        "the re-shuffle is negligible"
    ),
    tags=("B14", "B15", "B18"),
)

# --- Q18: large-volume customers (IN over grouped HAVING) ----------------
_Q18 = f"""
    SELECT c.c_name AS cust_name, o.o_orderkey AS orderkey,
           {msum_expr('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(8,2))) > 300)
    GROUP BY c.c_name, o.o_orderkey
    ORDER BY total_qty DESC, orderkey
    LIMIT 100"""
_sql(
    "q18_large_volume_customers",
    spark_sql=_Q18,
    oracle=_Q18,
    doc=(
        "TPC-H Q18 shape: IN over a grouped-HAVING subquery → left-semi "
        "join; subquery pre-agg shares the orderkey shuffle with the main "
        "join, decimal-exact threshold keeps the qualifying set identical "
        "across engines; top-100 with a unique tiebreak"
    ),
    tags=("B5", "B15", "B20", "subquery-in"),
)

# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) --------
_Q21 = """
    SELECT s.s_name AS supp_name, n.n_name AS nation, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name, n.n_name"""
_sql(
    "q21_waiting_suppliers",
    spark_sql=_Q21,
    oracle=_Q21,
    doc=(
        "TPC-H Q21 shape: sole-late-supplier on multi-supplier finished "
        "orders — correlated EXISTS + NOT EXISTS with a two-table outer "
        "correlation (l1 AND o), decorrelated into semi/anti joins on "
        "l_orderkey; nation dim broadcast"
    ),
    tags=("join-semi", "join-anti", "subquery-exists", "B13"),
)

# --- Q22: idle rich customers (scalar subquery + NOT EXISTS) -------------
_Q22 = f"""
    SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode,
           COUNT(*) AS numcust,
           {dsum_expr('c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT {davg_expr('c_acctbal')}
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY substring(c_name, length(c_name) - 1, 2)"""
_sql(
    "q22_idle_rich_customers",
    spark_sql=_Q22,
    oracle=_Q22,
    doc=(
        "TPC-H Q22 shape: above-average balance (uncorrelated scalar agg "
        "subquery — a one-row broadcast) with no recent orders (anti join "
        "on custkey); avg computed via the exact-decimal path so the "
        "filter boundary is identical across engines"
    ),
    tags=("B5", "join-anti", "subquery-scalar"),
)

# --- bitwise battery ------------------------------------------------------
_sql(
    "battery_bitwise",
    spark_sql="""
    SELECT l_returnflag AS flag,
           bit_and(l_partkey) AS agg_and,
           bit_or(l_partkey)  AS agg_or,
           bit_xor(l_partkey) AS agg_xor,
           min(l_partkey & 255)  AS min_masked,
           max(l_partkey | 4096) AS max_orred,
           min(l_partkey ^ l_suppkey) AS min_xored,
           max(shiftleft(l_partkey % 16, 2)) AS max_shifted
    FROM lineitem GROUP BY l_returnflag""",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(bit_and(l_partkey) AS BIGINT) AS agg_and,
           CAST(bit_or(l_partkey)  AS BIGINT) AS agg_or,
           CAST(bit_xor(l_partkey) AS BIGINT) AS agg_xor,
           CAST(min(l_partkey & 255)  AS BIGINT) AS min_masked,
           CAST(max(l_partkey | 4096) AS BIGINT) AS max_orred,
           CAST(min(xor(l_partkey, l_suppkey)) AS BIGINT) AS min_xored,
           CAST(max((l_partkey % 16) << 2) AS BIGINT) AS max_shifted
    FROM lineitem GROUP BY l_returnflag""",
    doc=(
        "bitwise battery: bit_and/bit_or/bit_xor aggregates plus scalar "
        "&, |, ^ (DuckDB xor()), shiftleft — integer ops, exact on both "
        "engines"
    ),
    tags=("functions-bitwise", "agg-bitwise"),
)

# --- skewness / kurtosis from exact moments ------------------------------
# Raw power sums over integer cents in decimals sized so neither engine
# overflows. Two constraints: DuckDB's multiply width rule is
# width₁+width₂ ≤ 38, AND DuckDB executes the multiply in the PHYSICAL
# type of the inputs — width ≤ 18 means int64, which c²×c² overflows —
# so the squared term is cast to DECIMAL(19,0) to force int128 math.
# Magnitudes: cents ≤ 6e7 (DECIMAL(9,0)); c² ≤ 3.6e15; c³ ≤ 2.2e23;
# c⁴ ≤ 1.3e31; the s4 group sum stays < 1e38 through sf0.1, and decimal
# sums fail loudly, not silently, on overflow. Central moments +
# skew/kurt are then the SAME double expression text on both engines;
# decimal→double of the big sums can differ by 1 ulp, absorbed by
# round(5).
_MOM_INNER = """
      SELECT o_orderstatus AS status,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(c) AS DOUBLE)  AS s1,
             CAST(SUM(c2) AS DOUBLE) AS s2,
             CAST(SUM(CAST(c2 * c AS DECIMAL(28,0))) AS DOUBLE)  AS s3,
             CAST(SUM(CAST(c2 * c2 AS DECIMAL(38,0))) AS DOUBLE) AS s4
      FROM (SELECT o_orderstatus, c, CAST(c * c AS DECIMAL(19,0)) AS c2
            FROM (SELECT o_orderstatus,
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(9,0)) AS c
                  FROM orders) raw) cents
      GROUP BY o_orderstatus"""
_MOM_OUTER = """
    SELECT status, CAST(n AS BIGINT) AS n_orders,
           ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                 / power(s2/n - (s1/n)*(s1/n), 1.5), 5) AS skew_cents,
           ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3, 5)
             AS excess_kurtosis
    FROM moments"""
_sql(
    "skewness_kurtosis_exact",
    spark_sql=f"WITH moments AS ({_MOM_INNER}) {_MOM_OUTER}",
    oracle=f"WITH moments AS ({_MOM_INNER}) {_MOM_OUTER}",
    doc=(
        "population skewness + excess kurtosis from exact decimal power "
        "sums (native skewness/kurtosis differ across engines in both "
        "definition and accumulation order); one map-side-combinable pass"
    ),
    tags=("functions-stats", "stats-battery"),
)
