"""The rest of the TPC-H shape battery (Q2/Q6/Q8/Q10/Q11/Q12/Q14/Q15/
Q16/Q17/Q19/Q20), adapted to the driver's trimmed star schema — there is
no partsupp table and no commitdate/receiptdate/shipmode columns, so the
partsupp-driven queries are re-derived from lineitem (the supplier×part
relationship it records) and "late shipment" from ship-vs-order date.

These complete the subquery/aggregation surface the reference's full-SQL
view language inherits from Postgres (reference README.md:84-85):
correlated MIN/AVG scalar subqueries with equality/threshold predicates
(Q2/Q17), NOT IN null-aware anti joins (Q16), nested IN chains (Q20), a
CTE referenced twice with a MAX-over-CTE scalar (Q15), HAVING against a
scalar aggregate subquery (Q11), disjunctive multi-column pushdown
predicates (Q19), and conditional-aggregation ratio reports (Q8/Q12/Q14).

Scale notes (100 TB design review):
- Q2/Q17's correlated scalars decorrelate into per-partkey aggregates
  joined back on partkey — the same shuffle key as the main part join,
  so AQE coalesces into one exchange per side; no per-row re-execution.
- Q6/Q14/Q19 are single-pass scans with fully-pushed predicates and
  map-side-combinable integer-unit sums (cheapest exact accumulation).
- Q8 shuffles once on orderkey for the fact-fact join; all four
  dimension joins (customer/nation/region/supplier) broadcast.
- Q11/Q15's scalar subqueries are one-row broadcasts over a reused
  pre-aggregation (Spark plans the CTE once per reference; the agg
  feeding both consumers is a ReusedExchange at best and a cheap
  re-scan at worst).
- Q16's NOT IN becomes a null-aware broadcast anti join (the exclusion
  list is 6 suppliers); COUNT(DISTINCT) expands to a two-stage partial
  aggregate on (brand, type, size, suppkey).
- Determinism: every money sum goes through the exact integer-unit /
  decimal paths of queries/helpers.py; ratio divisions are IEEE doubles
  of exactly-representable integers — bit-identical across engines; the
  one top-k (Q10) carries a unique custkey tiebreak.
"""

from __future__ import annotations

from sinker_spark.queries.helpers import (
    REVENUE_SQL,
    REVENUE_SPARK,
    davg_expr,
    dsum_expr,
    msum_expr,
)
from sinker_spark.queries.relational import _sql

# Exact per-row integer units (10^-4 dollars): price and discount both
# have true scale 2, so the product is exact in a BIGINT (≤ 1e9/row).
_DISC_UNITS = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
)
_REV_UNITS = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"
)

# --- Q2: min-cost supplier (correlated MIN scalar subquery) ---------------
# partsupp's ps_supplycost re-derived as the observed unit price
# (l_extendedprice / l_quantity) — an IEEE division of identical doubles
# on both engines, so the MIN and the equality boundary agree exactly.
_Q2 = """
    SELECT p.p_partkey AS partkey, p.p_brand AS brand, s.s_name AS supp_name,
           n.n_name AS nation, l.l_extendedprice / l.l_quantity AS unit_cost
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO' AND p.p_size < 20
      AND l.l_extendedprice / l.l_quantity = (
          SELECT MIN(l2.l_extendedprice / l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)"""
_sql(
    "q2_min_cost_supplier",
    spark_sql=_Q2,
    oracle=_Q2,
    doc=(
        "TPC-H Q2 shape: cheapest supplier per part via a correlated MIN "
        "scalar subquery with an equality predicate; Catalyst decorrelates "
        "into a per-partkey aggregate joined back on the partkey shuffle"
    ),
    tags=("subquery-scalar", "B5", "B13"),
)

# --- Q6: forecasting revenue change (single-pass filter + agg) ------------
_Q6_TMPL = """
    SELECT CAST((SUM({units}) + 50) {div} 100 AS DOUBLE) / 100.0 AS revenue_delta,
           COUNT(*) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24"""
_sql(
    "q6_forecast_revenue",
    spark_sql=_Q6_TMPL.format(units=_DISC_UNITS, div="DIV"),
    oracle=_Q6_TMPL.format(units=_DISC_UNITS, div="//"),
    doc=(
        "TPC-H Q6 shape: pure filter + global aggregate — every predicate "
        "pushes into the parquet scan, the sum is map-side-combined "
        "integer units (the cheapest exact accumulation Spark has)"
    ),
    tags=("B3", "B19", "agg-global"),
)

# --- Q8: national market share (conditional-aggregation ratio) ------------
# Sums of exact BIGINT units stay ≤ ~1e14 « 2^53, so the final double
# division is of exactly-represented integers — identical across engines.
_Q8 = f"""
    WITH vol AS (
      SELECT year(o.o_orderdate) AS o_year, {_REV_UNITS} AS units,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1999-01-01')
    SELECT CAST(o_year AS INT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN units ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(units) AS DOUBLE), 9) AS mkt_share
    FROM vol GROUP BY o_year"""
_sql(
    "q8_market_share",
    spark_sql=_Q8,
    oracle=_Q8,
    doc=(
        "TPC-H Q8 shape: one nation's share of a region's yearly revenue "
        "— 6-way star join (4 broadcast dims, one orderkey shuffle), "
        "CASE-gated ratio of exact integer-unit sums"
    ),
    tags=("B13", "B15", "agg-conditional"),
)

# --- Q10: returned-item reporting (top-k revenue customers) ---------------
_Q10_TMPL = """
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name, n.n_name AS nation,
           {rev} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20"""
_sql(
    "q10_returned_items",
    spark_sql=_Q10_TMPL.format(rev=REVENUE_SPARK),
    oracle=_Q10_TMPL.format(rev=REVENUE_SQL),
    doc=(
        "TPC-H Q10 shape: top-20 customers by returned-item revenue; "
        "TakeOrderedAndProject top-k (per-partition heap, no full sort) "
        "with a unique custkey tiebreak"
    ),
    tags=("B13", "B15", "B20", "window-rank"),
)

# --- Q11: important parts (HAVING vs scalar aggregate subquery) -----------
# partsupp's inventory value re-derived as shipped value per part from a
# nation's suppliers; the 0.1% threshold is a one-row broadcast computed
# exactly (decimal sum → double, then one IEEE multiply).
_Q11 = f"""
    SELECT l.l_partkey AS partkey, {msum_expr('l.l_extendedprice')} AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY l.l_partkey
    HAVING {msum_expr('l.l_extendedprice')} > (
        SELECT 0.001 * {msum_expr('l2.l_extendedprice')}
        FROM lineitem l2
        JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        WHERE n2.n_name = 'NATION_7')"""
_sql(
    "q11_important_parts",
    spark_sql=_Q11,
    oracle=_Q11,
    doc=(
        "TPC-H Q11 shape: parts holding an outsized share of a nation's "
        "shipped value — grouped HAVING filtered against an uncorrelated "
        "scalar aggregate subquery (a one-row broadcast); exact decimal "
        "sums keep the 0.1% boundary identical across engines"
    ),
    tags=("B15", "subquery-scalar", "having"),
)

# --- Q12: shipping-lag buckets (conditional aggregation) ------------------
_Q12_TMPL = """
    SELECT CASE WHEN {dd} <= 30 THEN 'fast'
                WHEN {dd} <= 60 THEN 'medium'
                ELSE 'slow' END AS ship_bucket,
           {sumcast}SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END){sumcast2} AS high_prio_lines,
           {sumcast}SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END){sumcast2} AS low_prio_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1"""
_sql(
    "q12_shipping_lag_priority",
    spark_sql=_Q12_TMPL.format(
        dd="datediff(l.l_shipdate, o.o_orderdate)", sumcast="", sumcast2=""
    ),
    oracle=_Q12_TMPL.format(
        dd="date_diff('day', o.o_orderdate, l.l_shipdate)",
        sumcast="CAST(",
        sumcast2=" AS BIGINT)",
    ),
    doc=(
        "TPC-H Q12 shape: priority mix by shipping-lag bucket — "
        "conditional aggregation over a derived CASE group key (shipmode "
        "re-derived as ship-vs-order lag on the trimmed schema)"
    ),
    tags=("B15", "agg-conditional", "functions-date"),
)

# --- Q14: promo revenue percentage ----------------------------------------
_Q14_TMPL = """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN {units} ELSE 0 END) AS DOUBLE)
                 / CAST(SUM({units}) AS DOUBLE), 9) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'"""
_sql(
    "q14_promo_revenue",
    spark_sql=_Q14_TMPL.format(units=_REV_UNITS),
    oracle=_Q14_TMPL.format(units=_REV_UNITS),
    doc=(
        "TPC-H Q14 shape: promo share of one month's revenue — "
        "CASE-gated ratio in one pass over a pushed-down month scan; "
        "part join broadcasts"
    ),
    tags=("B13", "agg-conditional"),
)

# --- Q15: top supplier (CTE referenced twice + MAX scalar) ----------------
_Q15_TMPL = """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {rev} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, r.total_revenue
    FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)"""
_sql(
    "q15_top_supplier",
    spark_sql=_Q15_TMPL.format(rev=REVENUE_SPARK),
    oracle=_Q15_TMPL.format(rev=REVENUE_SQL),
    doc=(
        "TPC-H Q15 shape: the view-then-MAX pattern — a revenue CTE "
        "consumed twice (join input + MAX scalar broadcast); revenue is "
        "exact cents so the MAX equality is engine-identical"
    ),
    tags=("B12", "subquery-scalar", "B13"),
)

# --- Q16: supplier diversity (NOT IN + COUNT DISTINCT) --------------------
_Q16_TMPL = """
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           {c}COUNT(DISTINCT l.l_suppkey){c2} AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size"""
_sql(
    "q16_supplier_diversity",
    spark_sql=_Q16_TMPL.format(c="", c2=""),
    oracle=_Q16_TMPL.format(c="CAST(", c2=" AS BIGINT)"),
    doc=(
        "TPC-H Q16 shape: distinct supplier counts per part bucket with a "
        "NOT IN exclusion subquery — a null-aware broadcast anti join; "
        "COUNT(DISTINCT) expands to a two-stage partial aggregate"
    ),
    tags=("B15", "subquery-not-in", "join-anti", "agg-distinct"),
)

# --- Q17: small-quantity-order revenue (correlated AVG threshold) ---------
_Q17 = f"""
    SELECT {dsum_expr('l.l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS small_qty_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * {davg_expr('l2.l_quantity')}
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)"""
_sql(
    "q17_small_qty_revenue",
    spark_sql=_Q17,
    oracle=_Q17,
    doc=(
        "TPC-H Q17 shape: lines below 20% of their part's average "
        "quantity — correlated AVG scalar subquery decorrelated into a "
        "per-partkey aggregate join; the exact-decimal average keeps the "
        "0.2× threshold boundary identical across engines"
    ),
    tags=("subquery-scalar", "B5", "B19"),
)

# --- Q19: discounted revenue (disjunctive pushdown predicates) ------------
_Q19_TMPL = """
    SELECT {rev} AS revenue, COUNT(*) AS matched_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)"""
_sql(
    "q19_disjunctive_revenue",
    spark_sql=_Q19_TMPL.format(rev=REVENUE_SPARK),
    oracle=_Q19_TMPL.format(rev=REVENUE_SQL),
    doc=(
        "TPC-H Q19 shape: three OR'd conjunct groups spanning both join "
        "sides — Catalyst extracts the common single-side conjuncts "
        "(brand/size, quantity envelopes) below the join while the full "
        "disjunction evaluates post-join"
    ),
    tags=("B3", "B13", "predicate-disjunctive"),
)

# --- Q20: potential part promotion (nested IN chain) ----------------------
_Q20 = """
    SELECT s.s_name AS supp_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (
          SELECT l.l_suppkey FROM lineitem l
          WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'red%')
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l.l_suppkey
          HAVING SUM(CAST(l.l_quantity AS DECIMAL(8,2))) > 100)"""
_sql(
    "q20_promotion_suppliers",
    spark_sql=_Q20,
    oracle=_Q20,
    doc=(
        "TPC-H Q20 shape: suppliers who moved volume of red parts — an IN "
        "chain nested two deep (suppkey IN grouped-HAVING over partkey IN "
        "name-filtered parts), each level a left-semi join; the decimal "
        "quantity threshold is engine-exact"
    ),
    tags=("subquery-in", "join-semi", "B15"),
)
