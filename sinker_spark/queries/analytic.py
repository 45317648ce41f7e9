"""Remaining analytic surface: outer/cross join variants, multiset set
ops, pivot/unpivot, hierarchical time rollup (the hypertable
continuous-aggregate pattern), and sketch aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables, register_views
from sinker_spark.queries import query
from sinker_spark.queries.helpers import dsum, dsum_expr, msum_expr


@query(
    "full_outer_join_part_usage",
    oracle="""
    SELECT COALESCE(p.p_partkey, l.l_partkey) AS partkey,
           p.p_name AS name, COUNT(l.l_orderkey) AS n_uses
    FROM part p FULL OUTER JOIN lineitem l ON p.p_partkey = l.l_partkey
    GROUP BY COALESCE(p.p_partkey, l.l_partkey), p.p_name""",
    doc="full outer join: parts never ordered AND order lines referencing unknown parts both survive",
    tags=("join-full",),
)
def full_outer_join_part_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"), "full_outer")
        .groupBy(
            F.coalesce("p_partkey", "l_partkey").alias("partkey"),
            F.col("p_name").alias("name"),
        )
        .agg(F.count("l_orderkey").alias("n_uses"))
    )


@query(
    "right_join_supplier_nations",
    oracle="""
    SELECT n.n_name AS nation, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name""",
    doc="right outer join: every nation kept, zero-supplier nations at 0",
    tags=("join-right",),
)
def right_join_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "cross_join_region_status",
    oracle="""
    SELECT r.r_name AS region, s.o_orderstatus AS status
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s""",
    doc="cross join of two tiny dimensions (the only sane cartesian: both sides bounded)",
    tags=("join-cross",),
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    statuses = t["orders"].select(F.col("o_orderstatus").alias("status")).distinct()
    return t["region"].crossJoin(statuses).select(F.col("r_name").alias("region"), "status")


for _op, _kw in {"union_all": "UNION ALL", "except_all": "EXCEPT ALL", "intersect_all": "INTERSECT ALL"}.items():
    def _mk(kw: str):
        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_views(spark, sf_dir)
            return spark.sql(f"""
                SELECT c_nationkey AS nationkey FROM customer
                {kw}
                SELECT s_nationkey AS nationkey FROM supplier""")
        return fn

    query(
        f"set_{_op}_nationkeys",
        oracle=f"""
        SELECT c_nationkey AS nationkey FROM customer
        {_kw}
        SELECT s_nationkey AS nationkey FROM supplier""",
        doc=f"multiset {_kw}: bag semantics preserved (duplicates counted)",
        tags=("set-ops-all",),
    )(_mk(_kw))


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus""",
    doc="pivot (df.groupBy.pivot with explicit value list → one shuffle, no second pass to discover columns); oracle via FILTER aggregation",
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = (
        t["orders"]
        .groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .count()
    )
    return out.select(
        "status",
        F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
        F.coalesce(F.col("3-MEDIUM"), F.lit(0)).alias("medium"),
        F.coalesce(F.col("5-LOW"), F.lit(0)).alias("low"),
    )


@query(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey AS custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer""",
    doc="unpivot/melt (df.unpivot → wide-to-long); oracle via UNION ALL",
    tags=("unpivot",),
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("custkey", ["acctbal", "nationkey"], "metric", "value")
    )


@query(
    "hypertable_rollup_events",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS bucket_hour,
           strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS bucket_day,
           GROUPING(strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M')) AS g_hour,
           COUNT(*) AS n, {dsum_expr('value')} AS total
    FROM events
    GROUP BY GROUPING SETS (
      (strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M'),
       strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d')),
      (strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d')))""",
    doc="hypertable-style hierarchical rollup: hour + day continuous aggregates in ONE pass via grouping sets (the hour→day hierarchy shares the scan; a materialized variant is the IVM snapshot path)",
    tags=("rollup-time", "hypertable"),
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(f"""
    SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm') AS bucket_hour,
           date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS bucket_day,
           GROUPING(date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm')) AS g_hour,
           COUNT(*) AS n, {dsum_expr('value')} AS total
    FROM events
    GROUP BY GROUPING SETS (
      (date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm'),
       date_format(date_trunc('day', ts), 'yyyy-MM-dd')),
      (date_format(date_trunc('day', ts), 'yyyy-MM-dd')))""")


@query(
    "sketch_count_min_tokens",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS sketch_total_count,
           CAST(7 AS BIGINT) AS sketch_depth,
           CAST(200 AS BIGINT) AS sketch_width,
           CAST(COUNT(*) AS BIGINT) AS exact_tokens,
           TRUE AS total_matches_exact
    FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          FROM documents) t""",
    doc=(
        "Count-Min Sketch over document tokens (Spark's native "
        "count_min_sketch aggregate), hash-checked through the sketch's "
        "own serialized header: bytes 1-4 version, 5-12 totalCount "
        "big-endian long, 13-16 depth, 17-20 width. The parsed "
        "totalCount must equal DuckDB's exact token count and the "
        "depth/width must match the eps=0.01/conf=0.99 contract "
        "(w=ceil(2/eps)=200, d=7) — was rows-only on opaque hex bytes; "
        "per-token estimate bounds live in "
        "tests/test_operators.py::test_native_cms_estimates_within_bounds; "
        "cross-engine probe-able twin: cms_manual_estimates"
    ),
    tags=("sketch",),
)
def sketch_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(F.explode(F.split("text", " ")).alias("token")).where(F.col("token") != "")
    sk = toks.agg(
        F.expr("count_min_sketch(token, CAST(0.01 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").alias("s"),
        F.count("*").cast("bigint").alias("exact_tokens"),
    )
    total = F.expr("CAST(conv(hex(substring(s, 5, 8)), 16, 10) AS BIGINT)")
    return sk.select(
        total.alias("sketch_total_count"),
        F.expr("CAST(conv(hex(substring(s, 13, 4)), 16, 10) AS BIGINT)").alias("sketch_depth"),
        F.expr("CAST(conv(hex(substring(s, 17, 4)), 16, 10) AS BIGINT)").alias("sketch_width"),
        F.col("exact_tokens"),
        (total == F.col("exact_tokens")).alias("total_matches_exact"),
    )


@query(
    "sample_orders_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS INT) % 10 = 0""",
    doc="TABLESAMPLE-style ~10% sampling via deterministic md5-mod filter: reproducible across engines AND across cluster sizes (unlike sample(), whose RNG is partition-layout-dependent) — the property a training-data pipeline needs for resumable/auditable subsampling",
    tags=("sampling",),
)
def sample_orders_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2), 16, 10).cast("int") % 10
    return t["orders"].where(bucket == 0).select("o_orderkey", "o_totalprice")


# --- window value functions (first/last/nth with explicit frames) --------
from sinker_spark.queries.relational import _sql  # noqa: E402

_sql(
    "window_value_functions",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS latest_order_so_far,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS latest_order_so_far,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    doc="window value functions first/last/nth with an explicit running frame (frame pinned so last_value is deterministic, the classic default-frame trap)",
    tags=("window-value",),
)

_sql(
    "string_agg_region_nations",
    spark_sql="""
    SELECT r.r_name AS region,
           listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name""",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name""",
    doc="ordered string aggregation (Spark 4 listagg WITHIN GROUP == PG/DuckDB string_agg ORDER BY): deterministic because the order is pinned inside the aggregate",
    tags=("string-agg",),
)


# --- statistical aggregates from exact moments ---------------------------
from sinker_spark.queries.helpers import msum_expr  # noqa: E402

_STATS_INNER = f"""
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {msum_expr('l_quantity')} AS sx,
             {msum_expr('l_extendedprice')} AS sy,
             {msum_expr('l_quantity * l_quantity')} AS sxx,
             {dsum_expr('l_extendedprice * l_extendedprice')} AS syy,
             {dsum_expr('l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag
"""

_STATS_OUTER = """
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxx - sx * sx) / (n * (n - 1.0)), 6) AS var_qty,
           ROUND(SQRT((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS stddev_qty,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_qty_price
    FROM moments
"""

_sql(
    "battery_stats_moments",
    spark_sql=f"WITH moments AS ({_STATS_INNER}) {_STATS_OUTER}",
    oracle=f"WITH moments AS ({_STATS_INNER}) {_STATS_OUTER}",
    doc="variance/stddev/correlation computed from exact decimal moments then identical IEEE double arithmetic — deterministic cross-engine where native stddev/corr (per-engine accumulation order) is not; single agg pass, map-side combinable",
    tags=("functions-stats", "stats-battery"),
)


_sql(
    "w4_percent_rank_cume_dist",
    spark_sql="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""",
    doc="relative-position windows percent_rank/cume_dist (rounded: rank ratios are small-denominator rationals, identical across engines after fixed rounding)",
    tags=("window-rank", "window-relative"),
)

_sql(
    "battery_bool_aggregates",
    spark_sql="""
    SELECT o_orderstatus AS status,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count_if(o_totalprice > 200000) AS n_over_200k,
           max_by(o_orderkey, (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey)) AS priciest_order,
           min_by(o_orderkey, (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey)) AS cheapest_order
    FROM orders GROUP BY o_orderstatus""",
    oracle="""
    SELECT o_orderstatus AS status,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count_if(o_totalprice > 200000) AS n_over_200k,
           max_by(o_orderkey, (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey)) AS priciest_order,
           min_by(o_orderkey, (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey)) AS cheapest_order
    FROM orders GROUP BY o_orderstatus""",
    doc="boolean/conditional aggregate battery: bool_and/bool_or/count_if/max_by/min_by; arg-max ordering key packs (cents, orderkey) into one bigint so price ties break deterministically in both engines",
    tags=("agg-bool", "functions-agg"),
)


# --- ordered-set aggregates: median + deterministic mode -----------------
# Native mode() breaks frequency ties arbitrarily in BOTH engines, so the
# gate computes mode as rank-over-counts + MIN among the tied — identical
# deterministic SQL on both sides. median is an exact order statistic
# (both engines interpolate the even-count midpoint in IEEE double).
_MEDIAN_MODE = """
    WITH pc AS (
      SELECT o_orderstatus AS status, o_orderpriority AS prio, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderstatus, o_orderpriority),
    best AS (
      SELECT status, MIN(prio) AS mode_prio
      FROM (SELECT status, prio,
                   RANK() OVER (PARTITION BY status ORDER BY cnt DESC) AS r
            FROM pc) rk
      WHERE r = 1 GROUP BY status),
    med AS (
      SELECT o_orderstatus AS status,
             ROUND(median(o_totalprice), 4) AS med_price,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderstatus)
    SELECT med.status AS status, med.med_price, med.n_orders, best.mode_prio
    FROM med JOIN best ON med.status = best.status"""
_sql(
    "ordered_set_median_mode",
    spark_sql=_MEDIAN_MODE,
    oracle=_MEDIAN_MODE,
    doc=(
        "ordered-set aggregates: exact median (order statistic, "
        "engine-identical) + mode with a deterministic min-value tie-break "
        "(native mode() ties are arbitrary in both engines)"
    ),
    tags=("agg-ordered-set", "functions-stats"),
)

# --- width_bucket histogram ----------------------------------------------
# DuckDB has no width_bucket; the oracle is the defining arithmetic. The
# bucket width 512000/64 = 8000 is exact in binary, so the division and
# floor agree bit-for-bit with Spark's internal (x-lo)/step computation.
_sql(
    "width_bucket_histogram",
    spark_sql=f"""
    SELECT width_bucket(o_totalprice, 0.0, 512000.0, 64) AS bucket,
           COUNT(*) AS n,
           {msum_expr('o_totalprice')} AS sum_price
    FROM orders GROUP BY width_bucket(o_totalprice, 0.0, 512000.0, 64)""",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 512000.0 THEN 65
                ELSE CAST(FLOOR(o_totalprice / 8000.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n,
           {msum_expr('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CASE WHEN o_totalprice < 0.0 THEN 0
                  WHEN o_totalprice >= 512000.0 THEN 65
                  ELSE CAST(FLOOR(o_totalprice / 8000.0) AS BIGINT) + 1 END""",
    doc=(
        "width_bucket equi-width histogram (the one-pass building block "
        "for distribution profiling at scale); oracle is the defining "
        "floor arithmetic with an exact-in-binary bucket width"
    ),
    tags=("functions-math", "histogram"),
)

# --- try_* error-safe functions ------------------------------------------
_sql(
    "battery_try_functions",
    spark_sql="""
    SELECT o_orderkey AS orderkey,
           try_divide(o_totalprice, CAST(o_orderkey % 3 AS DOUBLE)) AS div_maybe,
           try_cast(o_orderpriority AS INT) AS prio_int,
           try_cast(substring(o_orderpriority, 1, 1) AS INT) AS prio_digit
    FROM orders""",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS div_maybe,
           try_cast(o_orderpriority AS INT) AS prio_int,
           try_cast(substring(o_orderpriority, 1, 1) AS INT) AS prio_digit
    FROM orders""",
    doc=(
        "error-safe function battery: try_divide (NULL on zero divisor — "
        "oracle via nullif) and try_cast (NULL on malformed input, same "
        "name both engines) — the ANSI-mode-safe projection surface"
    ),
    tags=("functions-try", "functions-conditional"),
)


@query(
    "cms_manual_estimates",
    oracle="""
    WITH tok AS (
      SELECT t.token, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
            FROM documents) t
      GROUP BY t.token
    ),
    expanded AS (
      SELECT token, true_cnt, r.r AS row_id,
             CAST('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || token), 1, 4) AS INT) % 64 AS bucket
      FROM tok, (SELECT unnest(range(0, 4)) AS r) r
    ),
    sketch AS (
      SELECT row_id, bucket, SUM(true_cnt) AS cnt
      FROM expanded GROUP BY row_id, bucket
    )
    SELECT e.token, MAX(e.true_cnt) AS true_cnt, CAST(MIN(s.cnt) AS BIGINT) AS est
    FROM expanded e JOIN sketch s ON s.row_id = e.row_id AND s.bucket = e.bucket
    GROUP BY e.token""",
    doc=(
        "hand-rolled Count-Min Sketch with explicit md5 hash rows (depth 4 x "
        "width 64), cross-engine verified: build the sketch from token "
        "counts, then probe every token (estimate = min over rows of its "
        "bucket count; guaranteed >= true count). Unlike count_min_sketch's "
        "opaque bytes this construction is engine-portable, and the sketch "
        "is a 256-row mergeable relation: at 100 TB per-partition partial "
        "sketches OR-merge in one map-side-combined aggregation and the "
        "probe joins against a broadcast of those 256 rows"
    ),
    tags=("sketch", "approx", "heavy-hitters"),
)
def cms_manual_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tok = (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("true_cnt"))
    )
    expanded = tok.select(
        "token",
        "true_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("row_id"),
    ).select(
        "token",
        "true_cnt",
        "row_id",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.col("row_id").cast("string"), "token")), 1, 4),
                16,
                10,
            ).cast("int")
            % 64
        ).alias("bucket"),
    )
    sketch = expanded.groupBy("row_id", "bucket").agg(F.sum("true_cnt").alias("cnt"))
    return (
        expanded.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("token")
        .agg(F.max("true_cnt").alias("true_cnt"), F.min("cnt").alias("est"))
    )


@query(
    "ols_trend_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS prio,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
      FROM orders GROUP BY o_orderpriority, o_orderdate
    ),
    m AS (
      SELECT prio,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS BIGINT) AS sxx,
             CAST(ROUND(SUM(y), 2) AS DOUBLE) AS sy,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(18,2)) * y), 2) AS DOUBLE) AS sxy
      FROM daily GROUP BY prio
    )
    SELECT prio, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
    FROM m""",
    doc=(
        "per-priority OLS trend of daily revenue (the regr_slope/"
        "regr_intercept surface, computed from decimal-exact moments "
        "instead of the built-ins so the float result is order-independent "
        "and engine-identical): slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) "
        "with Sy/Sxy accumulated as DECIMAL and x integer — two map-side-"
        "combined aggregations, deterministic at any parallelism"
    ),
    tags=("functions-stats", "regression", "trend"),
)
def ols_trend_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
    WITH daily AS (
      SELECT o_orderpriority AS prio,
             datediff(o_orderdate, DATE '1992-01-01') AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
      FROM orders GROUP BY o_orderpriority, o_orderdate
    ),
    m AS (
      SELECT prio,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS BIGINT) AS sxx,
             CAST(ROUND(SUM(y), 2) AS DOUBLE) AS sy,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(18,2)) * y), 2) AS DOUBLE) AS sxy
      FROM daily GROUP BY prio
    )
    SELECT prio, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
    FROM m""")


@query(
    "basket_pair_mining",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS orderkey, l_partkey % 50 AS item
      FROM lineitem
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.orderkey = b.orderkey AND a.item < b.item
      GROUP BY a.item, b.item
    ),
    freq AS (SELECT item, COUNT(*) AS n FROM items GROUP BY item),
    n_orders AS (SELECT COUNT(DISTINCT orderkey) AS total FROM items)
    SELECT p.item_a, p.item_b, CAST(p.support AS BIGINT) AS support,
           round(CAST(p.support AS DOUBLE) / CAST(fa.n AS DOUBLE), 6) AS conf_a_to_b,
           round(CAST(p.support AS DOUBLE) * CAST(t.total AS DOUBLE)
                 / (CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)), 6) AS lift
    FROM pairs p
    JOIN freq fa ON fa.item = p.item_a
    JOIN freq fb ON fb.item = p.item_b
    CROSS JOIN n_orders t
    WHERE p.support >= 3""",
    doc=(
        "market-basket pair mining over order lines (items coarsened to "
        "50 part classes so baskets co-occur): pairwise support via a "
        "basket self-join — O(Σ basket²) bounded by basket size, never "
        "corpus² — plus confidence and lift from broadcast item "
        "frequencies; the pairwise core of association-rule mining"
    ),
    tags=("basket", "association-rules", "join-self"),
)
def basket_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    items = (
        t["lineitem"]
        .select(F.col("l_orderkey").alias("orderkey"), (F.col("l_partkey") % 50).alias("item"))
        .distinct()
    )
    pairs = (
        items.alias("a")
        .join(
            items.alias("b"),
            (F.col("a.orderkey") == F.col("b.orderkey")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").alias("support"))
    )
    freq = items.groupBy("item").agg(F.count("*").alias("n"))
    total = items.select(F.count_distinct("orderkey").alias("total"))
    return (
        pairs.join(F.broadcast(freq).withColumnRenamed("item", "item_a").withColumnRenamed("n", "n_a"), "item_a")
        .join(F.broadcast(freq).withColumnRenamed("item", "item_b").withColumnRenamed("n", "n_b"), "item_b")
        .join(F.broadcast(total))
        .where(F.col("support") >= 3)
        .select(
            "item_a",
            "item_b",
            F.col("support").cast("bigint").alias("support"),
            F.round(F.col("support").cast("double") / F.col("n_a").cast("double"), 6).alias("conf_a_to_b"),
            F.round(
                F.col("support").cast("double") * F.col("total").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             CAST(MAX(CAST(o_orderdate AS DATE)) - DATE '1990-01-01' AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary_cents,
             ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
      FROM rfm
    )
    SELECT o_custkey AS custkey, recency_days, frequency, monetary_cents,
           CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_code
    FROM scored""",
    doc=(
        "RFM customer segmentation — the classic CRM workhorse: "
        "recency (last order date), frequency (order count), monetary "
        "(lifetime cents) each quintiled by ntile with custkey "
        "tiebreaks (deterministic at any parallelism), packed into the "
        "3-digit RFM code (555 = best). Entity-bounded rank windows; "
        "every measured value integral. Downstream of this code sit "
        "campaign targeting and churn-risk tiers"
    ),
    tags=("analytics", "segmentation", "window", "cohort"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    rfm = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max(F.col("o_orderdate").cast("date")), F.lit("1990-01-01").cast("date"))
            .cast("bigint")
            .alias("recency_days"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum((F.col("o_totalprice").cast("DECIMAL(18,2)") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    r_w = Window.orderBy("recency_days", "o_custkey")
    f_w = Window.orderBy("frequency", "o_custkey")
    m_w = Window.orderBy("monetary_cents", "o_custkey")
    scored = rfm.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(r_w).cast("int").alias("r_score"),
        F.ntile(5).over(f_w).cast("int").alias("f_score"),
        F.ntile(5).over(m_w).cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_code",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast("int"),
    )
