"""Statistical-QA and lake-layout lanes: seasonal anomaly detection,
chi-square contingency analysis, robust (median/MAD) outlier flagging,
and Z-order interleaved layout keys.

Determinism notes shared by all lanes: means/variances come from exact
decimal moments with one final IEEE division/sqrt (battery_stats_moments
pattern); medians are exact order statistics (both engines interpolate
the even-count midpoint identically in double); outlier predicates
compare ROUNDED scores so a boundary can never flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables, register_views
from sinker_spark.queries import query
from sinker_spark.queries.helpers import dsum_expr


def _sql(name: str, spark_sql: str, oracle: str, doc: str = "", tags: tuple[str, ...] = ()):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = doc
    query(name, oracle=oracle, doc=doc, tags=tags)(fn)
    return fn


# --- seasonal residual outliers ------------------------------------------
# Hour-of-day seasonal profile over the hourly event-value series;
# residual z-scores against the per-hod mean/stddev flag load anomalies.
# The profile is 24 rows at ANY scale — the second aggregation is free;
# the first is the same shuffle the tumbling-window lane pays.

_SEASONAL_INNER = f"""
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, {{hod}} AS hod,
             {dsum_expr('value')} AS v
      FROM events GROUP BY date_trunc('hour', ts), {{hod}}),
    prof AS (
      SELECT hod, CAST(COUNT(*) AS DOUBLE) AS n,
             {dsum_expr('v')} AS sx,
             {dsum_expr('v * v')} AS sxx
      FROM hourly GROUP BY hod)
"""

_SEASONAL_OUTER = """
    SELECT {hstr} AS hour_start, hourly.hod, v AS actual,
           ROUND(sx / n, 6) AS expected,
           ROUND((v - sx / n) / SQRT((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS z,
           ABS(ROUND((v - sx / n) / SQRT((n * sxx - sx * sx) / (n * (n - 1.0))), 6)) > 2.0
             AS is_outlier
    FROM hourly JOIN prof ON hourly.hod = prof.hod
"""

_sql(
    "seasonal_residual_outliers",
    spark_sql="WITH "
    + _SEASONAL_INNER.format(hod="hour(ts)")
    + _SEASONAL_OUTER.format(hstr="date_format(h, 'yyyy-MM-dd HH:mm')"),
    oracle="WITH "
    + _SEASONAL_INNER.format(hod="hour(ts)")
    + _SEASONAL_OUTER.format(hstr="strftime(h, '%Y-%m-%d %H:%M')"),
    doc=(
        "seasonal anomaly detection on the event stream: hourly value "
        "series → 24-row hour-of-day profile (exact decimal moments) → "
        "residual z-score per hour, |z| > 2 flagged. Two "
        "map-side-combinable aggregations; the profile join broadcasts 24 "
        "rows — at 100 TB this costs exactly one shuffle (the hourly "
        "rollup), the same one the tumbling-window lane already pays"
    ),
    tags=("timeseries-anomaly", "stats", "window-tumbling"),
)


# --- chi-square contingency (source × lang independence) -----------------

_CHI2 = """
    WITH o AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS observed
      FROM documents GROUP BY source, lang),
    rt AS (SELECT source, SUM(observed) AS r FROM o GROUP BY source),
    ct AS (SELECT lang, SUM(observed) AS c FROM o GROUP BY lang),
    tot AS (SELECT SUM(observed) AS n FROM o)
    SELECT o.source, o.lang, observed,
           ROUND(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS expected,
           ROUND((CAST(observed AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(observed AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS chi2_contrib
    FROM o JOIN rt ON o.source = rt.source
           JOIN ct ON o.lang = ct.lang
           CROSS JOIN tot
"""

_sql(
    "chi_square_source_lang",
    spark_sql=_CHI2,
    oracle=_CHI2,
    doc=(
        "χ² test of independence for the source × lang contingency table — "
        "the dataset-QA check that a crawl source's language mix hasn't "
        "drifted from the corpus. Per-cell observed/expected/contribution; "
        "marginals are group-count aggregates (cells ≤ |sources|·|langs| "
        "rows at any corpus size), the corpus total a one-row broadcast; "
        "arithmetic is integer counts until three IEEE ops + fixed rounding"
    ),
    tags=("stats", "contingency", "quality"),
)


# --- robust outliers: median/MAD modified z-score ------------------------

_MAD = """
    WITH med AS (
      SELECT o_orderstatus AS status, median(o_totalprice) AS med
      FROM orders GROUP BY o_orderstatus),
    dev AS (
      SELECT status, o_orderkey, o_totalprice, ABS(o_totalprice - med) AS adev, med
      FROM orders JOIN med ON orders.o_orderstatus = med.status),
    mad AS (SELECT status, median(adev) AS mad FROM dev GROUP BY status)
    SELECT dev.status, o_orderkey, o_totalprice,
           ROUND(0.6745 * (o_totalprice - med) / mad, 6) AS robust_z
    FROM dev JOIN mad ON dev.status = mad.status
    WHERE ABS(ROUND(0.6745 * (o_totalprice - med) / mad, 6)) > 2.5
"""

_sql(
    "robust_mad_outliers",
    spark_sql=_MAD,
    oracle=_MAD,
    doc=(
        "robust outlier flagging via the modified z-score (Iglewicz-"
        "Hoaglin): per-status median + MAD — resistant to the very "
        "outliers a mean/stddev filter would absorb. Medians are exact "
        "order statistics (engine-identical interpolation); the flag "
        "compares the ROUNDED score so boundaries can't flip. Two "
        "status-keyed aggregations + two tiny broadcast joins; at 100 TB "
        "swap exact median for approx_percentile(0.5) (documented trade)"
    ),
    tags=("stats", "outliers", "quality"),
)


# --- Z-order interleaved layout key --------------------------------------


@query(
    "zorder_layout_key",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS x,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 65536 AS y
      FROM orders)
    SELECT o_orderkey,
           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           """
    + " + ".join(
        f"(((x >> {i}) & 1)::BIGINT << {2 * i}) + (((y >> {i}) & 1)::BIGINT << {2 * i + 1})"
        for i in range(16)
    )
    + """ AS zval
    FROM base""",
    doc=(
        "Z-order (Morton) interleaved layout key over (custkey, orderdate) "
        "— the Delta/Iceberg OPTIMIZE ZORDER primitive: sorting files by "
        "zval co-locates rows close in BOTH dimensions, so 2-D range "
        "predicates prune to O(√files) instead of all files. Pure per-row "
        "integer bit-interleave (32 shift/mask terms, codegen'd), zero "
        "shuffle; the actual re-layout is `df.repartitionByRange(zval)` + "
        "sortWithinPartitions on write"
    ),
    tags=("layout", "zorder", "lakehouse"),
)
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    x = F.pmod(F.col("o_custkey"), F.lit(65536))
    y = F.pmod(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")),
        F.lit(65536),
    )
    base = t["orders"].select("o_orderkey", x.alias("x"), y.alias("y"))
    z = None
    for i in range(16):
        tx = F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i)
        ty = F.shiftleft(
            F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i + 1
        )
        term = tx + ty
        z = term if z is None else z + term
    return base.select(
        "o_orderkey",
        F.col("x").cast("bigint").alias("x"),
        F.col("y").cast("bigint").alias("y"),
        z.alias("zval"),
    )
