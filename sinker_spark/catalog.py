"""Table catalog over the driver-generated parquet star schema.

Reference analog: sinker reads from live Postgres tables declared in
tests/fixtures/schema.sql; our batch layer reads parquet (columnar,
splittable, predicate-pushdown-friendly). At 100 TB the same call sites
point at a partitioned data-lake table (or Delta/Iceberg) — nothing else
changes because everything downstream is a DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet stores TIMESTAMP(NANOS, isAdjustedToUTC=false); Spark
# has no nanosecond timestamp type, so the session reads them as raw
# nanosecond longs (spark.sql.legacy.parquet.nanosAsLong) and we convert to
# TIMESTAMP_NTZ here. NTZ matches DuckDB's naive reading of the same files
# bit-for-bit, keeping oracle comparisons timezone-proof.
_TS_NANOS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# Confs the engine depends on that are runtime-settable — applied
# defensively so queries behave identically on a caller-provided session
# (e.g. the grading driver's) that wasn't built by session.get_spark().
_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.crossJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # static conf on some builds — session.py covers those
            pass


# Lazy-DataFrame cache keyed by (Spark application, resolved dir). A
# DataFrame is a PLAN, not data: every action against a cached entry
# still lists/reads the parquet files, so this caches no results — it
# removes the ~1 s of driver-side work (10 × spark.read.parquet schema
# resolution + py4j round-trips) that rebuilding identical scans paid on
# EVERY query construction. Keyed on applicationId so a stopped/restarted
# session never serves plans bound to a dead JVM; all in-repo callers
# load from immutable directories (testdata SFs, a completed gen_sf1
# output), so entries never go stale within an application.
_TABLE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every star-schema table as a DataFrame.

    Scans are lazy; Catalyst prunes columns and pushes filters into the
    parquet reader, so loading "all tables" costs nothing until an action.
    """
    ensure_session_confs(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return dict(hit)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in _TS_NANOS_COLS.get(name, ()):
            if c in df.columns and dict(df.dtypes)[c] == "bigint":
                df = df.withColumn(
                    c, F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long")).cast("timestamp_ntz")
                )
        out[name] = df
    _TABLE_CACHE[key] = out
    return dict(out)


# last (application, dir) whose tables are the live temp views — SQL-text
# queries call register_views on every build, and re-registering the same
# 10 identical views is pure py4j overhead. Registration is session-global
# and always was; callers alternating sf dirs still get a re-register
# because the key changes.
_VIEWS_KEY: list = [None]


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` queries can refer
    to them by name (the same names the DuckDB oracle uses)."""
    dfs = load_tables(spark, sf_dir)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if _VIEWS_KEY[0] == key:
        return dfs
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    _VIEWS_KEY[0] = key
    return dfs
