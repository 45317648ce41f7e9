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


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every star-schema table as a DataFrame.

    Scans are lazy; Catalyst prunes columns and pushes filters into the
    parquet reader, so loading "all tables" costs nothing until an action.
    """
    ensure_session_confs(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in _TS_NANOS_COLS.get(name, ()):
            if c in df.columns and dict(df.dtypes)[c] == "bigint":
                df = df.withColumn(
                    c, F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long")).cast("timestamp_ntz")
                )
        out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` queries can refer
    to them by name (the same names the DuckDB oracle uses)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
