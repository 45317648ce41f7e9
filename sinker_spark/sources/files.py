"""File-based sources: parquet / csv / json, batch and streaming.

Thin, typed wrappers so call sites declare schema expectations once;
streaming variants power the CDC file lane used in tests and the
reference-shaped slot-replay ingestion (cdc.parse_test_decoding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def stream_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.readStream.schema(schema).json(path)


def stream_cdc_text(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """Streaming (lsn, data) text lines — feed to cdc.parse_test_decoding.

    Split is limited to 2 fields so a payload containing the separator
    (a tab inside a doc string) stays intact in ``data``."""
    return (
        spark.readStream.format("text")
        .schema("value string")
        .load(path)
        .select(
            F.split("value", sep, 2).getItem(0).cast("bigint").alias("lsn"),
            F.split("value", sep, 2).getItem(1).alias("data"),
        )
    )
