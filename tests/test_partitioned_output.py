"""Partitioned table output + partition pruning: the lake-layout lever
that makes 100 TB scans affordable. Writes docs partitioned by a
low-cardinality column and asserts the read plan prunes partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark.catalog import load_tables
from tests.conftest import SF_SMALL


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    t = load_tables(spark, SF_SMALL)
    out = str(tmp_path / "orders_by_status")
    (
        t["orders"]
        .select("o_orderkey", "o_totalprice", F.col("o_orderstatus").alias("status"))
        .write.partitionBy("status")
        .mode("overwrite")
        .parquet(out)
    )

    df = spark.read.parquet(out).where(F.col("status") == "O")
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "status" in plan.split("PartitionFilters", 1)[1][:200]
    # only the O partition directory is read
    n_all = spark.read.parquet(out).count()
    n_o = df.count()
    assert 0 < n_o < n_all


def test_snapshot_repartitioned_by_key(spark, tmp_path):
    """SnapshotStore with partitions=N hash-partitions snapshots by key
    at write time (co-partitioned diff joins at read time)."""
    from sinker_spark.ivm import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path), partitions=4)
    df = spark.range(100).select(F.col("id").cast("string").alias("id"),
                                 F.col("id").cast("string").alias("doc"))
    store.write("v", df)
    snap = store.read("v")
    assert snap.rdd.getNumPartitions() == 4
    assert snap.count() == 100
