"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads) but
every knob here is chosen for the 1000-executor / 100 TB deployment and
merely *also* behaves well locally:

- AQE on: runtime join-strategy switches, skew-join splitting, and
  partition coalescing are the main defense against skew at scale.
- ``spark.sql.shuffle.partitions`` defaults to 2×cores locally; on a real
  cluster this is overridden (or left to AQE's coalescing) — we set
  ``adaptive.coalescePartitions`` so the local number is a ceiling, not a
  fixed cost.
- Arrow execution on: every pandas_udf / toPandas crossing is
  Arrow-batched (reference moves rows one at a time over libpq —
  bulk_action_generator.py:37; we never move rows row-at-a-time).
- Session timezone pinned to UTC so timestamp semantics are
  deployment-independent and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(app_name: str = "sinker-spark") -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_parts = str(max(2 * cpus, 32))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
        # driver testdata parquet uses TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long and convert in catalog.load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1.2 wrong-results guard: FoldablePropagation mis-
        # propagates per-branch literal grouping columns through nested
        # Union+Aggregate plans — a groupBy over a union whose branches
        # tag rows with literal flags (e.g. the left-join lane's
        # __matched true/false) can emit DUPLICATE key rows that never
        # merge. Repro pinned in tests/test_ivm_delta.py::
        # test_loj_lazy_composition_groups_correctly; the rule is a
        # minor constant-attribute rewrite, safe to forgo.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.FoldablePropagation",
        )
    )
    if SparkSession.getActiveSession() is None:
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    return builder.getOrCreate()
