"""Kafka CDC source (Debezium topics) — the production change feed.

The reference tails a Postgres logical replication slot destructively
(runner.py:56-64, at-most-once on the tail); the production-grade Spark
equivalent subscribes to Debezium's per-table Kafka topics with
checkpointed offsets (replayable, at-least-once → exactly-once with the
engine's idempotent sinks).

No Kafka broker (or spark-sql-kafka jar) exists in this container, so
this module builds reader configs + the parse pipeline; the Debezium
envelope parser itself is fully tested against literal JSON in
tests/test_cdc_and_ivm.py. Deployment needs
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaCdcSource:
    bootstrap_servers: str
    topic_pattern: str = "pg\\.public\\..*"  # Debezium: <server>.<schema>.<table>
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = 100_000  # batch-size backpressure

    def reader_options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribePattern": self.topic_pattern,
            "startingOffsets": self.starting_offsets,
            # exactly-once story needs offsets in OUR checkpoint, not
            # Kafka's consumer-group commit
            "kafka.group.id.prefix": "sinker-spark",
            "failOnDataLoss": "false",
        }
        if self.max_offsets_per_trigger:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        return opts

    def stream(self, spark: SparkSession) -> DataFrame:
        """readStream → canonical CDC columns via the Debezium parser."""
        from sinker_spark.cdc import parse_debezium_json

        raw = (
            spark.readStream.format("kafka")
            .options(**self.reader_options())
            .load()
            .select(F.col("value").cast("string").alias("value"))
        )
        return parse_debezium_json(raw)
