"""Postgres (JDBC) batch source — the reference's upstream database.

The reference reads Postgres over libpq with server-side cursors
(chunked single-connection streaming, sinker.py:60-72, PGCHUNK_SIZE=2000);
the Spark equivalent is a *partitioned* JDBC scan: N executors each pull
a key range concurrently, so backfill throughput scales with the cluster
instead of one socket.

No Postgres (or JDBC driver jar) exists in this container, so this
module only builds reader configs; tests cover the option math. On a
real deployment: ``spark.jars`` must carry the postgresql driver, and
``partition_column`` should be the PK (or any indexed, roughly-uniform
column) — bounds are fetched with a cheap MIN/MAX pushdown query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 2000  # parity: reference PGCHUNK_SIZE (settings.py:50)


@dataclass
class PostgresSource:
    url: str  # jdbc:postgresql://host:port/db
    user: str | None = None
    password: str | None = None
    fetch_size: int = DEFAULT_FETCH_SIZE
    num_partitions: int = 8

    def reader_options(
        self,
        table: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
    ) -> dict[str, str]:
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": table,
            "fetchsize": str(self.fetch_size),
            "driver": "org.postgresql.Driver",
        }
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError("partitioned read needs lower_bound and upper_bound")
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def read(self, spark: SparkSession, table: str, **partition_kwargs) -> DataFrame:
        return spark.read.format("jdbc").options(**self.reader_options(table, **partition_kwargs)).load()
