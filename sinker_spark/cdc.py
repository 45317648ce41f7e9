"""CDC record model + parsers.

The engine's change feed is a DataFrame (batch or streaming) with the
canonical columns::

    lsn BIGINT        -- total order within a key (WAL position analog)
    schema STRING     -- source schema
    table STRING      -- source table
    op STRING         -- INSERT | UPDATE | DELETE
    id STRING         -- row id (the reference constrains ids to [\\w-]+ text,
                         bulk_action_generator.py:15-19)
    payload STRING    -- optional JSON document (MV rows carry the doc)

Two parsers produce that shape:

- :func:`parse_test_decoding` — the reference's wire format: Postgres
  ``test_decoding`` text lines like
  ``table public.person: INSERT: id[text]:'p-1' name[text]:'John'``
  (semantics of SLOT_RE, bulk_action_generator.py:15-19, re-expressed as
  JVM ``regexp_extract`` column expressions — no Python row loop).
  Divergence, by design: the reference strips ALL apostrophes from the
  doc payload (``.replace("'", "")``, bulk_action_generator.py:45),
  corrupting documents containing one; we unescape `''` → `'` correctly.
- :func:`parse_debezium_json` — Debezium-shaped JSON envelopes, the
  production-grade source (Kafka topic per table).

Both are pure column expressions, so they run identically over a batch
DataFrame or a Structured Streaming source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDC_SCHEMA = "lsn BIGINT, schema STRING, table STRING, op STRING, id STRING, payload STRING"

# test_decoding line head: table <schema>.<table>: <OP>: id[text]:'<id>'
_HEAD = r"table\s+\"?([\w-]+)\"?\.\"?([\w-]+)\"?:\s+([A-Z]+):\s+id\[text\]:'([\w-]+)'"


def parse_test_decoding(df: DataFrame, data_col: str = "data", lsn_col: str = "lsn") -> DataFrame:
    """(lsn, data) text lines → canonical CDC columns (unmatched lines drop,
    mirroring the reference's silent skip of non-matching slot entries)."""
    data = F.col(data_col)
    doc = F.when(
        data.contains("doc[json]:"),
        # payload is everything after doc[json]: with the outer quotes
        # removed and '' unescaped (NOT the reference's strip-all-quotes)
        F.regexp_replace(
            F.regexp_extract(data, r"doc\[json\]:'((?:[^']|'')*)'", 1), "''", "'"
        ),
    ).otherwise(F.lit(None).cast("string"))
    out = df.select(
        F.col(lsn_col).cast("bigint").alias("lsn"),
        F.regexp_extract(data, _HEAD, 1).alias("schema"),
        F.regexp_extract(data, _HEAD, 2).alias("table"),
        F.regexp_extract(data, _HEAD, 3).alias("op"),
        F.regexp_extract(data, _HEAD, 4).alias("id"),
        doc.alias("payload"),
    )
    return out.where(F.col("table") != "")


def parse_debezium_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Debezium envelope JSON → canonical CDC columns.

    op mapping: c/r → INSERT (r = snapshot read), u → UPDATE, d → DELETE.
    The doc id comes from the key struct's ``id``; payload is the JSON of
    ``after`` (null for deletes). ``payload_before`` carries the JSON of
    ``before`` when the source publishes it (Postgres: REPLICA IDENTITY
    FULL) — the delta-aggregate lane (ivm_delta) needs it to fold deletes
    and updates; the document lanes ignore it."""
    env = F.from_json(
        F.col(value_col),
        "struct<payload:struct<op:string, ts_ms:bigint, lsn:bigint,"
        " source:struct<schema:string, table:string>,"
        " before:map<string,string>, after:map<string,string>>>",
    )["payload"]
    return df.select(
        env["lsn"].alias("lsn"),
        env["source"]["schema"].alias("schema"),
        env["source"]["table"].alias("table"),
        F.when(env["op"].isin("c", "r"), "INSERT")
        .when(env["op"] == "u", "UPDATE")
        .when(env["op"] == "d", "DELETE")
        .otherwise(F.upper(env["op"]))
        .alias("op"),
        F.coalesce(env["after"]["id"], env["before"]["id"]).alias("id"),
        F.when(env["after"].isNotNull(), F.to_json(env["after"])).alias("payload"),
        F.when(env["before"].isNotNull(), F.to_json(env["before"])).alias("payload_before"),
    )


def latest_per_key(cdc: DataFrame) -> DataFrame:
    """Last-write-wins compaction within a batch: keep the max-lsn record
    per (table, id) — the reference relies on in-order slot processing for
    this (bulk_action_generator.py:37-38); we make it explicit so a batch
    is order-insensitive."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("table", "id").orderBy(F.desc("lsn"))
    return cdc.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
