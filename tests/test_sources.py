"""File-source round-trips: csv/json batch readers honor declared
schemas (no inference surprises), the streaming json source drains with
availableNow, and malformed rows surface as nulls not crashes."""

from __future__ import annotations

import json

from sinker_spark.sources.files import read_csv, read_json, stream_json


def test_read_csv_declared_schema(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,name,amount\n1,ann,2.5\n2,bob,4.0\n")
    df = read_csv(spark, str(p), "id bigint, name string, amount double")
    assert df.dtypes == [("id", "bigint"), ("name", "string"), ("amount", "double")]
    assert sorted((r.id, r.name, r.amount) for r in df.collect()) == [(1, "ann", 2.5), (2, "bob", 4.0)]


def test_read_csv_malformed_cell_nulls_not_crash(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,amount\n1,2.5\n2,notanumber\n")
    rows = {r.id: r.amount for r in read_csv(spark, str(p), "id bigint, amount double").collect()}
    assert rows[1] == 2.5 and rows[2] is None


def test_read_json_declared_schema(spark, tmp_path):
    p = tmp_path / "j.json"
    p.write_text("\n".join(json.dumps(d) for d in [{"id": 1, "tags": ["a", "b"]}, {"id": 2, "tags": []}]))
    df = read_json(spark, str(p), "id bigint, tags array<string>")
    got = {r.id: r.tags for r in df.collect()}
    assert got == {1: ["a", "b"], 2: []}


def test_stream_json_drains_available_now(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "b1.json").write_text(json.dumps({"id": 1, "v": 10}) + "\n" + json.dumps({"id": 2, "v": 20}))
    q = (
        stream_json(spark, str(src), "id bigint, v bigint")
        .writeStream.format("memory")
        .queryName("src_json_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id: r.v for r in spark.sql("SELECT * FROM src_json_stream").collect()}
    assert got == {1: 10, 2: 20}


def test_stream_cdc_text_preserves_separator_in_payload(spark, tmp_path):
    """A tab INSIDE the doc payload must stay in `data` — the split is
    limited to 2 fields (lsn, rest), not tokenized on every tab."""
    from sinker_spark.cdc import parse_test_decoding
    from sinker_spark.sources.files import stream_cdc_text

    src = tmp_path / "cdc"
    src.mkdir()
    line = (
        "7\ttable public.person: INSERT: id[text]:'p-1' "
        "doc[json]:'{\"note\": \"has\ttab\"}'"
    )
    (src / "a.txt").write_text(line + "\n")

    rows = []
    q = (
        parse_test_decoding(stream_cdc_text(spark, str(src)))
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert len(rows) == 1
    assert rows[0]["lsn"] == 7 and rows[0]["id"] == "p-1"
    assert rows[0]["payload"] == '{"note": "has\ttab"}'
