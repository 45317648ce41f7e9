"""Direct-Postgres CDC lane (sources/pg_slot.py) — offline tests replay a
recorded ``pg_logical_slot_get_changes`` fixture through an injected
connection; the live test is env-gated on SINKER_SPARK_PG_DSN.

Fixture lines are genuine ``test_decoding`` output shapes (reference
bulk_action_generator.py:15-19 parses the same), with pg_lsn strings as
Postgres returns them."""

from __future__ import annotations

import os

import pytest

from sinker_spark.cdc import parse_test_decoding
from sinker_spark.sources.pg_slot import (
    CHECK_SLOT,
    CREATE_SLOT,
    DROP_SLOT,
    PostgresSlotSource,
    lsn_to_long,
)

# recorded slot output: (xid, pg_lsn, data) — two tables, all three ops
SLOT_FIXTURE = [
    (701, "0/16B3748", "BEGIN 701"),
    (701, "0/16B3748", "table public.person: INSERT: id[text]:'p-1' name[text]:'John'"),
    (701, "0/16B37C8", "table public.person: UPDATE: id[text]:'p-1' name[text]:'Jane'"),
    (701, "0/16B3810", "COMMIT 701"),
    (702, "0/16B3900", "BEGIN 702"),
    (702, "0/16B3900", "table public.course: DELETE: id[text]:'c-2'"),
    (702, "0/16B3948", "COMMIT 702"),
]


class _FakeConn:
    """Records SQL; serves canned results for the slot queries."""

    def __init__(self, state):
        self.state = state

    def execute(self, sql):
        self.state["log"].append(sql)
        self.state.setdefault("results", [])

        class _Cur:
            def __init__(self, rows):
                self._rows = rows

            def fetchall(self):
                return self._rows

        if "PG_REPLICATION_SLOTS" in sql:
            return _Cur([(1 if self.state.get("slot_present") else 0,)])
        if "pg_logical_slot_get_changes" in sql:
            drained, self.state["pending"] = self.state.get("pending", []), []
            return _Cur(drained)
        if "pg_logical_slot_peek_changes" in sql:
            return _Cur(list(self.state.get("pending", [])))
        if "pg_replication_slot_advance" in sql:
            upto = lsn_to_long(sql.rsplit("'", 2)[1])
            self.state["pending"] = [
                r for r in self.state.get("pending", []) if lsn_to_long(r[1]) > upto
            ]
            return _Cur([])
        return _Cur([])

    def close(self):
        self.state["closed"] = self.state.get("closed", 0) + 1


@pytest.fixture()
def state():
    return {"log": [], "pending": list(SLOT_FIXTURE), "slot_present": True}


@pytest.fixture()
def source(state):
    return PostgresSlotSource(slot="sinker", connect_fn=lambda: _FakeConn(state))


def test_lsn_conversion():
    assert lsn_to_long("0/16B3748") == 0x16B3748
    assert lsn_to_long("A/0") == 0xA << 32
    assert lsn_to_long("FFFFFFFF/FFFFFFFF") == (1 << 64) - 1
    assert lsn_to_long(42) == 42 and lsn_to_long(None) is None


def test_slot_lifecycle_sql_matches_reference(state, source):
    """reset = check → drop (present) → create, the reference's startup
    sequence (runner.py:56-64) with its exact SQL templates."""
    source.reset_slot()
    assert state["log"] == [
        CHECK_SLOT.format("sinker"),
        DROP_SLOT.format("sinker"),
        CREATE_SLOT.format("sinker"),
    ]
    state["log"].clear()
    state["slot_present"] = False
    source.reset_slot()
    assert state["log"] == [CHECK_SLOT.format("sinker"), CREATE_SLOT.format("sinker")]
    assert state["closed"] >= 4  # every lifecycle call closes its connection


def test_poll_changes_emits_cdc_text_frame(spark, source):
    df = source.poll_changes(spark)
    assert dict(df.dtypes) == {"lsn": "bigint", "data": "string"}
    rows = df.orderBy("lsn").collect()
    assert len(rows) == len(SLOT_FIXTURE)
    assert rows[0]["lsn"] == 0x16B3748
    # second poll: slot is consumed → empty
    assert source.poll_changes(spark).count() == 0


def test_slot_lane_parses_identically_to_file_lane(spark, tmp_path, source):
    """Parity gate: the recorded fixture through poll_changes →
    parse_test_decoding equals the same lines through the file lane's
    (lsn, data) shape — one downstream engine, three front ends."""
    slot_parsed = parse_test_decoding(source.poll_changes(spark))

    file_shaped = spark.createDataFrame(
        [(lsn_to_long(lsn), data) for _x, lsn, data in SLOT_FIXTURE], "lsn bigint, data string"
    )
    file_parsed = parse_test_decoding(file_shaped)

    a = sorted((r.asDict() for r in slot_parsed.collect()), key=str)
    b = sorted((r.asDict() for r in file_parsed.collect()), key=str)
    assert a == b and len(a) == 3  # BEGIN/COMMIT dropped, 3 DML rows kept
    ops = {(r["table"], r["op"]) for r in a}
    assert ops == {("person", "INSERT"), ("person", "UPDATE"), ("course", "DELETE")}


def test_run_microbatches_drives_sync_engine(spark, tmp_path, state, source):
    """Polling loop end-to-end against the school fixtures: the UPDATE in
    the slot propagates into the person_mv document, exactly as the same
    batch does through the file lane (test_school_e2e.py)."""
    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.runner import SyncEngine
    from sinker_spark.sinks.memory import InMemorySink
    from sinker_spark.views import ViewDef

    from tests import school_fixtures as fx

    fx.register(spark, str(tmp_path / "tables"))
    sink = InMemorySink()
    eng = SyncEngine(
        spark,
        [ViewDef("person_mv", sql=fx.PERSON_MV_SQL, index="people")],
        sink,
        SnapshotStore(spark, str(tmp_path / "snap")),
    )
    eng.backfill()

    rows = {k: list(v) for k, v in fx.SEED.items()}
    rows["person"] = [("p-1", "Johnny") if r[0] == "p-1" else r for r in rows["person"]]
    fx.register(spark, str(tmp_path / "tables"), rows)
    state["pending"] = [
        (801, "0/20000A0", "BEGIN 801"),
        (801, "0/20000A0", "table public.person: UPDATE: id[text]:'p-1' name[text]:'Johnny'"),
        (801, "0/20000F0", "COMMIT 801"),
    ]

    done = source.run_microbatches(spark, eng, max_batches=2)
    assert done == 2  # one data batch + one empty poll
    assert sink.get("people", "p-1")["name"] == "Johnny"


def test_long_to_lsn_roundtrip():
    from sinker_spark.sources.pg_slot import long_to_lsn

    for text in ("0/16B3748", "A/0", "FFFFFFFF/FFFFFFFF"):
        assert long_to_lsn(lsn_to_long(text)) == text


def test_peek_advance_redelivers_after_crash(spark, state, source):
    """At-least-once: the loop peeks (slot untouched), processes, and
    advances only after process_cdc_batch returns. A crash between read
    and sink ack must leave the slot position intact so the SAME batch
    re-delivers on resume — the reference's destructive get would have
    lost it (runner.py:100-106, at-most-once tail)."""

    class _Boom:
        def process_cdc_batch(self, df, epoch_id=None):
            raise RuntimeError("sink died mid-batch")

    with pytest.raises(RuntimeError):
        source.run_microbatches(spark, _Boom(), max_batches=1)
    # slot NOT advanced: every change still pending, nothing lost
    assert state["pending"] == list(SLOT_FIXTURE)
    assert not any("pg_logical_slot_get_changes" in s for s in state["log"])
    assert not any("pg_replication_slot_advance" in s for s in state["log"])

    # resume: identical batch re-delivered, then the slot advances
    seen = []

    class _Eng:
        def process_cdc_batch(self, df, epoch_id=None):
            seen.append(sorted((r["table"], r["op"], r["id"]) for r in df.collect()))

    done = source.run_microbatches(spark, _Eng(), max_batches=2)
    assert done == 2  # redelivered data batch + one empty poll
    assert seen == [
        [("course", "DELETE", "c-2"), ("person", "INSERT", "p-1"), ("person", "UPDATE", "p-1")]
    ]
    assert state["pending"] == []  # advanced past the batch max LSN
    advances = [s for s in state["log"] if "pg_replication_slot_advance" in s]
    assert advances == ["select pg_replication_slot_advance('sinker', '0/16B3948')"]


def test_destructive_mode_preserves_reference_parity(spark, state, source):
    """destructive=True keeps the reference's exact get-variant SQL."""
    seen = []

    class _Eng:
        def process_cdc_batch(self, df, epoch_id=None):
            seen.append(df.count())

    done = source.run_microbatches(spark, _Eng(), max_batches=2, destructive=True)
    assert done == 2 and seen == [3]
    assert any("pg_logical_slot_get_changes" in s for s in state["log"])
    assert not any("pg_replication_slot_advance" in s for s in state["log"])


@pytest.mark.skipif(
    not os.environ.get("SINKER_SPARK_PG_DSN"),
    reason="live Postgres integration needs SINKER_SPARK_PG_DSN",
)
def test_live_postgres_slot_roundtrip(spark):  # pragma: no cover - env-gated
    import psycopg

    dsn = os.environ["SINKER_SPARK_PG_DSN"]
    src = PostgresSlotSource(
        slot="sinker_spark_test", connect_fn=lambda: psycopg.connect(dsn, autocommit=True)
    )
    src.reset_slot()
    try:
        with psycopg.connect(dsn, autocommit=True) as conn:
            conn.execute("create table if not exists _sinker_probe (id text primary key, v text)")
            conn.execute("insert into _sinker_probe values ('x', '1') on conflict (id) do update set v='1'")
        parsed = parse_test_decoding(src.poll_changes(spark))
        assert parsed.where("table = '_sinker_probe'").count() >= 1
    finally:
        src.drop_slot()
