"""Local replica of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark callable and the oracle SQL on
the same parquet tables, then compare row-count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their canonical string). Used by tests/ and by ``python -m
sinker_spark.oracle`` for a quick full sweep.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import hashlib
import math

import duckdb

from sinker_spark.catalog import TABLES


def _canon(v) -> str:
    """Canonical string for one value, identical across engines."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr is shortest-round-trip in py3 — both engines' doubles come
        # back as the same bits if the query followed the determinism rules
        return repr(v)
    if isinstance(v, _dec.Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_query(spark, sf_dir: str, name: str) -> dict:
    """Run one registered query against its oracle; return a report dict."""
    from sinker_spark.queries import REGISTRY, _load

    _load()
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    report = {"name": name, "rows_spark": len(srows), "cols_spark": sorted(scols)}
    if spec.oracle is None:
        report["status"] = "rows-only"
        report["ok"] = len(srows) >= 0
        return report

    con = duckdb_connection(sf_dir)
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    report.update(rows_oracle=len(orows), cols_oracle=sorted(ocols))

    ok_rows = len(srows) == len(orows)
    ok_cols = sorted(scols) == sorted(ocols)
    sh = _hash_rows(scols, srows)
    oh = _hash_rows(ocols, orows)
    report.update(hash_spark=sh, hash_oracle=oh, ok=ok_rows and ok_cols and sh == oh)
    report["status"] = "match" if report["ok"] else "MISMATCH"
    if not report["ok"]:
        # show a few differing canonical lines to debug fast
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
        ls = sorted("|".join(_canon(r[i]) for i in order_s) for r in srows)
        lo = sorted("|".join(_canon(r[i]) for i in order_o) for r in orows)
        diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
        only_s = [x for x in ls if x not in set(lo)][:3]
        only_o = [x for x in lo if x not in set(ls)][:3]
        report["sample_diffs"] = diffs or list(zip(only_s, only_o))
    return report


def main(sf_dir: str = "/root/testdata/sf0.01", names: list[str] | None = None) -> int:
    from sinker_spark.queries import REGISTRY, _load
    from sinker_spark.session import get_spark

    _load()
    spark = get_spark("oracle-sweep")
    failures = 0
    for name in names or sorted(REGISTRY):
        try:
            rep = compare_query(spark, sf_dir, name)
        except Exception as e:  # surface, keep sweeping
            rep = {"name": name, "status": f"ERROR {type(e).__name__}: {e}", "ok": False}
        mark = "ok " if rep.get("ok") else "FAIL"
        print(f"[{mark}] {rep['name']}: {rep['status']}"
              + (f" ({rep.get('rows_spark')} rows)" if rep.get('ok') else f" {rep}"))
        failures += 0 if rep.get("ok") else 1
    print(f"{'ALL MATCH' if failures == 0 else str(failures) + ' FAILURES'} / {len(names or REGISTRY)} queries")
    return failures


if __name__ == "__main__":
    import sys

    _sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _names = sys.argv[2:] or None
    sys.exit(1 if main(_sf, names=_names) > 0 else 0)
