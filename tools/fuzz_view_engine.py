"""SQL-view ENGINE fuzzer: random aggregate-shaped PG view SQL driven
through the full SyncEngine materialization path — transpile → compile →
backfill → snapshot → sink — with DuckDB as the document oracle.

tools/fuzz_sql.py compares `spark.sql(transpile(sql))` row-sets; this
tool goes further and checks the ENGINE's observable contract for
arbitrary generated views:

1. **Backfill parity**: after ``SyncEngine.backfill()`` the in-memory
   sink must hold exactly the documents DuckDB computes for the same
   view SQL (same ids, same field values) — exercising doc-id keying,
   row→doc canonicalization (decimals, NULLs, nested values), and the
   snapshot write path on schemas no hand-written view ever tried.
2. **Refresh idempotence**: a CDC batch touching the view's base tables
   WITHOUT changing data must produce ZERO sink actions — the
   recompute+snapshot-diff (or targeted-refresh) lane must recognize
   everything as unchanged, for any generated schema.
3. **Mutation convergence**: one dep table is then actually MUTATED
   (seeded row deletes + numeric updates), a CDC touch marks the views
   dirty, and after the refresh every view's sink docs must equal DuckDB
   evaluated over the mutated tables — upsert AND delete diff actions
   for arbitrary generated view schemas. (This phase found the
   auto-targeted-refresh stale-sink bug fixed in views.py
   `_selects_parent_id`.)

Each run hosts TWO generated views on one engine with
``max_parallel_views=2``, so the concurrent fan-out and shared-scan
epoch paths run under fuzz too.

Views are aggregate-shaped (≥1 group key) so the doc id — the
'|'-joined group keys — is unique by construction (the engine's A4
unique-key invariant).

Usage: python tools/fuzz_view_engine.py [n_runs] [base_seed] [sf_dir]
"""

from __future__ import annotations

import os
import random
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import fuzz_sql as fz  # noqa: E402

from sinker_spark.catalog import register_views  # noqa: E402
from sinker_spark.ivm import SnapshotStore  # noqa: E402
from sinker_spark.oracle import _canon, duckdb_connection  # noqa: E402
from sinker_spark.runner import SyncEngine  # noqa: E402
from sinker_spark.session import get_spark  # noqa: E402
from sinker_spark.sinks.memory import InMemorySink  # noqa: E402
from sinker_spark.views import ViewDef  # noqa: E402

CDC_SCHEMA = "lsn bigint, schema string, table string, op string, id string, payload string"
N_VIEWS = 2


def gen_distinct_on_view(rng: random.Random):
    """Latest-per-key view via DISTINCT ON — the reference's
    latest-order-per-customer shape, driving the transpiler's
    row_number rewrite through the engine. Unique by the distinct key,
    which becomes the doc id."""
    t = rng.choice(["orders", "lineitem", "customer", "events"])
    grp = {"orders": "o_orderstatus", "lineitem": "l_returnflag",
           "customer": "c_mktsegment", "events": "event_type"}[t]
    picks = [c for c, ty in fz.CATALOG[t] if ty in ("int", "str") and c != grp]
    rng.shuffle(picks)
    vals = picks[:2]
    order = ", ".join(
        [f"{grp} ASC NULLS FIRST"]
        + [f"{c} ASC NULLS FIRST" for c, _ in fz.CATALOG[t] if c != grp]
    )
    sel = f"{grp} AS k0, " + ", ".join(f"{c} AS a{i}" for i, c in enumerate(vals))
    inner = f"SELECT DISTINCT ON ({grp}) {sel} FROM {t} ORDER BY {order}"
    fields = ["k0"] + [f"a{i}" for i in range(len(vals))]
    doc = "json_build_object(" + ", ".join(f"'{f}', {f}" for f in fields) + ")"
    return (
        f"SELECT coalesce(k0::text, '?') AS id, {doc} AS doc FROM ({inner}) t",
        f"SELECT coalesce(CAST(k0 AS VARCHAR), '?') AS id, * FROM ({inner}) t",
        fields,
    )


def gen_view(seed: int):
    """Draw an aggregate query with ≥1 group key (or a latest-per-key
    DISTINCT ON shape); wrap it with a doc id built from the group keys.
    Returns (pg_sql, duck_sql, fields)."""
    rng = random.Random(seed)
    if rng.random() < 0.25:
        return gen_distinct_on_view(rng)
    for _ in range(100):
        sub = random.Random(rng.randrange(1 << 30))
        pair = sub.choice([fz.q_agg, fz.q_agg, fz.q_join])(sub)
        head = pair.pg.split(" FROM ")[0]
        n_keys = len(re.findall(r"\bAS k\d+\b", head))
        if " GROUP BY " in pair.pg and n_keys >= 1:
            break
    else:  # pragma: no cover - generator always finds one
        raise RuntimeError("no aggregate query drawn")
    n_aggs = len(re.findall(r"\bAS a\d+\b", head))
    fields = [f"k{i}" for i in range(n_keys)] + [f"a{i}" for i in range(n_aggs)]
    id_pg = " || '|' || ".join(
        f"coalesce(k{i}::text, '?')" for i in range(n_keys)
    )
    id_duck = " || '|' || ".join(
        f"coalesce(CAST(k{i} AS VARCHAR), '?')" for i in range(n_keys)
    )
    # engine view contract (reference person_mv shape): (id, doc-struct)
    doc = "json_build_object(" + ", ".join(f"'{f}', {f}" for f in fields) + ")"
    return (
        f"SELECT {id_pg} AS id, {doc} AS doc FROM ({pair.pg}) t",
        f"SELECT {id_duck} AS id, * FROM ({pair.duck}) t",
        fields,
    )


def _want(con, duck_sql: str, fields: list[str]) -> dict:
    cur = con.execute(duck_sql)
    cols = [d[0] for d in cur.description]
    out = {}
    for r in cur.fetchall():
        d = dict(zip(cols, r))
        out[d["id"]] = {f: _canon(d[f]) for f in fields}
    return out


def _got(sink, name: str) -> dict:
    return {
        i: {k: _canon(v) for k, v in doc.items()}
        for i, doc in sink.indices.get(name, {}).items()
    }


def _diff(got: dict, want: dict) -> str | None:
    if set(got) != set(want):
        extra, miss = set(got) - set(want), set(want) - set(got)
        return f"id sets differ: +{sorted(extra)[:3]} -{sorted(miss)[:3]} ({len(got)} vs {len(want)})"
    for i in want:
        if got[i] != want[i]:
            return f"doc {i!r}: spark={got[i]} duck={want[i]}"
    return None


def one_run(spark, con, seed: int, sf_dir: str) -> list[str]:
    specs = [gen_view(seed * N_VIEWS + v) for v in range(N_VIEWS)]
    names = [f"fv{v}" for v in range(N_VIEWS)]
    errs: list[str] = []
    root = tempfile.mkdtemp(prefix=f"fuzz_view_{seed}_")
    try:
        views = [
            ViewDef(name, sql=pg, key="id")
            for name, (pg, _, _) in zip(names, specs)
        ]
        sink = InMemorySink()
        eng = SyncEngine(
            spark, views, sink, SnapshotStore(spark, root), max_parallel_views=N_VIEWS
        )
        eng.backfill()

        for name, (pg, duck, fields) in zip(names, specs):
            d = _diff(_got(sink, name), _want(con, duck, fields))
            if d:
                errs.extend([f"{name} backfill: {d}", f"pg: {pg}", f"duck: {duck}"])
                return errs

        # phase 2 — no-change touch of every dep: zero actions
        deps = sorted(set().union(*(v.deps for v in views)))
        before_actions = len(sink.action_log)
        before_docs = {n: _got(sink, n) for n in names}
        eng.process_cdc_batch(
            spark.createDataFrame(
                [(10_000 + j, "public", t, "UPDATE", "§none§", None)
                 for j, t in enumerate(deps)],
                CDC_SCHEMA,
            )
        )
        new_actions = [a for a in sink.action_log[before_actions:] if a[1] != "recreate"]
        if new_actions:
            errs.append(f"no-change refresh emitted actions: {new_actions[:5]}")
        for n in names:
            if _got(sink, n) != before_docs[n]:
                errs.append(f"no-change refresh altered {n} docs")
        if errs:
            errs.extend(f"pg: {pg}" for pg, _, _ in specs)
            return errs

        # phase 3 — MUTATE 1-2 dep tables, ONE CDC batch touching them
        # all (dirty-set coalescing + shared-scan under real change),
        # refresh, converge on DuckDB
        rng = random.Random(seed * 31 + 7)
        rng.shuffle(deps)
        victims = deps[: rng.randint(1, min(2, len(deps)))]
        try:
            for vi, victim in enumerate(victims):
                pdf = con.execute(f"SELECT * FROM {victim}").fetchdf()
                if len(pdf) > 4:
                    drop = pdf.sample(frac=0.1, random_state=seed + vi).index
                    pdf = pdf.drop(index=drop)
                    numcols = [
                        c for c in pdf.columns
                        if str(pdf[c].dtype).startswith(("int", "float"))
                    ]
                    if numcols:
                        col = numcols[rng.randrange(len(numcols))]
                        upd = pdf.sample(frac=0.1, random_state=seed + 10 + vi).index
                        pdf.loc[upd, col] = pdf.loc[upd, col] * 2 + 1
                # preserve the catalog's exact column types (pandas
                # roundtrips timestamp_ntz into timestamp; the engine
                # rightly refuses that as a breaking doc-schema change)
                orig = {
                    f.name: f.dataType.simpleString()
                    for f in spark.table(victim).schema.fields
                }
                mut = spark.createDataFrame(pdf)
                mut = mut.select(*[mut[c].cast(orig[c]).alias(c) for c in mut.columns])
                mut.createOrReplaceTempView(victim)
                con.register(f"__mut_pdf_{vi}", pdf)
                con.execute(
                    f"CREATE OR REPLACE VIEW {victim} AS SELECT * FROM __mut_pdf_{vi}"
                )
            eng.process_cdc_batch(
                spark.createDataFrame(
                    [(20_000 + j, "public", v, "UPDATE", "§mut§", None)
                     for j, v in enumerate(victims)],
                    CDC_SCHEMA,
                )
            )
            for name, (pg, duck, fields) in zip(names, specs):
                d = _diff(_got(sink, name), _want(con, duck, fields))
                if d:
                    errs.extend(
                        [f"{name} post-mutation ({victims}): {d}", f"pg: {pg}"]
                    )
        finally:
            # restore the pristine relations for the next seed
            register_views(spark, sf_dir)
            for vi, victim in enumerate(victims):
                con.execute(
                    f"CREATE OR REPLACE VIEW {victim} AS "
                    f"SELECT * FROM '{sf_dir}/{victim}.parquet'"
                )
                try:
                    con.unregister(f"__mut_pdf_{vi}")
                except Exception:
                    pass
    except Exception as e:  # noqa: BLE001
        errs.append(f"EXC {type(e).__name__}: {str(e)[:300]}")
        errs.extend(f"pg: {pg}" for pg, _, _ in specs)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return errs


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    spark = get_spark("view-engine-fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    register_views(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    failures = 0
    for i in range(n):
        seed = base + i
        errs = one_run(spark, con, seed, sf_dir)
        if errs:
            failures += 1
            print(f"[FAIL] seed={seed}")
            for e in errs:
                print(f"       {e}")
        else:
            print(f"[ok  ] seed={seed}")
    print(f"{failures} failures / {n} runs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
