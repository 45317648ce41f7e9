"""Multi-seed differential fuzzer for the IVM fold primitives.

Drives random CDC batches through the module-level folds (ivm_delta
aggregate/min-max, ivm_topk, ivm_delta distinct, ivm_delta LOJ
composition) and compares the maintained state against a brute-force
recompute of the live fact multiset after EVERY batch. The generator
deliberately produces the adversarial shapes that have bitten before:

- NULL group/join keys (their own GROUP BY group; never join-match)
- NULL aggregate/order values (SUM/MAX ignore, COUNT(DISTINCT) ignores)
- duplicate identical rows (bag semantics, multiplicity > 1)
- same-batch insert+delete of one tuple (must net to zero)
- delete-then-reinsert of an extreme across batches
- batches that empty a group and batches that recreate it

Usage:  python tools/fuzz_ivm.py [n_seeds] [n_batches]
Exit non-zero on first divergence, printing the seed + lane + batch so
it can be pinned as a regression test. This is a bug-hunting tool, not
a CI test — tests/ carries pinned seeds for anything it ever caught.
"""

from __future__ import annotations

import random
import sys
from collections import Counter

from pyspark.sql import functions as F

from sinker_spark import ivm_delta, ivm_topk
from sinker_spark.ivm_delta import DELETE, INSERT, OP_COL
from sinker_spark.session import get_spark

GROUPS = ["g1", "g2", None]
SCHEMA = f"grp string, val bigint, {OP_COL} string"


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- agg lane

def fuzz_agg(spark, rng, n_batches):
    """sum/count/max/min fold + min/max dirty routing vs recompute."""
    live = Counter()  # (grp, val) -> multiplicity; val may be None
    for _ in range(rng.randrange(0, 12)):
        live[(rng.choice(GROUPS), rng.choice([None, *range(0, 50)]))] += 1

    SUMS = {"s": "val"}
    MAXES = {"mx": "val"}
    MINS = {"mn": "val"}
    fact_rows = [t for t, m in live.items() for _ in range(m)]
    state = ivm_delta.initial_agg_state(
        _df(spark, fact_rows, "grp string, val bigint"), ["grp"], SUMS, MAXES, MINS
    )
    for b in range(n_batches):
        ops = []
        for _ in range(rng.randrange(1, 7)):
            roll = rng.random()
            if roll < 0.45 and live:
                t = rng.choice(sorted(live, key=str))
                live[t] -= 1
                if not live[t]:
                    del live[t]
                ops.append((*t, DELETE))
            else:
                t = (rng.choice(GROUPS), rng.choice([None, *range(0, 50)]))
                live[t] += 1
                ops.append((*t, INSERT))
                if rng.random() < 0.2:  # same-batch churn: net zero
                    live[t] -= 1
                    if not live[t]:
                        del live[t]
                    ops.append((*t, DELETE))
        batch = _df(spark, ops, SCHEMA)
        state, dirty = ivm_delta.fold_agg_minmax(
            state, batch, ["grp"], SUMS, MAXES, MINS
        )
        if dirty.count():
            fact_now = [t for t, m in live.items() for _ in range(m)]
            state = ivm_delta.recompute_agg_groups(
                state, _df(spark, fact_now, "grp string, val bigint"),
                dirty, ["grp"], SUMS, MAXES, MINS,
            )
        state = state.localCheckpoint(eager=True)

        got = {
            r["grp"]: (
                r[ivm_delta._CNT],
                r["s"] if r[ivm_delta._nn("s")] > 0 else None,
                r["mx"], r["mn"],
            )
            for r in state.collect()
        }
        want = {}
        for (g, v), m in live.items():
            n, s, mx, mn = want.get(g, (0, None, None, None))
            n += m
            if v is not None:
                s = (s or 0) + v * m
                mx = v if mx is None else max(mx, v)
                mn = v if mn is None else min(mn, v)
            want[g] = (n, s, mx, mn)
        if got != want:
            return f"agg batch {b}: got {got} want {want}"
    return None


# --------------------------------------------------------------- topk lane

def fuzz_topk(spark, rng, n_batches, k=3, buf=2):
    """Buffered top-k fold + heal vs recompute, NULL scores included."""
    live = {}  # (grp, id) -> score (may be None)
    next_id = 0
    for _ in range(rng.randrange(0, 15)):
        live[(rng.choice(GROUPS), next_id)] = rng.choice([None, *range(0, 100)])
        next_id += 1
    fact = [(g, i, s) for (g, i), s in live.items()]
    fschema = "grp string, id bigint, score bigint"
    rows, counts = ivm_topk.initial_topk_state(
        _df(spark, fact, fschema), ["grp"], "score", "id", k, buf
    )
    for b in range(n_batches):
        ops = []
        for _ in range(rng.randrange(1, 7)):
            if live and rng.random() < 0.5:
                key = rng.choice(sorted(live, key=str))
                ops.append((key[0], key[1], live.pop(key), DELETE))
            else:
                g = rng.choice(GROUPS)
                s = rng.choice([None, *range(0, 100)])
                live[(g, next_id)] = s
                ops.append((g, next_id, s, INSERT))
                next_id += 1
        batch = _df(spark, ops, f"grp string, id bigint, score bigint, {OP_COL} string")
        rows, counts, dirty = ivm_topk.apply_topk_delta(
            rows, counts, batch, ["grp"], "score", "id", k, buf
        )
        if dirty.count():
            fact_now = [(g, i, s) for (g, i), s in live.items()]
            rows = ivm_topk.recompute_groups(
                rows, _df(spark, fact_now, fschema), dirty,
                ["grp"], "score", "id", k, buf,
            )
        rows = rows.localCheckpoint(eager=True)
        counts = counts.localCheckpoint(eager=True)

        served = ivm_topk.topk_view(rows, ["grp"], "score", "id", k)
        got = {}
        for r in served.collect():
            got.setdefault(r["grp"], []).append((r["rank"], r["id"], r["score"]))
        for g in got:
            got[g].sort()
        want = {}
        by_g = {}
        for (g, i), s in live.items():
            by_g.setdefault(g, []).append((i, s))
        for g, pairs in by_g.items():
            # desc(score) NULLS LAST (Spark desc), then asc(id)
            pairs.sort(key=lambda t: (t[1] is None, -(t[1] or 0), t[0]))
            want[g] = [(r + 1, i, s) for r, (i, s) in enumerate(pairs[:k])]
        want = {g: v for g, v in want.items() if v}
        if got != want:
            return f"topk batch {b}: got {got} want {want}"
    return None


# ----------------------------------------------------------- distinct lane

def fuzz_distinct(spark, rng, n_batches):
    """Support-count fold vs COUNT(*)/COUNT(DISTINCT) recompute."""
    live = Counter()
    for _ in range(rng.randrange(0, 12)):
        live[(rng.choice(GROUPS), rng.choice([None, "a", "b", "c", "d"]))] += 1
    fact = [t for t, m in live.items() for _ in range(m)]
    state = ivm_delta.initial_distinct_state(
        _df(spark, fact, "grp string, val string"), ["grp"], "val"
    )
    for b in range(n_batches):
        ops = []
        for _ in range(rng.randrange(1, 7)):
            if live and rng.random() < 0.45:
                t = rng.choice(sorted(live, key=str))
                live[t] -= 1
                if not live[t]:
                    del live[t]
                ops.append((*t, DELETE))
            else:
                t = (rng.choice(GROUPS), rng.choice([None, "a", "b", "c", "d"]))
                live[t] += 1
                ops.append((*t, INSERT))
        batch = _df(spark, ops, f"grp string, val string, {OP_COL} string")
        state = ivm_delta.apply_distinct_delta(state, batch, ["grp"], "val")
        state = state.localCheckpoint(eager=True)
        got = {
            r["grp"]: (r["n_rows"], r["n_distinct"])
            for r in ivm_delta.distinct_counts(state, ["grp"]).collect()
        }
        want = {}
        for (g, v), m in live.items():
            n, vals = want.get(g, (0, set()))
            n += m
            if v is not None:
                vals = vals | {v}
            want[g] = (n, vals)
        want = {g: (n, len(vals)) for g, (n, vals) in want.items()}
        if got != want:
            return f"distinct batch {b}: got {got} want {want}"
    return None


# ---------------------------------------------------------------- LOJ lane

def fuzz_loj(spark, rng, n_batches):
    """Left-outer composition (join_delta + pad_delta) vs recompute,
    NULL join keys on both sides, duplicate rows."""
    a_live = Counter()  # (k, av)
    b_live = Counter()  # (k, bv)
    keys = ["k1", "k2", None]
    for _ in range(rng.randrange(0, 8)):
        a_live[(rng.choice(keys), rng.randrange(5))] += 1
    for _ in range(rng.randrange(0, 6)):
        b_live[(rng.choice(keys), rng.randrange(5))] += 1

    def a_df():
        return _df(spark, [t for t, m in a_live.items() for _ in range(m)], "k string, av bigint")

    def b_df():
        return _df(spark, [t for t, m in b_live.items() for _ in range(m)], "k string, bv bigint")

    a_state = ivm_delta.relation_state(a_df())
    b_state = ivm_delta.relation_state(b_df())
    state = ivm_delta.initial_left_join_state(a_df(), b_df(), ["k"])
    for b in range(n_batches):
        a_ops, b_ops = [], []
        for _ in range(rng.randrange(1, 6)):
            side_a = rng.random() < 0.5
            live, ops = (a_live, a_ops) if side_a else (b_live, b_ops)
            if live and rng.random() < 0.45:
                t = rng.choice(sorted(live, key=str))
                live[t] -= 1
                if not live[t]:
                    del live[t]
                ops.append((*t, DELETE))
            else:
                t = (rng.choice(keys), rng.randrange(5))
                live[t] += 1
                ops.append((*t, INSERT))
        da = _df(spark, a_ops, f"k string, av bigint, {OP_COL} string")
        db = _df(spark, b_ops, f"k string, bv bigint, {OP_COL} string")
        delta = ivm_delta.left_join_delta(a_state, b_state, da, db, ["k"])
        state = ivm_delta.apply_join_state(state, delta)
        a_state = ivm_delta.apply_join_state(a_state, ivm_delta.changes_to_mult(da))
        b_state = ivm_delta.apply_join_state(b_state, ivm_delta.changes_to_mult(db))
        state = state.localCheckpoint(eager=True)
        a_state = a_state.localCheckpoint(eager=True)
        b_state = b_state.localCheckpoint(eager=True)

        got = Counter()
        for r in state.collect():
            got[(r["k"], r["av"], r["bv"], r[ivm_delta._MATCHED])] += r[ivm_delta._MULT]
        got = Counter({t: m for t, m in got.items() if m})
        want = Counter()
        for (ak, av), am in a_live.items():
            matches = [((bk, bv), bm) for (bk, bv), bm in b_live.items()
                       if ak is not None and bk == ak]
            if matches:
                for (bk, bv), bm in matches:
                    want[(ak, av, bv, True)] += am * bm
            else:
                want[(ak, av, None, False)] += am
        if got != want:
            return f"loj batch {b}: got {dict(got)} want {dict(want)}"
    return None


# ---------------------------------------------------------------- FOJ lane

def fuzz_foj(spark, rng, n_batches):
    """Full-outer composition (inner delta + BOTH pad deltas) vs
    recompute — pads on both sides, NULL keys pad unconditionally."""
    a_live = Counter()
    b_live = Counter()
    keys = ["k1", "k2", None]
    for _ in range(rng.randrange(0, 8)):
        a_live[(rng.choice(keys), rng.randrange(5))] += 1
    for _ in range(rng.randrange(0, 6)):
        b_live[(rng.choice(keys), rng.randrange(5))] += 1

    def a_df():
        return _df(spark, [t for t, m in a_live.items() for _ in range(m)], "k string, av bigint")

    def b_df():
        return _df(spark, [t for t, m in b_live.items() for _ in range(m)], "k string, bv bigint")

    a_state = ivm_delta.relation_state(a_df())
    b_state = ivm_delta.relation_state(b_df())
    state = ivm_delta.initial_full_join_state(a_df(), b_df(), ["k"])
    for b in range(n_batches):
        a_ops, b_ops = [], []
        for _ in range(rng.randrange(1, 6)):
            side_a = rng.random() < 0.5
            live, ops = (a_live, a_ops) if side_a else (b_live, b_ops)
            if live and rng.random() < 0.45:
                t = rng.choice(sorted(live, key=str))
                live[t] -= 1
                if not live[t]:
                    del live[t]
                ops.append((*t, DELETE))
            else:
                t = (rng.choice(keys), rng.randrange(5))
                live[t] += 1
                ops.append((*t, INSERT))
        da = _df(spark, a_ops, f"k string, av bigint, {OP_COL} string")
        db = _df(spark, b_ops, f"k string, bv bigint, {OP_COL} string")
        delta = ivm_delta.full_join_delta(a_state, b_state, da, db, ["k"])
        state = ivm_delta.apply_join_state(state, delta)
        a_state = ivm_delta.apply_join_state(a_state, ivm_delta.changes_to_mult(da))
        b_state = ivm_delta.apply_join_state(b_state, ivm_delta.changes_to_mult(db))
        state = state.localCheckpoint(eager=True)
        a_state = a_state.localCheckpoint(eager=True)
        b_state = b_state.localCheckpoint(eager=True)

        got = Counter()
        for r in state.collect():
            got[(r["k"], r["av"], r["bv"], r[ivm_delta._MATCHED])] += r[ivm_delta._MULT]
        got = Counter({t: m for t, m in got.items() if m})
        want = Counter()
        for (ak, av), am in a_live.items():
            matches = [((bk, bv), bm) for (bk, bv), bm in b_live.items()
                       if ak is not None and bk == ak]
            if matches:
                for (bk, bv), bm in matches:
                    want[(ak, av, bv, True)] += am * bm
            else:
                want[(ak, av, None, False)] += am
        for (bk, bv), bm in b_live.items():
            matched = bk is not None and any(
                ak == bk for (ak, _av) in a_live
            )
            if not matched:
                want[(bk, None, bv, False)] += bm
        if got != want:
            return f"foj batch {b}: got {dict(got)} want {dict(want)}"
    return None


LANES = {
    "agg": fuzz_agg, "topk": fuzz_topk, "distinct": fuzz_distinct,
    "loj": fuzz_loj, "foj": fuzz_foj,
}


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else list(LANES)
    spark = get_spark("ivm-fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    # toy relations: big shuffles just add per-stage latency here
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    failures = 0
    for seed in range(n_seeds):
        for lane in only:
            err = LANES[lane](spark, random.Random(1000 + seed), n_batches)
            tag = f"seed={1000 + seed} lane={lane}"
            if err:
                print(f"[FAIL] {tag}: {err}")
                failures += 1
            else:
                print(f"[ok  ] {tag}")
    print(f"{failures} failures / {n_seeds * len(only)} runs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
