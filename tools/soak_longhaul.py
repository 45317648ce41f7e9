"""Long-haul composed soak: ONE engine instance, 1000 mixed batches.

The per-family fuzzers (fuzz_engine/fuzz_ivm/fuzz_view_engine) prove
each lane on short runs; the 200-batch churn soak proved the
maintenance policy bounds state growth for one topology. This tool
proves the COMPOSITION: all 9 lane families live in one SyncEngine at
once, folding a 1000-batch stream that interleaves

- inserts / update chains / deletes / key migrations / NULL keys
  (fuzz_engine.gen_batch),
- dropped before-images every 4th batch (torn-state → lane fallback →
  refold on the next batch),
- ~10% verbatim batch redelivery (at-least-once replay suppression),
- lane-spec EVOLUTION at 1/3 and 2/3 of the run: one family's view is
  re-drawn (new keys/sums/k/...) and a fresh SyncEngine adopts the same
  store+sink with on_schema_change='reset' — the reference DROP+CREATE
  path (sinker.py:100-103) under live traffic,
- the engine's own every-N-epochs maintenance (snapshot vacuum + lane
  state-bucket compaction) running on its default cadence,

and asserts the two properties a 100 TB deployment needs from a
long-running stream:

1. per-batch latency stays FLAT — the mean of the last 100-batch window
   must be < 2x the minimum window mean (state growth or version
   accumulation would show as a monotone drift),
2. on-disk state stays BOUNDED — the store's file count at the end must
   be < 2x the count at batch 200 (post-warmup steady state).

Correctness is spot-checked against each view's own recompute every
``check_every`` batches and at the end (every batch would make the run
quadratic in recomputes without adding signal — the per-family fuzzers
already check every batch on short runs).

Usage: python tools/soak_longhaul.py [n_batches=1000] [seed=60] [check_every=100]
Prints one JSON summary line; exit non-zero on any divergence or
flatness/boundedness violation.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinker_spark.ivm import SnapshotStore
from sinker_spark.runner import SyncEngine
from sinker_spark.session import get_spark
from sinker_spark.sinks.memory import InMemorySink

from tools.fuzz_engine import (
    MAKERS,
    REGIONS,
    CATS,
    cdc_df,
    check_views,
    gen_batch,
    check_views as _check,
    register_truth,
)


def _count_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += len(files)
    return n


def _make_views(rng: random.Random):
    """One view per lane family — deterministic full coverage."""
    return [maker(rng, f"fzv{i}") for i, maker in enumerate(MAKERS)]


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    check_every = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    spark = get_spark("soak-longhaul")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    rng = random.Random(seed)
    views = _make_views(rng)
    sales = {
        f"s{i:04d}": (rng.choice(REGIONS), rng.choice(CATS), rng.randrange(0, 101) / 4.0)
        for i in range(10)
    }
    dims = {"eu": ("m1", "c1"), "us": ("m2", "c0")}
    org = {"m0": "d0", "m1": "d1", "m2": "d0"}
    cats = {"a": "L0", "b": "L1"}
    depts = {"d0": "f0", "d1": "f1"}
    coaches = {"c0": "g0", "c1": "g1"}
    notes = {f"n{i:04d}": (rng.choice(REGIONS), f"t{rng.randrange(5)}") for i in range(4)}
    lines = {f"l{i:04d}": (f"s{rng.randrange(10):04d}", rng.randrange(0, 20) / 2.0)
             for i in range(6)}
    next_id, lsn = 10, 1
    register_truth(spark, sales, dims, org, cats, depts, notes, coaches, lines)

    root = tempfile.mkdtemp(prefix="soak_longhaul_")
    evolve_at = {n_batches // 3, 2 * n_batches // 3}
    latencies: list[float] = []
    file_counts: dict[int, int] = {}
    failures: list[str] = []
    replays = 0
    try:
        sink = InMemorySink()
        store = SnapshotStore(spark, root)
        eng = SyncEngine(spark, views, sink, store, on_schema_change="reset",
                         max_parallel_views=len(views))
        eng.backfill()
        failures += _check(spark, sink, views, f"seed={seed} backfill")

        for b in range(1, n_batches + 1):
            if b in evolve_at and not failures:
                # live spec evolution: re-draw one family's view, fresh
                # engine adopts the same store+sink (reset on breaking
                # doc-schema change — the reference DROP+CREATE path)
                idx = rng.randrange(len(MAKERS))
                views[idx] = MAKERS[idx](rng, f"fzv{idx}")
                eng = SyncEngine(spark, views, sink, store, on_schema_change="reset",
                                 max_parallel_views=len(views))
                print(f"[evolve] batch={b} family={MAKERS[idx].__name__}", flush=True)

            records, next_id, lsn = gen_batch(
                rng, sales, dims, org, cats, depts, notes, coaches, next_id, lsn,
                drop_image=(b % 4 == 0), lines=lines,
            )
            register_truth(spark, sales, dims, org, cats, depts, notes, coaches, lines)
            batch = cdc_df(spark, records)
            t0 = time.perf_counter()
            eng.process_cdc_batch(batch, epoch_id=b)
            latencies.append(time.perf_counter() - t0)
            if rng.random() < 0.10:  # at-least-once verbatim redelivery
                eng.process_cdc_batch(batch, epoch_id=b)
                replays += 1
            if b % check_every == 0 or b == n_batches:
                failures += _check(spark, sink, views, f"seed={seed} batch={b}")
                file_counts[b] = _count_files(root)
                w = latencies[-check_every:]
                print(
                    f"[b{b:5d}] win_mean={sum(w)/len(w):.2f}s files={file_counts[b]}",
                    flush=True,
                )
                # checkpoint the running summary so a truncated run (wall
                # clock, preemption) still leaves a usable series
                out = os.environ.get("SOAK_SUMMARY_PATH")
                if out:
                    wins = [latencies[i:i + check_every]
                            for i in range(0, len(latencies), check_every)]
                    with open(out, "w") as fh:
                        json.dump({
                            "n_batches": len(latencies), "seed": seed,
                            "replays": replays,
                            "window_means_s": [round(sum(x) / len(x), 3)
                                               for x in wins if x],
                            "file_counts": file_counts,
                            "divergences": len(failures),
                        }, fh)
                if failures:
                    break
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # flatness + boundedness verdicts
    win = check_every
    windows = [latencies[i:i + win] for i in range(0, len(latencies), win)]
    means = [sum(w) / len(w) for w in windows if len(w) == win]
    flat = bool(means) and means[-1] < 2.0 * min(means)
    # file counts are a SAWTOOTH (growth between every-N-epoch
    # compaction sweeps), so two phase points can't be compared — bound
    # the envelope instead: the second half's peak must not exceed 2x
    # the first half's peak (post-warmup)
    warm = [c for b, c in sorted(file_counts.items()) if b >= 200]
    half = len(warm) // 2
    bounded = len(warm) < 4 or max(warm[half:]) <= 2.0 * max(warm[:half])
    ok = not failures and flat and bounded

    print(json.dumps({
        "n_batches": len(latencies),
        "seed": seed,
        "replays": replays,
        "window_means_s": [round(m, 3) for m in means],
        "file_counts": file_counts,
        "divergences": len(failures),
        "flat": flat,
        "bounded": bounded,
        "ok": ok,
    }))
    for f in failures[:10]:
        print(f"[FAIL] {f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
