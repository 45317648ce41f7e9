"""IncrementalIVFIndex: O(batch) ANN index maintenance
(operators/similarity_incremental.py).

Core invariant (the IVM soundness statement for a frozen quantizer): an
index folded through any sequence of update() batches is IDENTICAL to a
bulk assignment of the final live corpus against the same centroids.
Plus: delete visibility, query-vs-brute-force parity within probed
cells, drift/staleness accounting, and retrain recovery on an
adversarial insert stream.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sinker_spark.operators.similarity import brute_force_topk
from sinker_spark.operators.similarity_incremental import (
    IncrementalIVFIndex,
    assign_to_centroids,
)

SCHEMA = "vec_id bigint, embedding array<double>"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _corpus(spark, n=60, dim=6, base=0):
    # deterministic spread: four rough directions so k=4 cells are sane
    rows = []
    for i in range(n):
        d = i % 4
        v = [0.1 * ((i * 7 + j * 3) % 11) for j in range(dim)]
        v[d] += 5.0
        rows.append((base + i, v))
    return _vecs(spark, rows)


def _state(idx):
    return sorted(
        (r["vec_id"], r["cell"], tuple(round(x, 9) for x in r["vec"]))
        for r in idx.postings().collect()
    )


def test_update_fold_equals_bulk_assignment(spark, tmp_path):
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=4, iterations=2)
    corpus = _corpus(spark, 40)
    idx.bootstrap(corpus)
    cents = idx.centroids()

    # batch 1: 6 inserts + 2 updates (vec moved) + 2 deletes
    b1_new = _corpus(spark, 6, base=100)
    b1_upd = _vecs(spark, [(3, [9.0] * 6), (7, [0.0] * 5 + [9.0])])
    idx.update(changed=b1_new.unionByName(b1_upd), deleted_ids=[0, 5])
    # batch 2: delete one of batch 1's inserts, insert more
    b2_new = _corpus(spark, 4, base=200)
    idx.update(changed=b2_new, deleted_ids=[101])

    live = (
        corpus.where(~F.col("vec_id").isin([0, 5, 3, 7]))
        .unionByName(b1_upd)
        .unionByName(b1_new.where(F.col("vec_id") != 101))
        .unionByName(b2_new)
    )
    bulk = sorted(
        (r["vec_id"], r["cell"], tuple(round(x, 9) for x in r["vec"]))
        for r in assign_to_centroids(live, cents).collect()
    )
    assert _state(idx) == bulk
    # centroids frozen across updates
    assert idx.centroids() == cents


def test_deletes_and_inserts_visible_in_queries(spark, tmp_path):
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=4, iterations=2)
    idx.bootstrap(_corpus(spark, 30))
    q = _vecs(spark, [(999, [5.5] + [0.4] * 5)])

    before = {r["nid"] for r in idx.query(q, k=5).collect()}
    victims = list(before)[:2]
    idx.update(deleted_ids=victims)
    after = {r["nid"] for r in idx.query(q, k=5).collect()}
    assert not (after & set(victims))

    # a near-identical new vector must become the top hit
    idx.update(changed=_vecs(spark, [(500, [5.49] + [0.4] * 5)]))
    top = idx.query(q, k=1).collect()
    assert top and top[0]["nid"] == 500


def test_query_matches_brute_force_within_probed_cells(spark, tmp_path):
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=3, iterations=2)
    idx.bootstrap(_corpus(spark, 36))
    idx.update(changed=_corpus(spark, 6, base=300), deleted_ids=[1, 2])
    q = _vecs(spark, [(901, [0.2] * 5 + [5.3]), (902, [5.1, 0.3, 0.3, 0.3, 0.3, 0.3])])

    got = idx.query(q, k=3).collect()
    # oracle: per query, brute-force cosine over ONLY the query's cell
    post = idx.postings().collect()
    cents = idx.centroids()
    for r in _vecs(spark, [(901, [0.2] * 5 + [5.3]), (902, [5.1, 0.3, 0.3, 0.3, 0.3, 0.3])]).collect():
        qv = list(r["embedding"])
        dists = [round(sum((a - b) ** 2 for a, b in zip(qv, c)), 9) for c in cents]
        cell = dists.index(min(dists))
        members = [(p["vec_id"], list(p["vec"])) for p in post if p["cell"] == cell]

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return round(num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 6)

        want = sorted(((cos(qv, v), -nid) for nid, v in members), reverse=True)[:3]
        want_ids = [-n for _, n in want]
        got_ids = [g["nid"] for g in sorted(
            (g for g in got if g["qid"] == r["vec_id"]), key=lambda g: g["rank"])]
        assert got_ids == want_ids


def test_drift_and_retrain_on_adversarial_stream(spark, tmp_path):
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=4, iterations=2)
    idx.bootstrap(_corpus(spark, 40))
    assert not idx.needs_retrain(max_staleness=0.5, max_imbalance=10.0)

    # adversarial: every insert lands in ONE direction → one cell swells
    skew = _vecs(spark, [(1000 + i, [8.0 + 0.01 * i] + [0.1] * 5) for i in range(40)])
    idx.update(changed=skew)
    d = idx.drift()
    assert d["staleness"] >= 1.0  # 40 changes / 40 trained
    assert idx.needs_retrain(max_staleness=0.5, max_imbalance=1e9)  # stale
    imb_before = d["imbalance"]

    idx.retrain()
    d2 = idx.drift()
    assert d2["staleness"] == 0.0
    assert d2["imbalance"] <= imb_before + 1e-9
    # live corpus preserved through retrain
    assert idx.postings().count() == 80


def test_update_is_deterministic(spark, tmp_path):
    states = []
    for run in ("a", "b"):
        idx = IncrementalIVFIndex(spark, str(tmp_path / f"ivf_{run}"), k=4, iterations=2)
        idx.bootstrap(_corpus(spark, 30))
        idx.update(changed=_corpus(spark, 5, base=100), deleted_ids=[4])
        idx.update(deleted_ids=[102])
        states.append(_state(idx))
    assert states[0] == states[1]


def test_randomized_soak_fold_equals_bulk(spark, tmp_path):
    """Seeded random op stream (inserts, updates, deletes, including
    delete-then-reinsert across batches) — after every batch the folded
    index must equal bulk assignment of the live corpus to the frozen
    centroids. SINKER_SOAK_SEED / SINKER_SOAK_BATCHES extend the hunt."""
    import os
    import random

    rng = random.Random(int(os.environ.get("SINKER_SOAK_SEED", "7")))
    n_batches = int(os.environ.get("SINKER_SOAK_BATCHES", "4"))
    dim = 5

    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=3, iterations=2)
    live: dict[int, list[float]] = {
        i: [round(rng.uniform(-2, 2), 3) for _ in range(dim)] for i in range(25)
    }
    idx.bootstrap(_vecs(spark, sorted(live.items())))
    cents = idx.centroids()
    next_id = 1000

    for b in range(n_batches):
        changed, deleted = {}, []
        for _ in range(rng.randint(1, 6)):  # inserts
            changed[next_id] = [round(rng.uniform(-2, 2), 3) for _ in range(dim)]
            next_id += 1
        for vid in rng.sample(sorted(live), min(len(live), rng.randint(0, 3))):
            if rng.random() < 0.5:
                deleted.append(vid)
            else:
                changed[vid] = [round(rng.uniform(-2, 2), 3) for _ in range(dim)]
        idx.update(
            changed=_vecs(spark, sorted(changed.items())) if changed else None,
            deleted_ids=deleted or None,
        )
        for vid in deleted:
            live.pop(vid, None)
        live.update(changed)

        bulk = sorted(
            (r["vec_id"], r["cell"], tuple(round(x, 9) for x in r["vec"]))
            for r in assign_to_centroids(_vecs(spark, sorted(live.items())), cents).collect()
        )
        assert _state(idx) == bulk, f"divergence at batch {b}"


def test_duplicate_id_in_batch_rejected(spark, tmp_path):
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=4, iterations=2)
    idx.bootstrap(_corpus(spark, 20))
    dup = _vecs(spark, [(100, [1.0] * 6), (100, [2.0] * 6)])
    with pytest.raises(ValueError, match="duplicate"):
        idx.update(changed=dup)


def test_empty_and_noop_batches(spark, tmp_path):
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), k=4, iterations=2)
    idx.bootstrap(_corpus(spark, 20))
    before = _state(idx)
    out = idx.update(deleted_ids=[])
    assert out.count() == 0
    assert _state(idx) == before
    # deleting an id that is not present is a no-op, not an error
    idx.update(deleted_ids=[987654])
    assert _state(idx) == before
