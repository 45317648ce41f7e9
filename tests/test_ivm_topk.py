"""Incremental top-k view maintenance (sinker_spark/ivm_topk.py): the
buffered top-(k+buffer) state must track a full recompute through
insert/delete batches, absorb deletes inside the buffer, flag
buffer-exhausted groups as dirty, and heal them with a scoped recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark.ivm_delta import OP_COL
from sinker_spark.ivm_topk import (
    apply_topk_delta,
    initial_topk_state,
    recompute_groups,
    topk_view,
)

KEYS = ["grp"]
K, BUF = 3, 2


def _fact(spark, rows):
    return spark.createDataFrame(rows, "grp string, id bigint, score bigint")


def _expected_topk(rows, k=K):
    out = {}
    by_grp: dict[str, list] = {}
    for g, i, s in rows:
        by_grp.setdefault(g, []).append((g, i, s))
    for g, items in by_grp.items():
        items.sort(key=lambda r: (-r[2], r[1]))
        for rank, r in enumerate(items[:k], 1):
            out[(g, r[1])] = (r[2], rank)
    return out


def _view_dict(state):
    return {
        (r["grp"], r["id"]): (r["score"], r["rank"])
        for r in topk_view(state, KEYS, "score", "id", K).collect()
    }


BASE = [
    ("a", i, 100 - i) for i in range(1, 9)  # a: ids 1..8, scores 99..92
] + [
    ("b", i, 10 * i) for i in range(1, 4)  # b: 3 rows (fewer than k+buf)
]


def test_initial_state_and_view(spark):
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    per_grp = {r["grp"]: r["cnt"] for r in rows.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert per_grp == {"a": K + BUF, "b": 3}
    assert {r["grp"]: r["__n_total"] for r in counts.collect()} == {"a": 8, "b": 3}
    assert _view_dict(rows) == _expected_topk(BASE)


def test_insert_fold_matches_recompute(spark):
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    batch_rows = [("a", 100, 95), ("b", 100, 5), ("c", 1, 7)]  # mid-rank, low-rank, new group
    batch = _fact(spark, batch_rows).withColumn(OP_COL, F.lit("insert"))
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0  # inserts never exhaust the buffer
    assert _view_dict(rows2) == _expected_topk(BASE + batch_rows)
    assert {r["grp"]: r["__n_total"] for r in counts2.collect()} == {"a": 9, "b": 4, "c": 1}
    # state stays bounded at k+buffer per group
    assert rows2.groupBy("grp").count().agg(F.max("count")).collect()[0][0] <= K + BUF


def test_delete_within_buffer_absorbed(spark):
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    # delete a's rank-1 row (id=1): buffer row id=4 backfills rank 3
    batch = _fact(spark, [("a", 1, 99)]).withColumn(OP_COL, F.lit("delete"))
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0
    remaining = [r for r in BASE if not (r[0] == "a" and r[1] == 1)]
    assert _view_dict(rows2) == _expected_topk(remaining)
    assert {r["grp"]: r["__n_total"] for r in counts2.collect()}["a"] == 7


def test_delete_of_unstored_row_only_decrements_count(spark):
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    # a's id=8 (score 92) ranks 8th — outside k+buffer=5, not stored
    stored_ids = {r["id"] for r in rows.where("grp = 'a'").collect()}
    assert 8 not in stored_ids
    batch = _fact(spark, [("a", 8, 92)]).withColumn(OP_COL, F.lit("delete"))
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0
    assert {r["id"] for r in rows2.where("grp = 'a'").collect()} == stored_ids
    assert {r["grp"]: r["__n_total"] for r in counts2.collect()}["a"] == 7


def test_buffer_exhaustion_flags_dirty_and_scoped_recompute_heals(spark):
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    # delete a's entire stored set (ids 1..5): 3 fact rows remain (6,7,8)
    # but the state kept none of them → dirty
    dels = [("a", i, 100 - i) for i in range(1, 6)]
    batch = _fact(spark, dels).withColumn(OP_COL, F.lit("delete"))
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert [r["grp"] for r in dirty.collect()] == ["a"]
    # untouched group b is exact even while a is dirty
    assert {k: v for k, v in _view_dict(rows2).items() if k[0] == "b"} == {
        k: v for k, v in _expected_topk(BASE).items() if k[0] == "b"
    }
    # heal: scoped recompute against the post-batch fact relation
    remaining = [r for r in BASE if r not in dels]
    rows3 = recompute_groups(rows2, _fact(spark, remaining), dirty, KEYS, "score", "id", K, BUF)
    assert _view_dict(rows3) == _expected_topk(remaining)


def test_update_as_delete_insert(spark):
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    # b's id=1 score 10 → 999 (promotes to rank 1)
    batch = spark.createDataFrame(
        [("b", 1, 10, "delete"), ("b", 1, 999, "insert")],
        f"grp string, id bigint, score bigint, {OP_COL} string",
    )
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0
    updated = [r for r in BASE if not (r[0] == "b" and r[1] == 1)] + [("b", 1, 999)]
    assert _view_dict(rows2) == _expected_topk(updated)
    assert {r["grp"]: r["__n_total"] for r in counts2.collect()}["b"] == 3


def test_random_batches_match_recompute(spark):
    """Property-style soak: fold 3 random-ish (but deterministic) mixed
    batches, healing dirty groups after each, and compare the served view
    against a full top-k recompute every step."""
    import random

    rng = random.Random(7)
    live = {(g, i): (g, i, rng.randrange(1000)) for g in "abcd" for i in range(1, 11)}
    fact_rows = list(live.values())
    rows, counts = initial_topk_state(_fact(spark, fact_rows), KEYS, "score", "id", K, BUF)
    next_id = 100
    for _ in range(3):
        ops = []
        for _ in range(6):
            if live and rng.random() < 0.5:
                key = rng.choice(sorted(live))
                ops.append((*live.pop(key), "delete"))
            else:
                g = rng.choice("abcd")
                row = (g, next_id, rng.randrange(1000))
                next_id += 1
                live[(g, row[1])] = row
                ops.append((*row, "insert"))
        batch = spark.createDataFrame(ops, f"grp string, id bigint, score bigint, {OP_COL} string")
        rows, counts, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
        fact_now = _fact(spark, list(live.values()))
        if dirty.count() > 0:
            rows = recompute_groups(rows, fact_now, dirty, KEYS, "score", "id", K, BUF)
        assert _view_dict(rows) == _expected_topk(list(live.values()))
        assert {r["grp"]: r["__n_total"] for r in counts.collect()} == {
            g: n
            for g, n in (
                (g, sum(1 for (gg, _i) in live if gg == g)) for g in "abcd"
            )
            if n > 0
        }


def test_inserts_cannot_mask_evicted_rows(spark):
    """Regression: deletes evict stored rows while same-batch inserts
    refill the stored COUNT with lower-ranked rows — the group must still
    go dirty, because the evicted unknown row (id=6, never stored)
    outranks the inserts and belongs in the true top-3."""
    fact = _fact(spark, BASE)
    rows, counts = initial_topk_state(fact, KEYS, "score", "id", K, BUF)
    batch = spark.createDataFrame(
        [
            ("a", 1, 99, "delete"),
            ("a", 2, 98, "delete"),
            ("a", 3, 97, "delete"),
            ("a", 200, 1, "insert"),
            ("a", 201, 2, "insert"),
        ],
        f"grp string, id bigint, score bigint, {OP_COL} string",
    )
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert [r["grp"] for r in dirty.collect()] == ["a"]
    remaining = [r for r in BASE if r[1] > 3 or r[0] == "b"] + [("a", 200, 1), ("a", 201, 2)]
    rows3 = recompute_groups(rows2, _fact(spark, remaining), dirty, KEYS, "score", "id", K, BUF)
    assert _view_dict(rows3) == _expected_topk(remaining)


def test_multibatch_inserts_cannot_inflate_coverage(spark):
    """Regression (multi-batch unsoundness): batch 1 deletes 2 of a's
    top rows and inserts 5 low-score rows — deletes stay inside the
    buffer (s_old=3 >= k) so the group is rightly NOT dirty, but the
    low inserts rank below a's never-stored rows (scores 94/93/92) and
    must NOT be folded into the stored prefix. Batch 2 then deletes one
    more top row: coverage drops to 2 < k and the group MUST go dirty
    (the old code counted the batch-1 inserts as coverage, skipped the
    dirty flag, and served a score-5 insert over the true 94/93/92)."""
    live = {(g, i): s for (g, i, s) in BASE}
    rows, counts = initial_topk_state(_fact(spark, BASE), KEYS, "score", "id", K, BUF)

    batch1_ops = [("a", 1, 99, "delete"), ("a", 2, 98, "delete")] + [
        ("a", 300 + j, j + 1, "insert") for j in range(5)  # scores 1..5
    ]
    batch1 = spark.createDataFrame(batch1_ops, f"grp string, id bigint, score bigint, {OP_COL} string")
    rows, counts, dirty = apply_topk_delta(rows, counts, batch1, KEYS, "score", "id", K, BUF)
    for g, i, s, op in batch1_ops:
        live.pop((g, i), None) if op == "delete" else live.__setitem__((g, i), s)
    assert dirty.count() == 0  # s_old=3 >= k: served top-3 {97,96,95} is exact
    assert _view_dict(rows) == _expected_topk([(g, i, s) for (g, i), s in live.items()])
    # the low inserts must not be sitting in the stored state as fake buffer
    stored_a = {r["id"] for r in rows.where("grp = 'a'").collect()}
    assert stored_a == {3, 4, 5}, stored_a

    batch2 = _fact(spark, [("a", 3, 97)]).withColumn(OP_COL, F.lit("delete"))
    rows, counts, dirty = apply_topk_delta(rows, counts, batch2, KEYS, "score", "id", K, BUF)
    live.pop(("a", 3))
    assert [r["grp"] for r in dirty.collect()] == ["a"]  # coverage 2 < k
    fact_now = _fact(spark, [(g, i, s) for (g, i), s in live.items()])
    rows = recompute_groups(rows, fact_now, dirty, KEYS, "score", "id", K, BUF)
    served = _view_dict(rows)
    assert served == _expected_topk([(g, i, s) for (g, i), s in live.items()])
    # the healed top-3 is 96/95/94 — never a batch-1 low insert
    assert {v[0] for k, v in served.items() if k[0] == "a"} == {96, 95, 94}


def test_insert_above_watermark_extends_prefix(spark):
    """An insert that outranks the weakest stored row IS admitted and
    genuinely extends coverage: after deletes shrink the buffer, such an
    insert keeps the group clean where a below-watermark insert would
    not have."""
    rows, counts = initial_topk_state(_fact(spark, BASE), KEYS, "score", "id", K, BUF)
    # delete a's ranks 1-2 (buffer absorbs), insert score 98.5-ish (98 ties
    # broken by id) above the new watermark (95, id=5)
    batch = spark.createDataFrame(
        [("a", 1, 99, "delete"), ("a", 2, 98, "delete"), ("a", 400, 98, "insert")],
        f"grp string, id bigint, score bigint, {OP_COL} string",
    )
    rows, counts, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0
    live = [r for r in BASE if not (r[0] == "a" and r[1] in (1, 2))] + [("a", 400, 98)]
    assert _view_dict(rows) == _expected_topk(live)
    # coverage grew to 4: one more delete still doesn't trip dirty
    batch2 = _fact(spark, [("a", 400, 98)]).withColumn(OP_COL, F.lit("delete"))
    rows, counts, dirty = apply_topk_delta(rows, counts, batch2, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0
    live = [r for r in live if r[1] != 400]
    assert _view_dict(rows) == _expected_topk(live)


def test_adversarial_soak_tight_buffer(spark):
    """8 mixed batches at k=2, buffer=1 with delete-heavy phases — the
    regime that exposed the multi-batch coverage bug (inserts repeatedly
    landing below never-stored rows while deletes chew the buffer).
    Served view must equal a full recompute after healing EVERY batch,
    and the prefix invariant must hold: each group's stored rows are
    exactly the true top-s for s = stored count."""
    import random

    K2, BUF1 = 2, 1
    rng = random.Random(1234)
    live = {(g, i): (g, i, rng.randrange(100)) for g in "ab" for i in range(1, 13)}
    rows, counts = initial_topk_state(
        _fact(spark, list(live.values())), KEYS, "score", "id", K2, BUF1
    )
    next_id = 1000
    for batch_no in range(8):
        ops = []
        # delete-heavy in even batches: target the CURRENT top rows
        if batch_no % 2 == 0:
            by_grp = {}
            for (g, i), row in live.items():
                by_grp.setdefault(g, []).append(row)
            for g, items in by_grp.items():
                items.sort(key=lambda r: (-r[2], r[1]))
                for row in items[:2]:
                    ops.append((*row, "delete"))
                    live.pop((row[0], row[1]))
            # plus low-score inserts trying to masquerade as buffer
            for g in "ab":
                row = (g, next_id, rng.randrange(3))
                next_id += 1
                live[(g, row[1])] = row
                ops.append((*row, "insert"))
        else:
            for _ in range(4):
                g = rng.choice("ab")
                row = (g, next_id, rng.randrange(100))
                next_id += 1
                live[(g, row[1])] = row
                ops.append((*row, "insert"))
        batch = spark.createDataFrame(ops, f"grp string, id bigint, score bigint, {OP_COL} string")
        rows, counts, dirty = apply_topk_delta(
            rows, counts, batch, KEYS, "score", "id", K2, BUF1
        )
        fact_now = _fact(spark, list(live.values()))
        if dirty.count() > 0:
            rows = recompute_groups(rows, fact_now, dirty, KEYS, "score", "id", K2, BUF1)
        # pin state per batch (the runner does the same via the snapshot
        # store) — otherwise 8 chained folds stack an exponential plan
        rows = rows.localCheckpoint(eager=True)
        counts = counts.localCheckpoint(eager=True)
        served = {
            (r["grp"], r["id"]): (r["score"], r["rank"])
            for r in topk_view(rows, KEYS, "score", "id", K2).collect()
        }
        assert served == _expected_topk(list(live.values()), k=K2), batch_no
        # prefix invariant: stored set == true top-s per group
        stored = {}
        for r in rows.collect():
            stored.setdefault(r["grp"], []).append((r["grp"], r["id"], r["score"]))
        by_grp = {}
        for row in live.values():
            by_grp.setdefault(row[0], []).append(row)
        for g, st in stored.items():
            items = sorted(by_grp.get(g, []), key=lambda r: (-r[2], r[1]))
            want = set((x[0], x[1]) for x in items[: len(st)])
            got = set((x[0], x[1]) for x in st)
            assert got == want, (batch_no, g, got, want)


def test_same_batch_create_and_drop_leaves_no_phantom(spark):
    """A row inserted AND deleted within one batch (created and dropped
    between polls) must vanish entirely: before the multiset net-out,
    the delete only anti-joined the old stored rows, so the insert folded
    a phantom high-scoring row into the state and the served top-3."""
    rows, counts = initial_topk_state(_fact(spark, BASE), KEYS, "score", "id", K, BUF)
    batch = spark.createDataFrame(
        [("a", 500, 98, "insert"), ("a", 500, 98, "delete"),  # create+drop
         ("b", 1, 10, "delete"), ("b", 1, 10, "insert")],     # no-op update
        f"grp string, id bigint, score bigint, {OP_COL} string",
    )
    rows2, counts2, dirty = apply_topk_delta(rows, counts, batch, KEYS, "score", "id", K, BUF)
    assert dirty.count() == 0
    assert _view_dict(rows2) == _expected_topk(BASE)  # nothing changed
    assert 500 not in {r["id"] for r in rows2.where("grp = 'a'").collect()}
    assert {r["grp"]: r["__n_total"] for r in counts2.collect()} == {"a": 8, "b": 3}
