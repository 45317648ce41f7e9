"""Delta aggregate maintenance (ivm_delta): folding signed CDC batches
into aggregate state must equal recomputing from scratch, for any
insert/delete sequence."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sinker_spark.ivm_delta import (
    DELETE,
    INSERT,
    apply_agg_delta,
    dirty_minmax_groups,
    initial_agg_state,
)

KEYS = ["grp"]
SUMS = {"sum_v": "v_dec"}


def _df(spark, rows):
    df = spark.createDataFrame(rows, "rid bigint, grp string, v double")
    return df.withColumn("v_dec", F.col("v").cast("decimal(18,2)"))


def _state_rows(state):
    return {
        r["grp"]: (r["__cnt"], float(r["sum_v"] or 0))
        for r in state.collect()
    }


def _expected(rows):
    out = {}
    for _, grp, v in rows:
        cnt, s = out.get(grp, (0, 0.0))
        out[grp] = (cnt + 1, round(s + v, 2))
    return {g: (c, s) for g, (c, s) in out.items() if c > 0}


def test_insert_delete_fold_matches_recompute(spark):
    base = [(i, f"g{i % 3}", float(i)) for i in range(30)]
    state = initial_agg_state(_df(spark, base), KEYS, SUMS)

    rng = random.Random(7)
    live = dict((r[0], r) for r in base)
    batch_rows, ops = [], []
    for rid in range(30, 45):  # inserts
        row = (rid, f"g{rng.randrange(4)}", float(rng.randrange(100)))
        live[rid] = row
        batch_rows.append(row)
        ops.append(INSERT)
    for rid in rng.sample(sorted(k for k in live if k < 30), 10):  # deletes
        batch_rows.append(live.pop(rid))
        ops.append(DELETE)

    # attach ops positionally via a join on rid (a rid can appear once as
    # insert and once as delete only in update batches, not here)
    ops_df = spark.createDataFrame(
        [(r[0], op) for r, op in zip(batch_rows, ops)], "rid bigint, __op string"
    )
    batch = _df(spark, batch_rows).join(ops_df, "rid")

    new_state = apply_agg_delta(state, batch, KEYS, SUMS)
    got = _state_rows(new_state)
    want = _expected(list(live.values()))
    assert {g: c for g, (c, _) in got.items()} == {g: c for g, (c, _) in want.items()}
    for g in want:
        assert abs(got[g][1] - want[g][1]) < 1e-9


def test_update_as_delete_plus_insert(spark):
    base = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)]
    state = initial_agg_state(_df(spark, base), KEYS, SUMS)
    # update row 2: v 20.0 -> 25.0 (delete old image, insert new image)
    batch = _df(spark, [(2, "a", 20.0), (2, "a", 25.0)]).withColumn(
        "__op", F.when(F.col("v") == 20.0, F.lit(DELETE)).otherwise(F.lit(INSERT))
    )
    got = _state_rows(apply_agg_delta(state, batch, KEYS, SUMS))
    assert got["a"] == (2, 35.0)
    assert got["b"] == (1, 5.0)


def test_group_vanishes_when_count_hits_zero(spark):
    base = [(1, "a", 10.0), (2, "b", 20.0)]
    state = initial_agg_state(_df(spark, base), KEYS, SUMS)
    batch = _df(spark, [(2, "b", 20.0)]).withColumn("__op", F.lit(DELETE))
    got = _state_rows(apply_agg_delta(state, batch, KEYS, SUMS))
    assert "b" not in got and got["a"] == (1, 10.0)


def test_new_group_appears_via_insert(spark):
    base = [(1, "a", 10.0)]
    state = initial_agg_state(_df(spark, base), KEYS, SUMS)
    batch = _df(spark, [(9, "z", 7.5)]).withColumn("__op", F.lit(INSERT))
    got = _state_rows(apply_agg_delta(state, batch, KEYS, SUMS))
    assert got["z"] == (1, 7.5)


def test_dirty_minmax_only_delete_groups(spark):
    batch = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]).withColumn(
        "__op", F.when(F.col("grp") == "b", F.lit(DELETE)).otherwise(F.lit(INSERT))
    )
    dirty = {r["grp"] for r in dirty_minmax_groups(batch, KEYS).collect()}
    assert dirty == {"b"}


def _mrows(df):
    rows = (tuple(r[c] for c in sorted(df.columns)) for r in df.collect())
    # None-safe sort: NULL key/value columns are legal in the outer-join lanes
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def test_join_delta_matches_recompute_randomized(spark):
    from sinker_spark.ivm_delta import apply_join_state, initial_join_state, join_delta

    rng = random.Random(11)
    # bag-semantics tables: duplicate keys AND duplicate full rows on purpose
    a_old = [(rng.randint(0, 5), rng.randint(0, 2)) for _ in range(25)]
    b_old = [(rng.randint(0, 5), rng.choice("xyz")) for _ in range(20)]
    a_ins = [(rng.randint(0, 5), rng.randint(0, 2)) for _ in range(6)]
    a_del = rng.sample(a_old, 4)
    b_ins = [(rng.randint(0, 5), rng.choice("xyz")) for _ in range(5)]
    b_del = rng.sample(b_old, 3)

    a_new = list(a_old)
    for r in a_del:
        a_new.remove(r)
    a_new += a_ins
    b_new = list(b_old)
    for r in b_del:
        b_new.remove(r)
    b_new += b_ins

    A = lambda rows: spark.createDataFrame(rows, "k int, x int")  # noqa: E731
    B = lambda rows: spark.createDataFrame(rows, "k int, y string")  # noqa: E731
    ach = spark.createDataFrame(
        [(k, x, INSERT) for k, x in a_ins] + [(k, x, DELETE) for k, x in a_del],
        "k int, x int, __op string",
    )
    bch = spark.createDataFrame(
        [(k, y, INSERT) for k, y in b_ins] + [(k, y, DELETE) for k, y in b_del],
        "k int, y string, __op string",
    )

    state = initial_join_state(A(a_old), B(b_old), ["k"])
    delta = join_delta(A(a_old), B(b_old), ach, bch, ["k"])
    got = apply_join_state(state, delta)
    want = initial_join_state(A(a_new), B(b_new), ["k"])
    assert _mrows(got) == _mrows(want)


def test_join_delta_empty_batch_is_empty(spark):
    from sinker_spark.ivm_delta import join_delta

    a = spark.createDataFrame([(1, 10)], "k int, x int")
    b = spark.createDataFrame([(1, "x")], "k int, y string")
    empty_a = spark.createDataFrame([], "k int, x int, __op string")
    empty_b = spark.createDataFrame([], "k int, y string, __op string")
    assert join_delta(a, b, empty_a, empty_b, ["k"]).count() == 0


def test_join_delta_to_changes_drops_net_zero_multiplicity(spark):
    """Regression: m=0 rows must yield NO change rows — sequence(1, 0)
    defaults to a descending step and would emit [1, 0], i.e. two
    spurious delete-tagged copies, for any caller that doesn't pre-filter
    the way join_delta does."""
    from sinker_spark.ivm_delta import DELETE, INSERT, join_delta_to_changes

    delta = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 2), (3, "c", -1)], "k int, v string, __mult bigint"
    )
    got = sorted(
        (r["k"], r["v"], r["__op"]) for r in join_delta_to_changes(delta).collect()
    )
    assert got == [(2, "b", INSERT), (2, "b", INSERT), (3, "c", DELETE)]


# -- min/max hybrid fold (fold_agg_minmax / recompute_agg_groups) ---------

from sinker_spark.ivm_delta import fold_agg_minmax, recompute_agg_groups  # noqa: E402

MM_KEYS = ["grp"]
MM_SUMS = {"sum_v": "v_dec"}
MM_MAXES = {"max_v": "v"}
MM_MINS = {"min_v": "v"}


def _mm_state(spark, rows):
    return initial_agg_state(_df(spark, rows), MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)


def _mm_rows(state):
    return {
        r["grp"]: (r["__cnt"], float(r["sum_v"] or 0), r["max_v"], r["min_v"])
        for r in state.collect()
    }


def _mm_expected(rows):
    out = {}
    for _, grp, v in rows:
        c, s, mx, mn = out.get(grp, (0, 0.0, None, None))
        out[grp] = (c + 1, round(s + v, 2), v if mx is None else max(mx, v), v if mn is None else min(mn, v))
    return out


def _mm_batch(spark, rows, ops):
    tagged = [(rid, grp, v, op) for (rid, grp, v), op in zip(rows, ops)]
    df = spark.createDataFrame(tagged, "rid bigint, grp string, v double, __op string")
    return df.withColumn("v_dec", F.col("v").cast("decimal(18,2)"))


def test_minmax_insert_only_is_exact_and_clean(spark):
    base = [(1, "g0", 10.0), (2, "g0", 20.0), (3, "g1", 5.0)]
    state = _mm_state(spark, base)
    batch = _mm_batch(spark, [(4, "g0", 25.0), (5, "g1", 1.0)], [INSERT, INSERT])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert dirty.count() == 0
    assert _mm_rows(new) == _mm_expected(base + [(4, "g0", 25.0), (5, "g1", 1.0)])


def test_minmax_delete_below_extremes_not_dirty(spark):
    base = [(1, "g0", 10.0), (2, "g0", 20.0), (3, "g0", 15.0)]
    state = _mm_state(spark, base)
    batch = _mm_batch(spark, [(3, "g0", 15.0)], [DELETE])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert dirty.count() == 0
    assert _mm_rows(new) == _mm_expected([(1, "g0", 10.0), (2, "g0", 20.0)])


def test_minmax_delete_of_max_dirty_and_heals(spark):
    base = [(1, "g0", 10.0), (2, "g0", 20.0), (3, "g0", 15.0)]
    state = _mm_state(spark, base)
    batch = _mm_batch(spark, [(2, "g0", 20.0)], [DELETE])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert [r["grp"] for r in dirty.collect()] == ["g0"]
    survivors = [(1, "g0", 10.0), (3, "g0", 15.0)]
    healed = recompute_agg_groups(
        new, _df(spark, survivors), dirty, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS
    )
    assert _mm_rows(healed) == _mm_expected(survivors)


def test_minmax_insert_recovers_deleted_max_not_dirty(spark):
    base = [(1, "g0", 10.0), (2, "g0", 20.0)]
    state = _mm_state(spark, base)
    batch = _mm_batch(spark, [(2, "g0", 20.0), (9, "g0", 30.0)], [DELETE, INSERT])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert dirty.count() == 0
    assert _mm_rows(new) == _mm_expected([(1, "g0", 10.0), (9, "g0", 30.0)])


def test_minmax_same_batch_phantom_cannot_raise_candidate(spark):
    base = [(1, "g0", 10.0)]
    state = _mm_state(spark, base)
    # insert(99.0) + delete(99.0) of the SAME row nets to zero: the
    # candidate max must stay 10.0, not 99.0
    batch = _mm_batch(spark, [(7, "g0", 99.0), (7, "g0", 99.0)], [INSERT, DELETE])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert dirty.count() == 0
    assert _mm_rows(new) == _mm_expected(base)


def test_minmax_duplicate_extreme_delete_is_conservatively_dirty(spark):
    base = [(1, "g0", 20.0), (2, "g0", 20.0), (3, "g0", 5.0)]
    state = _mm_state(spark, base)
    batch = _mm_batch(spark, [(2, "g0", 20.0)], [DELETE])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert [r["grp"] for r in dirty.collect()] == ["g0"]  # equality window
    survivors = [(1, "g0", 20.0), (3, "g0", 5.0)]
    healed = recompute_agg_groups(
        new, _df(spark, survivors), dirty, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS
    )
    assert _mm_rows(healed) == _mm_expected(survivors)  # max still 20.0


def test_minmax_delete_of_min_dirty_and_heals(spark):
    base = [(1, "g0", 10.0), (2, "g0", 20.0)]
    state = _mm_state(spark, base)
    batch = _mm_batch(spark, [(1, "g0", 10.0)], [DELETE])
    new, dirty = fold_agg_minmax(state, batch, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS)
    assert [r["grp"] for r in dirty.collect()] == ["g0"]
    survivors = [(2, "g0", 20.0)]
    healed = recompute_agg_groups(
        new, _df(spark, survivors), dirty, MM_KEYS, MM_SUMS, MM_MAXES, MM_MINS
    )
    assert _mm_rows(healed) == _mm_expected(survivors)


# -- left-outer-join delta (left_join_delta) ------------------------------


def _loj_tables(spark, a_rows, b_rows):
    A = spark.createDataFrame(a_rows, "k int, x int")
    B = spark.createDataFrame(b_rows, "k int, y string")
    return A, B


def _loj_changes(spark, a_ins, a_del, b_ins, b_del):
    ach = spark.createDataFrame(
        [(k, x, INSERT) for k, x in a_ins] + [(k, x, DELETE) for k, x in a_del],
        "k int, x int, __op string",
    )
    bch = spark.createDataFrame(
        [(k, y, INSERT) for k, y in b_ins] + [(k, y, DELETE) for k, y in b_del],
        "k int, y string, __op string",
    )
    return ach, bch


def _loj_roundtrip(spark, a_old, b_old, a_ins, a_del, b_ins, b_del):
    from sinker_spark.ivm_delta import (
        apply_join_state,
        initial_left_join_state,
        left_join_delta,
    )

    a_new = list(a_old)
    for r in a_del:
        a_new.remove(r)
    a_new += a_ins
    b_new = list(b_old)
    for r in b_del:
        b_new.remove(r)
    b_new += b_ins

    A_old, B_old = _loj_tables(spark, a_old, b_old)
    ach, bch = _loj_changes(spark, a_ins, a_del, b_ins, b_del)
    state = initial_left_join_state(A_old, B_old, ["k"])
    delta = left_join_delta(A_old, B_old, ach, bch, ["k"])
    got = apply_join_state(state, delta)
    A_new, B_new = _loj_tables(spark, a_new, b_new)
    want = initial_left_join_state(A_new, B_new, ["k"])
    assert _mrows(got) == _mrows(want)


def test_loj_first_match_retracts_pad(spark):
    _loj_roundtrip(
        spark,
        a_old=[(1, 10), (1, 11), (2, 20)],
        b_old=[(2, "x")],
        a_ins=[], a_del=[],
        b_ins=[(1, "y")],  # key 1: 0 -> 1 match; both pads retract
        b_del=[],
    )


def test_loj_last_match_loss_restores_pads(spark):
    _loj_roundtrip(
        spark,
        a_old=[(1, 10), (1, 11), (2, 20)],
        b_old=[(1, "x"), (1, "y"), (2, "z")],
        a_ins=[], a_del=[],
        b_ins=[],
        b_del=[(1, "x"), (1, "y")],  # key 1: 2 -> 0; pads return
    )


def test_loj_insert_at_unmatched_key_pads(spark):
    _loj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x")],
        a_ins=[(5, 50)], a_del=[],  # key 5 has no matches -> padded row
        b_ins=[], b_del=[],
    )


def test_loj_simultaneous_a_insert_and_b_loss(spark):
    _loj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x")],
        a_ins=[(1, 11)], a_del=[],
        b_ins=[], b_del=[(1, "x")],  # key crosses to 0 WITH a new a-row
    )


def test_loj_delete_left_row_at_unmatched_key(spark):
    _loj_roundtrip(
        spark,
        a_old=[(1, 10), (5, 50)],
        b_old=[(1, "x")],
        a_ins=[], a_del=[(5, 50)],  # padded row retracts with its a-row
        b_ins=[], b_del=[],
    )


def test_loj_randomized_matches_recompute(spark):
    rng = random.Random(13)
    a_old = [(rng.randint(0, 7), rng.randint(0, 2)) for _ in range(25)]
    b_old = [(rng.randint(0, 4), rng.choice("xyz")) for _ in range(12)]
    a_ins = [(rng.randint(0, 7), rng.randint(0, 2)) for _ in range(6)]
    a_del = rng.sample(a_old, 4)
    b_ins = [(rng.randint(0, 7), rng.choice("xyz")) for _ in range(4)]
    victim = b_old[0][0]  # force a >0 -> 0 crossing: drop ALL rows at one key
    b_del = [r for r in b_old if r[0] == victim] + rng.sample(
        [r for r in b_old if r[0] != victim], 2
    )
    _loj_roundtrip(spark, a_old, b_old, a_ins, a_del, b_ins, b_del)


def test_loj_lazy_composition_groups_correctly(spark):
    """Regression pin for a Spark 4.1.2 wrong-results optimizer bug:
    FoldablePropagation mis-propagates the per-branch literal
    ``__matched`` grouping column through the union of state and delta,
    leaving duplicate-key rows that never merge (the ±mult pair fails
    to cancel). The session excludes the rule (session.py); this pin
    fails if the exclusion is ever dropped while the bug is alive —
    checkpointing the delta also masks it, so the roundtrip here runs
    the fully LAZY composition on purpose."""
    assert "FoldablePropagation" in (
        spark.conf.get("spark.sql.optimizer.excludedRules", "") or ""
    )
    _loj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x")],
        a_ins=[(1, 11)], a_del=[],
        b_ins=[], b_del=[(1, "x")],
    )


# -- full-outer-join delta (full_join_delta) ------------------------------


def _foj_roundtrip(spark, a_old, b_old, a_ins, a_del, b_ins, b_del):
    from sinker_spark.ivm_delta import (
        apply_join_state,
        initial_full_join_state,
        full_join_delta,
    )

    a_new = list(a_old)
    for r in a_del:
        a_new.remove(r)
    a_new += a_ins
    b_new = list(b_old)
    for r in b_del:
        b_new.remove(r)
    b_new += b_ins

    A_old, B_old = _loj_tables(spark, a_old, b_old)
    ach, bch = _loj_changes(spark, a_ins, a_del, b_ins, b_del)
    state = initial_full_join_state(A_old, B_old, ["k"])
    delta = full_join_delta(A_old, B_old, ach, bch, ["k"]).localCheckpoint(eager=True)
    got = apply_join_state(state, delta)
    A_new, B_new = _loj_tables(spark, a_new, b_new)
    want = initial_full_join_state(A_new, B_new, ["k"])
    assert _mrows(got) == _mrows(want)


def test_foj_b_only_key_pads_right_side(spark):
    _foj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x"), (9, "z")],  # key 9 has no left rows -> b-pad
        a_ins=[], a_del=[],
        b_ins=[(9, "w")], b_del=[],  # more b rows at the a-less key
    )


def test_foj_deleting_last_left_row_pads_b_side(spark):
    _foj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x"), (1, "y")],
        a_ins=[], a_del=[(1, 10)],  # A-count 1 -> 0: b rows re-pad
        b_ins=[], b_del=[],
    )


def test_foj_first_left_row_retracts_b_pads(spark):
    _foj_roundtrip(
        spark,
        a_old=[(2, 20)],
        b_old=[(1, "x"), (1, "y")],  # key 1 starts b-padded
        a_ins=[(1, 11)], a_del=[],  # first left row: b-pads retract
        b_ins=[], b_del=[],
    )


def test_foj_randomized_matches_recompute(spark):
    rng = random.Random(29)
    a_old = [(rng.randint(0, 5), rng.randint(0, 2)) for _ in range(18)]
    b_old = [(rng.randint(3, 9), rng.choice("xyz")) for _ in range(15)]  # keys 6..9 b-only
    a_ins = [(rng.randint(0, 9), rng.randint(0, 2)) for _ in range(5)]
    a_del = rng.sample(a_old, 3)
    b_ins = [(rng.randint(0, 9), rng.choice("xyz")) for _ in range(4)]
    victim = b_old[0][0]
    b_del = [r for r in b_old if r[0] == victim] + rng.sample(
        [r for r in b_old if r[0] != victim], 2
    )
    _foj_roundtrip(spark, a_old, b_old, a_ins, a_del, b_ins, b_del)


# -- NULL join keys in the outer-join deltas ------------------------------
#
# SQL equality is null-unsafe: a NULL-key row can never match, so it is
# ALWAYS served padded. Regression for the _pad_delta null-key drop: the
# key-crossing machinery routes rows through left-semi joins on the join
# key, and a semi-join with a NULL key matches nothing — before the fix a
# NULL-key insert's pad was silently dropped (the row never reached the
# view) and a NULL-key delete could not retract its pad.


def test_loj_null_key_insert_always_pads(spark):
    _loj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x")],
        a_ins=[(None, 99)], a_del=[],  # NULL key: must appear padded
        b_ins=[], b_del=[],
    )


def test_loj_null_key_delete_retracts_pad(spark):
    _loj_roundtrip(
        spark,
        a_old=[(None, 10), (1, 11)],
        b_old=[(1, "x")],
        a_ins=[], a_del=[(None, 10)],  # NULL-key pad must retract
        b_ins=[], b_del=[],
    )


def test_loj_null_key_b_rows_never_match(spark):
    # NULL-key B rows must not count toward any A key's match count
    _loj_roundtrip(
        spark,
        a_old=[(None, 10)],
        b_old=[],
        a_ins=[], a_del=[],
        b_ins=[(None, "x")], b_del=[],  # must NOT retract the a-side pad
    )


def test_foj_null_key_rows_pad_both_sides(spark):
    _foj_roundtrip(
        spark,
        a_old=[(1, 10)],
        b_old=[(1, "x")],
        a_ins=[(None, 99)], a_del=[],
        b_ins=[(None, "n")], b_del=[],  # each side's NULL rows pad, never join
    )


def test_foj_null_key_randomized_matches_recompute(spark):
    rng = random.Random(41)
    keys = [None, 1, 2, 3]
    a_old = [(rng.choice(keys), rng.randint(0, 2)) for _ in range(14)]
    b_old = [(rng.choice(keys), rng.choice("xyz")) for _ in range(12)]
    a_ins = [(rng.choice(keys), rng.randint(0, 2)) for _ in range(5)]
    a_del = rng.sample(a_old, 4)
    b_ins = [(rng.choice(keys), rng.choice("xyz")) for _ in range(4)]
    b_del = rng.sample(b_old, 4)
    _foj_roundtrip(spark, a_old, b_old, a_ins, a_del, b_ins, b_del)


def test_loj_null_key_randomized_matches_recompute(spark):
    rng = random.Random(43)
    keys = [None, 1, 2]
    a_old = [(rng.choice(keys), rng.randint(0, 2)) for _ in range(12)]
    b_old = [(rng.choice(keys), rng.choice("xyz")) for _ in range(10)]
    a_ins = [(rng.choice(keys), rng.randint(0, 2)) for _ in range(4)]
    a_del = rng.sample(a_old, 3)
    b_ins = [(rng.choice(keys), rng.choice("xyz")) for _ in range(3)]
    b_del = rng.sample(b_old, 3)
    _loj_roundtrip(spark, a_old, b_old, a_ins, a_del, b_ins, b_del)
