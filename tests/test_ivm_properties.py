"""Property-based IVM invariants (hypothesis): for arbitrary keyed
snapshots, snapshot_diff must satisfy the maintenance algebra the engine
relies on:

1. diff(S, S) = ∅                    (no spurious refreshes)
2. apply(old, diff(old, new)) = new  (deltas reconstruct the target)
3. diff(None, S) upserts exactly S   (backfill)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sinker_spark.ivm import DELETE, UPSERT, snapshot_diff

keys = st.text(alphabet="abcdef", min_size=1, max_size=3)
docs = st.text(alphabet="xyz01", min_size=0, max_size=4)
snapshots = st.dictionaries(keys, docs, max_size=12)


def _df(spark, snap: dict[str, str]):
    if not snap:
        return spark.createDataFrame([], "id string, doc string")
    return spark.createDataFrame(list(snap.items()), "id string, doc string")


def _apply(old: dict[str, str], delta_rows) -> dict[str, str]:
    out = dict(old)
    for r in delta_rows:
        if r["op"] == UPSERT:
            out[r["id"]] = r["doc"]
        elif r["op"] == DELETE:
            out.pop(r["id"], None)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(snap=snapshots)
def test_diff_self_is_empty(spark, snap):
    delta = snapshot_diff(_df(spark, snap), _df(spark, snap)).collect()
    assert delta == []


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=snapshots, new=snapshots)
def test_apply_diff_reconstructs_new(spark, old, new):
    delta = snapshot_diff(_df(spark, old), _df(spark, new)).collect()
    assert _apply(old, delta) == new
    # and the delta is minimal: no upsert for unchanged keys
    for r in delta:
        if r["op"] == UPSERT:
            assert old.get(r["id"]) != r["doc"]
        else:
            assert r["id"] in old and r["id"] not in new


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(snap=snapshots)
def test_backfill_diff_is_exact_upsert_set(spark, snap):
    delta = snapshot_diff(None, _df(spark, snap)).collect()
    assert {r["op"] for r in delta} <= {UPSERT}
    assert {(r["id"], r["doc"]) for r in delta} == set(snap.items())
