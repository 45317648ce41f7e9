"""Composed IVM: maintain an AGGREGATE OVER A JOIN — Δ(γ(A⋈B)) — by
piping the delta-join lane's signed multiplicities into the delta-agg
fold. This is the general-view story: the bilinear join rule produces
the view delta, and because the aggregate fold is linear in signed
multiplicities, the composition needs no new machinery — each joined
delta row folds ``__mult`` times.

Scenario: orders(order_id, cust) ⋈ lines(order_id, qty) grouped by cust
→ (n_lines, sum_qty) per customer, maintained through inserts and
deletes on BOTH base tables without ever recomputing the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark import ivm_delta


def _orders(spark, rows):
    return spark.createDataFrame(rows, "order_id bigint, cust string")


def _lines(spark, rows):
    return spark.createDataFrame(rows, "order_id bigint, qty bigint")


def _expected(orders, lines):
    out: dict[str, tuple[int, int]] = {}
    for oid, cust in orders:
        for loid, qty in lines:
            if loid == oid:
                n, s = out.get(cust, (0, 0))
                out[cust] = (n + 1, s + qty)
    return {k: v for k, v in out.items() if v[0] > 0}


_agg_from_join_delta = ivm_delta.join_delta_to_changes


def test_agg_over_join_maintained_through_both_sides(spark):
    orders = [(1, "a"), (2, "a"), (3, "b")]
    lines = [(1, 10), (1, 20), (2, 5), (3, 7)]
    o_df, l_df = _orders(spark, orders), _lines(spark, lines)

    keys, sums = ["cust"], {"sum_qty": "CAST(qty AS DECIMAL(18,0))"}
    joined = o_df.join(l_df, "order_id")
    agg_state = ivm_delta.initial_agg_state(joined, keys, sums)
    o_state = ivm_delta.relation_state(o_df)
    l_state = ivm_delta.relation_state(l_df)

    batches = [
        # batch 1: new line on order 2, delete a line of order 1
        ([], [], [(2, 9, "insert"), (1, 20, "delete")]),
        # batch 2: delete order 3 entirely (and its line), add order 4 for b with a line
        ([(3, "b", "delete"), (4, "b", "insert")], [], [(3, 7, "delete"), (4, 100, "insert")]),
    ]
    cur_orders, cur_lines = list(orders), list(lines)
    for o_ops, _, l_ops in batches:
        o_ch = spark.createDataFrame(
            [(oid, c, op) for oid, c, op in o_ops] or [],
            f"order_id bigint, cust string, {ivm_delta.OP_COL} string",
        )
        l_ch = spark.createDataFrame(
            [(oid, q, op) for oid, q, op in l_ops] or [],
            f"order_id bigint, qty bigint, {ivm_delta.OP_COL} string",
        )
        delta = ivm_delta.join_delta(o_state, l_state, o_ch, l_ch, ["order_id"])
        agg_state = ivm_delta.apply_agg_delta(
            agg_state, _agg_from_join_delta(delta), keys, sums
        )
        o_state = ivm_delta.apply_join_state(o_state, ivm_delta.changes_to_mult(o_ch))
        l_state = ivm_delta.apply_join_state(l_state, ivm_delta.changes_to_mult(l_ch))

        for oid, c, op in o_ops:
            (cur_orders.append if op == "insert" else cur_orders.remove)((oid, c))
        for oid, q, op in l_ops:
            (cur_lines.append if op == "insert" else cur_lines.remove)((oid, q))

        got = {
            r["cust"]: (r[ivm_delta._CNT], int(r["sum_qty"]))
            for r in agg_state.collect()
        }
        assert got == _expected(cur_orders, cur_lines), (got, cur_orders, cur_lines)


def test_composition_handles_fanout_multiplicities(spark):
    """An order delete whose join fan-out is >1 must fold its whole
    multiplicity out of the aggregate (the explode-by-|mult| path)."""
    orders = [(1, "a")]
    lines = [(1, 10), (1, 10), (1, 10)]  # identical rows → multiplicity 3
    o_df, l_df = _orders(spark, orders), _lines(spark, lines)
    keys, sums = ["cust"], {"sum_qty": "CAST(qty AS DECIMAL(18,0))"}
    agg_state = ivm_delta.initial_agg_state(o_df.join(l_df, "order_id"), keys, sums)
    o_state, l_state = ivm_delta.relation_state(o_df), ivm_delta.relation_state(l_df)

    o_ch = spark.createDataFrame([(1, "a", "delete")], f"order_id bigint, cust string, {ivm_delta.OP_COL} string")
    l_ch = spark.createDataFrame([], f"order_id bigint, qty bigint, {ivm_delta.OP_COL} string")
    delta = ivm_delta.join_delta(o_state, l_state, o_ch, l_ch, ["order_id"])
    mults = {r[ivm_delta._MULT] for r in delta.collect()}
    assert mults == {-3}  # one joined row shape, multiplicity −3
    agg_state = ivm_delta.apply_agg_delta(agg_state, _agg_from_join_delta(delta), keys, sums)
    assert agg_state.count() == 0  # customer 'a' vanished entirely
