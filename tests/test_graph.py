"""Connected components unit tests: chains, isolated pairs, convergence."""

from __future__ import annotations

from sinker_spark.operators.graph import connected_components


def test_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_components_long_chain_converges(spark):
    # a 30-node path: needs multiple propagation rounds (diameter 29,
    # min-label spreads ~1 hop/round from the head; doubling not assumed)
    edges = spark.createDataFrame([(i, i + 1) for i in range(30)], "id_a bigint, id_b bigint")
    got = {r["node"]: r["component"] for r in connected_components(edges, max_iter=40).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 31
