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


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from sinker_spark.operators.graph import pagerank

    # weighted digraph with a dangling node (3 has no out-edges)
    edges = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0), (1, 3, 3.0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, weight="w", iterations=12).collect()}

    n, d = 4, 0.85
    p = np.zeros((n, n))
    for s, t, w in edges:
        p[s, t] = w
    out = p.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = np.zeros(n)
        dangling = 0.0
        for s in range(n):
            if out[s] > 0:
                contrib += r[s] * p[s] / out[s]
            else:
                dangling += r[s]
        r = (1 - d) / n + d * (contrib + dangling / n)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles, every node in 3; an appended path node joins none."""
    from sinker_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 4)], "u int, v int")
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
    # duplicate + reversed edges must not inflate counts
    edges_dup = spark.createDataFrame(k4 + [(b, a) for a, b in k4], "u int, v int")
    out2 = {r["node"]: r["n_triangles"] for r in triangle_count(edges_dup).collect()}
    assert out2 == {0: 3, 1: 3, 2: 3, 3: 3}


def test_sssp_prefers_cheap_multi_hop_and_respects_bound(spark):
    from sinker_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [
            ("a", "b", 10),  # direct but expensive
            ("a", "c", 1),
            ("c", "b", 2),   # a→c→b = 3 beats direct 10
            ("b", "d", 1),   # d reachable only via b (3 hops from a)
            ("x", "y", 1),   # disconnected from a
        ],
        "src string, dst string, cost bigint",
    )
    d3 = {r["node"]: r["dist"] for r in sssp(edges, "a", rounds=3).collect()}
    assert d3 == {"a": 0, "c": 1, "b": 3, "d": 4}
    # hop bound: with 1 round the 2-hop shortcut is invisible
    d1 = {r["node"]: r["dist"] for r in sssp(edges, "a", rounds=1).collect()}
    assert d1 == {"a": 0, "b": 10, "c": 1}
    # extra rounds beyond convergence change nothing
    d5 = {r["node"]: r["dist"] for r in sssp(edges, "a", rounds=5).collect()}
    assert d5 == d3
