"""Graph-analytics tests on known small graphs."""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
    connected_components,
    degrees,
    pagerank,
)


@pytest.fixture(scope="module")
def two_components(spark):
    # component {a,b,c,d} (chain) and {x,y} — plus isolated-by-direction edge cases
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    return spark.createDataFrame(edges, "src string, dst string")


def test_degrees(spark, two_components):
    d = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(two_components).collect()}
    assert d["a"] == (1, 0)
    assert d["b"] == (1, 1)
    assert d["d"] == (0, 1)
    assert d["x"] == (1, 0)


def test_connected_components(spark, two_components):
    comp = {r["node"]: r["component"] for r in connected_components(two_components).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_connected_components_cycle(spark):
    edges = [("1", "2"), ("2", "3"), ("3", "1"), ("9", "9")]
    comp = {r["node"]: r["component"] for r in connected_components(spark.createDataFrame(edges, "src string, dst string")).collect()}
    assert comp["1"] == comp["2"] == comp["3"] == "1"
    assert comp["9"] == "9"


def test_pagerank_star(spark):
    # star: spokes all point at hub → hub rank highest; ranks sum ≈ 1
    edges = [(f"s{i}", "hub") for i in range(5)]
    pr = {r["node"]: r["pagerank"] for r in pagerank(spark.createDataFrame(edges, "src string, dst string"), iterations=20).collect()}
    assert pr["hub"] == max(pr.values())
    assert abs(sum(pr.values()) - 1.0) < 1e-3
    spokes = [v for k, v in pr.items() if k != "hub"]
    assert max(spokes) - min(spokes) < 1e-9  # symmetric spokes equal


def test_triangle_counts(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import triangle_counts

    # triangle a-b-c plus pendant c-d (direction/duplication must not matter)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")]
    tri = {r["node"]: r["n_triangles"] for r in triangle_counts(spark.createDataFrame(edges, "src string, dst string")).collect()}
    assert tri == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_k4(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import triangle_counts

    nodes = ["a", "b", "c", "d"]
    edges = [(u, v) for u in nodes for v in nodes if u < v]
    tri = {r["node"]: r["n_triangles"] for r in triangle_counts(spark.createDataFrame(edges, "src string, dst string")).collect()}
    # K4: each node is in C(3,2)=3 triangles
    assert tri == {n: 3 for n in nodes}


def _py_k_core(edges, k):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_k_core_matches_reference_peeler(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import k_core

    # K4 with a pendant chain and a triangle hung off it
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),              # chain peels away
        ("f", "g"), ("g", "h"), ("h", "f"),  # triangle peels at k=3
    ]
    got = {r["node"]: r["core_degree"] for r in k_core(spark.createDataFrame(edges, "src string, dst string"), k=3).collect()}
    assert got == _py_k_core(edges, 3) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_k_core_empty_result(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import k_core

    edges = [("a", "b"), ("b", "c")]
    assert k_core(spark.createDataFrame(edges, "src string, dst string"), k=2).count() == 0


# ---------------------------------------------------------------------------
# shortest_paths (bounded-hop multi-source Bellman-Ford)
# ---------------------------------------------------------------------------

def _sp(spark, edges, sources, rounds=8):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import shortest_paths

    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    s = spark.createDataFrame([(n,) for n in sources], "node string")
    return {r["node"]: r["dist"] for r in shortest_paths(e, s, rounds=rounds).collect()}


def test_shortest_paths_known_graph(spark):
    # a-1-b-1-c and the direct a-5-c shortcut: two hops beat one heavy edge
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0), ("c", "d", 2.0)]
    got = _sp(spark, edges, ["a"])
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 4.0}


def test_shortest_paths_hop_bound(spark):
    # chain a-b-c-d-e, unit weights; rounds=2 reaches only 2 hops out
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "e", 1.0)]
    got = _sp(spark, edges, ["a"], rounds=2)
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}
    # with enough rounds the chain completes
    assert _sp(spark, edges, ["a"], rounds=4)["e"] == 4.0


def test_shortest_paths_odd_rounds_hop_bound(spark):
    """r15 two-round fusion: an odd rounds count runs a trailing
    single-round step (fuse=1), and the hop bound must stay exact —
    rounds=3 reaches exactly 3 hops, never 4."""
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "e", 1.0)]
    got = _sp(spark, edges, ["a"], rounds=3)
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}


def test_shortest_paths_single_round(spark):
    """rounds=1 degenerates the fused pair to one round + probe."""
    edges = [("a", "b", 1.0), ("b", "c", 1.0)]
    assert _sp(spark, edges, ["a"], rounds=1) == {"a": 0.0, "b": 1.0}


def test_shortest_paths_multi_source_min(spark):
    # sources at both ends of a chain: middle node takes the nearer one
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)]
    got = _sp(spark, edges, ["a", "d"])
    assert got == {"a": 0.0, "b": 1.0, "c": 1.0, "d": 0.0}


def test_shortest_paths_parallel_edges_keep_cheapest(spark):
    edges = [("a", "b", 7.0), ("a", "b", 2.0), ("b", "a", 9.0)]
    got = _sp(spark, edges, ["a"])
    assert got == {"a": 0.0, "b": 2.0}


def test_shortest_paths_undirected_relaxation(spark):
    # edge stored one way must relax both ways
    edges = [("b", "a", 3.0)]
    assert _sp(spark, edges, ["a"]) == {"a": 0.0, "b": 3.0}


def test_shortest_paths_empty_sources(spark):
    edges = [("a", "b", 1.0)]
    assert _sp(spark, edges, []) == {}


def test_walk_corpus_multi_walks_diverge(spark):
    """VERDICT r05 #3: the md5 choice is keyed by the walk index, so a
    seed's n_walks walks are genuine repeated samples — on a node with
    several neighbors they must not all collapse to one path."""
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        walk_corpus,
    )

    # star-plus-ring: hub h connects to 6 spokes, spokes form a ring, so
    # every step has real branching
    spokes = [f"s{i}" for i in range(6)]
    edges = [("h", s) for s in spokes] + [
        (spokes[i], spokes[(i + 1) % 6]) for i in range(6)
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("h",)], "node string")

    out = walk_corpus(edf, seeds, steps=4, n_walks=4).collect()
    assert len(out) == 4
    assert {r["walk_id"] for r in out} == {f"h#{w}" for w in range(4)}
    assert all(r["n_nodes"] == 5 for r in out)  # no dead ends here
    paths = {r["path"] for r in out}
    assert len(paths) > 1, paths

    # n_walks=1 keeps the legacy walk_id shape (plain seed)
    one = walk_corpus(edf, seeds, steps=2, n_walks=1).collect()
    assert [r["walk_id"] for r in one] == ["h"]


def test_walk_corpus_deterministic_across_runs(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        walk_corpus,
    )

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    r1 = sorted(tuple(r) for r in walk_corpus(edf, seeds, steps=3, n_walks=2).collect())
    r2 = sorted(tuple(r) for r in walk_corpus(edf, seeds, steps=3, n_walks=2).collect())
    assert r1 == r2
