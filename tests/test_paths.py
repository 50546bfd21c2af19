"""Path kernels vs the reference's own test graph
(``analytics.rs:492-520``: A-B, A-C, B-C, B-D, C-D, weight 1.0)."""

from graphrag_rs_ray.functions.paths import (
    all_paths, build_adjacency, shortest_path, top_degree_nodes)

EDGES = [("A", "B", 1.0), ("A", "C", 1.0), ("B", "C", 1.0),
         ("B", "D", 1.0), ("C", "D", 1.0)]


def test_shortest_path_reference_case():
    adj = build_adjacency(EDGES)
    nodes, weight = shortest_path(adj, "A", "D")
    assert len(nodes) == 3 and weight == 2.0     # analytics.rs:504-510
    assert nodes == ["A", "B", "D"]              # deterministic tie-break


def test_shortest_path_weighted_detour():
    adj = build_adjacency([("A", "B", 10.0), ("A", "C", 1.0),
                           ("C", "B", 1.0)])
    nodes, weight = shortest_path(adj, "A", "B")
    assert nodes == ["A", "C", "B"] and weight == 2.0


def test_shortest_path_unreachable_and_missing():
    adj = build_adjacency(EDGES + [("X", "Y", 1.0)])
    assert shortest_path(adj, "A", "X") is None
    assert shortest_path(adj, "A", "nope") is None


def test_all_paths_depth_limited():
    adj = build_adjacency(EDGES)
    paths = all_paths(adj, "A", "D", max_depth=3)
    assert sorted(p[0][1] for p in paths) == ["B", "C"]  # A-B-D, A-C-D
    assert all(w == 2.0 for _, w in paths)
    # depth 4 admits the length-4 simple paths too
    paths4 = {tuple(p) for p, _ in all_paths(adj, "A", "D", max_depth=4)}
    assert ("A", "B", "C", "D") in paths4 and ("A", "C", "B", "D") in paths4
    assert len(paths4) == 4


def test_top_degree_nodes():
    adj = build_adjacency(EDGES)
    top = top_degree_nodes(adj, 2)
    # B and C have degree 3 of n-1=3 → 1.0; tie broken by name
    assert top == [("B", 1.0), ("C", 1.0)]
