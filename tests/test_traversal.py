"""Traversal operators (``traversal.rs:154-566``) on hand graphs, plus
the local-kernel == sharded-path equality gate (small_graph_limit=0
forces the distributed twin, same discipline as connected_components)."""

import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.paths import (
    build_adjacency,
    dfs_first_visit_depths,
)
from graphrag_rs_ray.pipelines.traversal import (
    ego_network,
    multi_source_bfs,
    query_focused_subgraph,
)

# A-B, B-C, C-D strong; A-X below the 0.5 gate; B-B strong self-loop
ROWS = [("A", "r1", "B", 0.9), ("B", "r2", "C", 0.9),
        ("C", "r3", "D", 0.9), ("A", "r4", "X", 0.3),
        ("B", "r5", "B", 0.9)]


def _tri(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float64())}))


def _norm(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))


def test_ego_network_hand_graph(ray_session):
    out = _norm(ego_network(_tri(ROWS), "A", k_hops=2, min_strength=0.5,
                            num_buckets=4))
    nodes = {(r[0], r[4]) for r in out if r[2] == "node"}
    rels = {(r[0], r[1], r[3], r[4]) for r in out if r[2] == "rel"}
    # X invisible (conf 0.3 < 0.5); D at hop 3 > k
    assert nodes == {("A", 0), ("B", 1), ("C", 2)}
    # duplicate-push occurrences: both endpoints of A-B inner (hop ≤ 1),
    # one endpoint of B-C; the B-B self-loop double-fires (both
    # get_neighbors arms, traversal.rs:494-501)
    assert rels == {("A", "B", "r1", 2), ("B", "C", "r2", 1),
                    ("B", "B", "r5", 2)}


def test_multi_source_bfs_hand_graph(ray_session):
    out = multi_source_bfs(_tri(ROWS), ["A", "D"], max_depth=1,
                           min_strength=0.5, num_buckets=4).to_pandas()
    got = {(r.node, r.dist, r.in_entities) for r in out.itertuples()}
    # dist = min hop from ANY source; nodes AT max_depth keep a distance
    # entry but are never popped into entities (traversal.rs:340-351)
    assert got == {("A", 0, 1), ("D", 0, 1), ("B", 1, 0), ("C", 1, 0)}


def test_query_focused_subgraph_hand_graph(ray_session):
    out = _norm(query_focused_subgraph(_tri(ROWS), ["D", "A"],
                                       expansion_hops=2, min_strength=0.5,
                                       num_buckets=4))
    nodes = {(r[0], r[4]) for r in out if r[2] == "node"}
    rels = {(r[0], r[1], r[3], r[4]) for r in out if r[2] == "rel"}
    assert nodes == {("A", 0), ("D", 0), ("B", 1), ("C", 1)}
    # (source, target, type)-key dedup → every kept key has val 1
    assert rels == {("A", "B", "r1", 1), ("B", "C", "r2", 1),
                    ("C", "D", "r3", 1), ("B", "B", "r5", 1)}


def _rand_rows(n_nodes=40, n_edges=160, seed=7):
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n_edges):
        a = f"n{rng.randrange(n_nodes):03d}"
        b = f"n{rng.randrange(n_nodes):03d}"
        rows.append((a, f"p{i % 5}", b, round(rng.random(), 3)))
    return sorted(set(rows))


@pytest.mark.parametrize("fn,kwargs", [
    (ego_network, {"k_hops": 2}),
    (query_focused_subgraph, {"expansion_hops": 2}),
])
def test_subgraph_local_equals_sharded(ray_session, fn, kwargs):
    rows = _rand_rows()
    seeds = sorted({r[0] for r in rows if r[3] >= 0.5})[:3]
    arg = seeds[0] if fn is ego_network else seeds
    fast = _norm(fn(_tri(rows), arg, min_strength=0.5, num_buckets=4,
                    **kwargs))
    sharded = _norm(fn(_tri(rows), arg, min_strength=0.5, num_buckets=4,
                       small_graph_limit=0, **kwargs))
    assert fast == sharded and len(fast) > 10


def test_msbfs_local_equals_sharded(ray_session):
    rows = _rand_rows(seed=11)
    seeds = sorted({r[0] for r in rows if r[3] >= 0.5})[:3]
    fast = _norm(multi_source_bfs(_tri(rows), seeds, max_depth=3,
                                  min_strength=0.5, num_buckets=4))
    sharded = _norm(multi_source_bfs(_tri(rows), seeds, max_depth=3,
                                     min_strength=0.5, num_buckets=4,
                                     small_graph_limit=0))
    assert fast == sharded and len(fast) > 5


def test_dfs_first_visit_depths():
    # the reference's own test graph (analytics.rs:492-520)
    adj = build_adjacency([("A", "B", 1.0), ("A", "C", 1.0),
                           ("B", "C", 1.0), ("B", "D", 1.0),
                           ("C", "D", 1.0)])
    # sorted descent: A→B→C→(D blocked at depth 3)→back→B's D at depth 2
    assert dfs_first_visit_depths(adj, "A", 3) == {
        "A": 0, "B": 1, "C": 2, "D": 2}
    # DFS depth is first-visit depth, NOT min: C reached at 2 via B even
    # though A-C exists... until the budget forces the direct edge
    assert dfs_first_visit_depths(adj, "A", 2) == {"A": 0, "B": 1, "C": 1}
    # a source absent from the graph still gets its depth-0 entry
    # (traversal.rs:203-209 inserts before the neighbor lookup)
    assert dfs_first_visit_depths(adj, "Z", 3) == {"Z": 0}
