"""Leiden kernel (reference test expectations), distributed communities,
k-hop traversal, degree stats."""

import pyarrow as pa
import pytest


def _triples_ds(edges):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "subj": pa.array([e[0] for e in edges], pa.string()),
        "pred": pa.array(["RELATED_TO"] * len(edges), pa.string()),
        "obj": pa.array([e[1] for e in edges], pa.string()),
    }))


# ---- kernel (port of leiden.rs tests:779-839) ---------------------------

REF_EDGES = [("A", "B"), ("B", "C"), ("C", "A"), ("C", "D")]
REF_NODES = ["A", "B", "C", "D"]


def test_leiden_basic():
    """leiden.rs test_leiden_basic: detection succeeds, non-empty result."""
    from graphrag_rs_ray.functions.leiden import LeidenConfig, leiden_communities
    out = leiden_communities(REF_NODES, REF_EDGES, LeidenConfig())
    assert set(out) == set(REF_NODES)
    # deterministic partition of the triangle + appendage
    assert out["A"] == out["B"]
    assert out["C"] == out["D"]
    assert out["A"] != out["C"]


def test_leiden_config_defaults():
    """leiden.rs test_config_defaults."""
    from graphrag_rs_ray.functions.leiden import LeidenConfig
    cfg = LeidenConfig()
    assert cfg.max_cluster_size == 10
    assert cfg.resolution == 1.0
    assert cfg.max_levels == 5
    assert cfg.use_lcc is True


def test_leiden_refinement_splits_disconnected():
    """A community that is internally disconnected must be split into its
    connected components (the reference's refine_partition semantics)."""
    from graphrag_rs_ray.functions.leiden import leiden_communities
    # two disjoint triangles: local move keeps them separate communities,
    # and refinement must never merge disconnected nodes
    edges = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
             ("b1", "b2"), ("b2", "b3"), ("b3", "b1")]
    out = leiden_communities(["a1", "a2", "a3", "b1", "b2", "b3"], edges)
    assert out["a1"] == out["a2"] == out["a3"]
    assert out["b1"] == out["b2"] == out["b3"]
    assert out["a1"] != out["b1"]


def test_leiden_modularity_positive():
    from graphrag_rs_ray.functions.leiden import leiden_communities, modularity
    out = leiden_communities(REF_NODES, REF_EDGES)
    q = modularity(REF_NODES, REF_EDGES, out)
    singleton = modularity(REF_NODES, REF_EDGES, {v: i for i, v in enumerate(REF_NODES)})
    assert q > singleton


# ---- distributed pipeline ----------------------------------------------

def test_detect_communities_matches_kernel(ray_session):
    """Per-component distribution must reproduce the sequential kernel."""
    from graphrag_rs_ray.functions.leiden import leiden_communities
    from graphrag_rs_ray.pipelines.communities import detect_communities

    edges = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
             ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
             ("a3", "x"), ("x", "y")]
    nodes = sorted({v for e in edges for v in e})
    expected = leiden_communities(nodes, edges)
    # relabel by min member (the pipeline's community key)
    comm_min = {}
    for v in nodes:
        c = expected[v]
        comm_min[c] = min(comm_min.get(c, v), v)
    exp_map = {v: comm_min[expected[v]] for v in nodes}

    got = detect_communities(_triples_ds(edges), num_buckets=4).to_pandas()
    got_map = dict(zip(got["node"], got["community"]))
    assert got_map == exp_map


def test_community_summaries_format(ray_session):
    """Summary format per leiden.rs generate_community_summary: header,
    entity count, per-type top-5 lines, deterministic ordering."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.communities import (
        community_summaries, detect_communities)

    edges = [("PERSON_a", "ORG_x"), ("ORG_x", "PERSON_b"),
             ("PERSON_b", "PERSON_a")]
    triples = _triples_ds(edges)
    assign = detect_communities(triples, num_buckets=4)
    ents = rd.from_arrow(pa.table({
        "entity_id": pa.array(["PERSON_a", "PERSON_b", "ORG_x"], pa.string()),
        "name": pa.array(["Alice", "Bob", "Xcorp"], pa.string()),
        "type": pa.array(["PERSON", "PERSON", "ORGANIZATION"], pa.string()),
        "conf": pa.array([0.9, 0.8, 0.7], pa.float32()),
        "mention_count": pa.array([5, 3, 2], pa.int64()),
    }))
    df = community_summaries(ents, assign, num_buckets=4).to_pandas()
    assert len(df) == 1                       # one triangle community
    s = df.iloc[0]["summary"]
    assert df.iloc[0]["n_entities"] == 3
    assert s.splitlines()[1] == "Contains 3 entities:"
    assert "- ORGANIZATION: Xcorp" in s
    assert "- PERSON: Alice, Bob" in s        # mention_count desc
    # deterministic across runs
    df2 = community_summaries(ents, assign, num_buckets=4).to_pandas()
    assert df.equals(df2)


def test_modularity_ds_matches_kernel(ray_session):
    from graphrag_rs_ray.functions.leiden import leiden_communities, modularity
    from graphrag_rs_ray.pipelines.communities import detect_communities, modularity_ds
    import ray.data as rd

    edges = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
             ("b1", "b2"), ("b2", "b3"), ("b3", "b1"), ("a1", "b1")]
    nodes = sorted({v for e in edges for v in e})
    assign = leiden_communities(nodes, edges)
    q_kernel = modularity(nodes, edges, assign)

    assign_ds = rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.string()),
        "community": pa.array([str(assign[v]) for v in nodes], pa.string())}))
    q_ds = modularity_ds(_triples_ds(edges), assign_ds, num_buckets=4)
    assert abs(q_ds - q_kernel) < 1e-12


# ---- k-hop traversal ----------------------------------------------------

def _bfs_python(edges, seeds, k, direction="both"):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        if direction == "both":
            adj.setdefault(b, []).append(a)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for h in range(1, k + 1):
        nxt = []
        for v in frontier:
            for u in adj.get(v, []):
                if u not in dist:
                    dist[u] = h
                    nxt.append(u)
        frontier = nxt
    return dist


@pytest.mark.parametrize("direction", ["both", "out"])
def test_k_hop_matches_bfs(ray_session, direction):
    from graphrag_rs_ray.pipelines.graph_ops import k_hop
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "a"), ("b", "x"), ("x", "y"), ("z", "a")]
    got = k_hop(_triples_ds(edges), ["a"], k=3, direction=direction,
                num_buckets=4).to_pandas()
    got_map = dict(zip(got["node"], got["hop"]))
    assert got_map == _bfs_python(edges, ["a"], 3, direction)
    # local fast path == forced sharded loop (small_graph_limit=0)
    sharded = k_hop(_triples_ds(edges), ["a"], k=3, direction=direction,
                    num_buckets=4, small_graph_limit=0).to_pandas()
    assert dict(zip(sharded["node"], sharded["hop"])) == got_map


def test_degree_stats_values(ray_session):
    from graphrag_rs_ray.pipelines.graph_ops import degree_stats
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("c", "a")]
    df = degree_stats(_triples_ds(edges), num_buckets=4).to_pandas()
    d = df.set_index("node")
    assert d.loc["a", "out_deg"] == 3 and d.loc["a", "in_deg"] == 1
    assert d.loc["b", "in_deg"] == 2 and d.loc["b", "out_deg"] == 0
    assert d.loc["a", "degree"] == 4
    assert abs(d.loc["a", "degree_centrality"] - 4 / 2) < 1e-12


def test_connected_components_paths_agree(ray_session):
    """Small-graph union-find fast path == distributed hash-to-min
    propagation (forced with small_graph_limit=0)."""
    import pyarrow as pa
    import ray.data as rd
    from graphrag_rs_ray.pipelines.communities import connected_components

    pairs = [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z2"), ("y", "z"),
             ("solo1", "solo2")]
    eds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string())}))
    fast = connected_components(eds).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = connected_components(eds, num_buckets=4, small_graph_limit=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert fast.equals(dist)
    m = dict(zip(fast["node"], fast["component"]))
    assert m["c"] == "a" and m["x"] == "x" and m["z2"] == "x"
    assert m["solo2"] == "solo1"


def test_triangle_paths_agree(ray_session):
    """Dense-local matmul path == distributed wedge-join path
    (forced with small_graph_limit=0), values hand-checked."""
    import pyarrow as pa
    import ray.data as rd
    from graphrag_rs_ray.pipelines.graph_ops import triangle_counts

    # K4 on a,b,c,d plus pendant e: every K4 node in C(3,2)=3 triangles
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e")]
    tri = rd.from_arrow(pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "pred": pa.array(["r"] * len(pairs), pa.string()),
        "obj": pa.array([p[1] for p in pairs], pa.string())}))
    fast = triangle_counts(tri).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = triangle_counts(tri, num_buckets=4, small_graph_limit=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert fast.equals(dist)
    m = fast.set_index("node")
    assert list(m.loc[["a", "b", "c"], "triangles"]) == [3, 3, 3]
    assert m.loc["d", "triangles"] == 3 and m.loc["e", "triangles"] == 0
    assert abs(m.loc["a", "local_cc"] - 1.0) < 1e-12       # K4 corner
    assert abs(m.loc["d", "local_cc"] - 0.5) < 1e-12       # 3 of C(4,2)=6


def test_graph_ops_empty_and_singleton(ray_session):
    """Degenerate graphs: triangle/centrality/statistics must not crash
    and must return sane shapes."""
    import pyarrow as pa
    import ray.data as rd
    from graphrag_rs_ray.pipelines.graph_ops import (
        centrality_scores, graph_statistics_row, triangle_counts)

    def tds(pairs):
        return rd.from_arrow(pa.table({
            "subj": pa.array([p[0] for p in pairs], pa.string()),
            "pred": pa.array(["r"] * len(pairs), pa.string()),
            "obj": pa.array([p[1] for p in pairs], pa.string())}))

    # self-loop-only graph → no undirected edges at all
    empty = triangle_counts(tds([("a", "a")])).to_pandas()
    assert len(empty) == 0

    # a single edge: no triangles, cc 0, two degree-1 nodes
    one = triangle_counts(tds([("a", "b")])).to_pandas().set_index("node")
    assert list(one["triangles"]) == [0, 0]
    assert list(one["local_cc"]) == [0.0, 0.0]

    cents = centrality_scores(tds([("a", "b")])).to_pandas().set_index("node")
    assert abs(cents.loc["a", "degree_centrality"] - 1.0) < 1e-12
    assert cents.loc["a", "betweenness"] == 0.0
    assert abs(cents.loc["a", "closeness"] - 1.0) < 1e-12

    stats = graph_statistics_row(tds([("a", "b"), ("c", "d")])).to_pandas()
    r = stats.iloc[0]
    assert r["node_count"] == 4 and r["edge_count"] == 2
    assert r["connected_components"] == 2
    assert r["clustering_coefficient"] == 0.0


def test_centrality_paths_agree(ray_session):
    """Driver-local centrality fast path == distributed per-component
    kernel (forced with small_graph_limit=0) on a multi-component graph
    with duplicate and reversed triples."""
    import pyarrow as pa
    import ray.data as rd
    from graphrag_rs_ray.pipelines.graph_ops import centrality_scores

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),  # tri + tail
             ("b", "a"), ("a", "b"),                          # dup/reversed
             ("x", "y"), ("y", "z"),                          # path comp
             ("q", "q")]                                      # self-loop
    tds = rd.from_arrow(pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "pred": pa.array(["r"] * len(pairs), pa.string()),
        "obj": pa.array([p[1] for p in pairs], pa.string())}))
    fast = centrality_scores(tds).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = centrality_scores(tds, num_buckets=4, small_graph_limit=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert fast.equals(dist)
    m = fast.set_index("node")
    # n_global = 7; b sits on a-c's alternate shortest path? a-b-c and
    # a-c both exist → d(a,c)=1, b not between; d is pendant off c
    assert abs(m.loc["c", "degree_centrality"] - 3 / 6) < 1e-12
    assert m.loc["d", "betweenness"] == 0.0
    assert m.loc["y", "betweenness"] > 0.0


def test_communities_paths_agree(ray_session):
    """Driver-local Leiden fast path (union-find tag + one kernel call)
    == distributed per-component path (forced with small_graph_limit=0),
    including the staged ``lm`` column the oracle consumes."""
    import pyarrow as pa
    import ray.data as rd
    from graphrag_rs_ray.pipelines.communities import (
        detect_communities_from_edges)

    # two K3s joined by a bridge + a separate path component + dup edges
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d"),
             ("a", "b"),                                   # duplicate
             ("p", "q"), ("q", "r")]
    eds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string())}))
    for emit in (False, True):
        fast = detect_communities_from_edges(eds, emit_local_move=emit) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        dist = detect_communities_from_edges(
            eds, num_buckets=4, emit_local_move=emit, small_graph_limit=0) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        assert fast.equals(dist)
    assert set(fast.columns) == {"node", "community", "lm"}


def test_union_find_labels_property():
    """The shared union-find kernel must label every node with the
    smallest member of its reachability class, for any edge multiset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from graphrag_rs_ray.functions.unionfind import union_find_labels

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                    max_size=40))
    def check(int_pairs):
        pairs = [(f"n{a}", f"n{b}") for a, b in int_pairs]
        got = union_find_labels(pairs)
        # naive closure: repeated relabel-to-min until fixpoint
        want = {v: v for e in pairs for v in e}
        changed = True
        while changed:
            changed = False
            for a, b in pairs:
                m = min(want[a], want[b])
                for x in (a, b):
                    if want[x] != m:
                        want[x] = m
                        changed = True
            # propagate through labels (label of my label)
            for v in want:
                if want[want[v]] < want[v]:
                    want[v] = want[want[v]]
                    changed = True
        assert got == want

    check()
