"""Node2Vec / GraphSAGE kernels + distributed twins
(graph/embeddings.rs; reference tests at embeddings.rs:515-604)."""

import numpy as np
import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.graph_embeddings import (
    EmbeddingConfig,
    EmbeddingGraph,
    GraphSAGEConfig,
    aggregate_neighbors,
    generate_walks,
    graphsage_fit,
    node2vec_fit,
    node_rng,
    sample_neighbors,
)

EDGES = [("A", "B", 1.0), ("A", "C", 1.0), ("B", "C", 1.0),
         ("B", "D", 1.0), ("C", "D", 1.0), ("D", "E", 1.0)]


def graph():
    return EmbeddingGraph.from_edges(EDGES)


def test_embedding_graph_creation():
    # embeddings.rs:528-534
    g = graph()
    assert g.node_count() == 5
    assert g.neighbors("A") is not None
    assert len(g.neighbors("A")) == 2
    # both directions, edge-input order
    assert g.neighbors("E") == [("D", 1.0)]
    assert g.nodes == ["A", "B", "C", "D", "E"]  # pinned sorted order


def test_node2vec_fit_shapes():
    # embeddings.rs:543-563
    cfg = EmbeddingConfig(dimension=64, walk_length=10, walks_per_node=5,
                          epochs=1)
    emb = node2vec_fit(graph(), cfg)
    assert len(emb) == 5
    assert all(e.shape == (64,) for e in emb.values())


def test_random_walk_generation():
    # embeddings.rs:586-603
    cfg = EmbeddingConfig(walk_length=5, walks_per_node=1)
    walks = generate_walks(graph(), cfg)
    assert len(walks) == 5
    for walk in walks:
        assert 0 < len(walk) <= 5
        # every step follows an edge
        g = graph()
        for a, b in zip(walk, walk[1:]):
            assert b in [n for n, _ in g.neighbors(a)]


def test_walks_deterministic_and_partition_independent():
    cfg = EmbeddingConfig(walk_length=8, walks_per_node=3, seed=7)
    g = graph()
    w1 = generate_walks(g, cfg)
    w2 = generate_walks(g, cfg)
    assert w1 == w2
    # per-node streams: walks of a node subset match the full run's
    sub = generate_walks(g, cfg, nodes=["C"])
    full = [w for w in w1 if w[0] == "C"]
    assert sub == full
    assert generate_walks(g, EmbeddingConfig(
        walk_length=8, walks_per_node=3, seed=8)) != w1


def test_skipgram_pulls_cowalkers_together():
    cfg = EmbeddingConfig(dimension=16, walk_length=12, walks_per_node=6,
                          context_size=4, epochs=3)
    g = graph()
    from graphrag_rs_ray.functions.graph_embeddings import (
        init_embeddings, train_skipgram)
    emb = init_embeddings(g, cfg)
    before = float(np.linalg.norm(emb["A"] - emb["B"]))
    train_skipgram(emb, generate_walks(g, cfg), cfg)
    after = float(np.linalg.norm(emb["A"] - emb["B"]))
    assert after < before


def test_graphsage_fit_shapes():
    # embeddings.rs:566-583
    cfg = GraphSAGEConfig(dimension=64, num_layers=2,
                          samples_per_layer=[3, 2])
    emb = graphsage_fit(graph(), cfg)
    assert len(emb) == 5
    assert all(e.shape == (64,) for e in emb.values())
    # deterministic
    emb2 = graphsage_fit(graph(), cfg)
    assert all(np.array_equal(emb[n], emb2[n]) for n in emb)


def test_sample_neighbors_without_replacement():
    rng = node_rng(1, "x", 0)
    neighs = [(f"n{i}", 1.0) for i in range(10)]
    s = sample_neighbors(neighs, 6, rng)
    assert len(s) == len(set(s)) == 6
    assert sample_neighbors(neighs, 99, node_rng(1, "x", 0)) != []
    assert len(sample_neighbors(neighs, 99, node_rng(1, "x", 0))) == 10


def test_aggregate_neighbors_mean_with_missing_denominator():
    # embeddings.rs:438-462: missing neighbors still divide
    feats = {"a": np.array([2.0, 4.0]), "b": np.array([4.0, 8.0])}
    agg = aggregate_neighbors(feats, ["a", "b", "missing"], 2)
    assert np.allclose(agg, [2.0, 4.0])
    assert np.array_equal(aggregate_neighbors(feats, [], 2), [0.0, 0.0])


@pytest.fixture
def edges_ds():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in EDGES], pa.string()),
        "dst": pa.array([e[1] for e in EDGES], pa.string()),
        "w": pa.array([e[2] for e in EDGES], pa.float64())}))


def test_distributed_walks_match_local(edges_ds):
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        node2vec_walks_ds)
    cfg = EmbeddingConfig(walk_length=6, walks_per_node=2, seed=11)
    g = graph()
    rows = node2vec_walks_ds(g, cfg).take_all()
    rows.sort(key=lambda r: (r["walk_idx"], r["start"]))
    assert [list(r["walk"]) for r in rows] == generate_walks(g, cfg)


def test_rng_state_roundtrip_property():
    """Serialized PCG64 state resumes the stream bit-identically at any
    cut point, including mid-integers() with a cached uint32."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from graphrag_rs_ray.pipelines.graph_embeddings import (
        _rng_from_bytes, _rng_state_bytes)

    @settings(max_examples=50, deadline=None)
    @given(st.text(min_size=1, max_size=8),
           st.lists(st.sampled_from(["f", "i"]), min_size=0, max_size=6),
           st.lists(st.sampled_from(["f", "i"]), min_size=1, max_size=6))
    def check(node, pre_ops, post_ops):
        a = node_rng(3, node, 1)
        b = node_rng(3, node, 1)
        for op in pre_ops:          # advance both identically
            (a.random(), b.random()) if op == "f" else (
                a.integers(0, 7), b.integers(0, 7))
        b = _rng_from_bytes(_rng_state_bytes(b))   # cut + resume one
        for op in post_ops:
            if op == "f":
                assert a.random() == b.random()
            else:
                assert a.integers(0, 1000) == b.integers(0, 1000)

    check()


@pytest.fixture
def indexed_edges_ds():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in EDGES], pa.string()),
        "dst": pa.array([e[1] for e in EDGES], pa.string()),
        "w": pa.array([e[2] for e in EDGES], pa.float64()),
        "eidx": pa.array(range(len(EDGES)), pa.int64())}))


def test_sharded_walks_bit_equal_broadcast(indexed_edges_ds):
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        node2vec_walks_sharded)
    cfg = EmbeddingConfig(walk_length=6, walks_per_node=2, seed=11)
    got = {(r["start"], r["walk_idx"]): list(r["walk"])
           for r in node2vec_walks_sharded(
               indexed_edges_ds, cfg, num_buckets=4).take_all()}
    g = graph()
    from graphrag_rs_ray.functions.graph_embeddings import random_walk
    want = {(n, w): random_walk(g, n, node_rng(cfg.seed, n, w), cfg)
            for n in g.nodes for w in range(cfg.walks_per_node)}
    assert got == want


def test_sharded_graphsage_bit_equal_broadcast(indexed_edges_ds):
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        graphsage_embeddings)
    scfg = GraphSAGEConfig(dimension=8, num_layers=2,
                           samples_per_layer=[3, 2], seed=11)
    # small_graph_limit=0 forces the sharded twin
    tbl = graphsage_embeddings(indexed_edges_ds, scfg,
                               small_graph_limit=0,
                               num_buckets=4).to_pandas()
    local = graphsage_fit(graph(), scfg)
    assert sorted(tbl["node"]) == sorted(local)
    for _, row in tbl.iterrows():
        assert np.array_equal(np.asarray(row["embedding"]),
                              local[row["node"]])


def test_sharded_requires_eidx(edges_ds):
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        graphsage_embeddings)
    with pytest.raises(ValueError, match="eidx"):
        graphsage_embeddings(edges_ds, GraphSAGEConfig(dimension=4),
                             small_graph_limit=0)


def test_distributed_node2vec_and_graphsage(edges_ds):
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        graphsage_embeddings, node2vec_embeddings)
    cfg = EmbeddingConfig(dimension=8, walk_length=6, walks_per_node=2,
                          context_size=3, epochs=1, seed=11)
    tbl = node2vec_embeddings(edges_ds, cfg).to_pandas()
    assert list(tbl["node"]) == ["A", "B", "C", "D", "E"]
    # distributed result == pure-kernel result
    local = node2vec_fit(graph(), cfg)
    for _, row in tbl.iterrows():
        assert np.allclose(row["embedding"], local[row["node"]],
                           atol=0, rtol=0)
    scfg = GraphSAGEConfig(dimension=8, num_layers=2,
                           samples_per_layer=[3, 2], seed=11)
    stbl = graphsage_embeddings(edges_ds, scfg).to_pandas()
    slocal = graphsage_fit(graph(), scfg)
    for _, row in stbl.iterrows():
        assert np.allclose(row["embedding"], slocal[row["node"]],
                           atol=0, rtol=0)


def test_node2vec_driver_guard(edges_ds):
    """The driver-bound walk collect refuses above max_walk_tokens with a
    documented error instead of a silent unbounded take_all."""
    import pytest
    from graphrag_rs_ray.pipelines.graph_embeddings import node2vec_embeddings
    from graphrag_rs_ray.functions.graph_embeddings import EmbeddingConfig

    cfg = EmbeddingConfig(dimension=8, walks_per_node=2, walk_length=5,
                          epochs=1)
    with pytest.raises(ValueError, match="max_walk_tokens"):
        node2vec_embeddings(edges_ds, cfg, max_walk_tokens=3)
    # and the default limit admits the small fixture unchanged
    out = node2vec_embeddings(edges_ds, cfg).to_pandas()
    assert len(out) > 0
