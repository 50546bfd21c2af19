"""Distributed graph embeddings (``graph/embeddings.rs`` on Ray Data).

Shape: the adjacency is broadcast once (``ray.put``) and the per-node
work — biased random walks (Node2Vec) and per-layer neighborhood
aggregation (GraphSAGE) — fans out as stateless ``map_batches`` over the
node table.  Counter-seeded RNG streams (see
``functions/graph_embeddings.py``) make every walk/sample independent of
partition order, so the fan-out is exact, not approximate.

PARTITIONING ASSUMPTION (documented per the custom-operator rule): the
adjacency and the feature table are broadcast, which caps this operator
at graphs that fit one worker's heap (~10^7 edges).  Beyond that, walks
need per-step frontier joins against adjacency shards and skip-gram
needs parameter-server-style training — out of the reference's scope
(its own implementation is a single-threaded HashMap pass).  The
skip-gram training pass itself is sequential-by-semantics (each update
reads current state) and runs on the driver over the distributed walk
output, like the reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from graphrag_rs_ray.functions.graph_embeddings import (
    EmbeddingConfig,
    EmbeddingGraph,
    GraphSAGEConfig,
    graphsage_layer,
    init_embeddings,
    node_rng,
    random_walk,
    train_skipgram,
)


def _graph_from_edges_ds(edges_ds) -> EmbeddingGraph:
    """Collect a (src, dst, w) Dataset into the broadcastable adjacency
    (bounded graphs only — see module docstring)."""
    rows = edges_ds.take_all()
    return EmbeddingGraph.from_edges(
        [(r["src"], r["dst"], float(r["w"])) for r in rows])


def _nodes_ds(graph: EmbeddingGraph) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "node": pa.array(graph.nodes, pa.string())}))


def node2vec_walks_ds(graph: EmbeddingGraph, cfg: EmbeddingConfig
                      ) -> rd.Dataset:
    """Distributed walk generation: node table → map_batches, walks per
    node drawn from (seed, node, walk_idx) streams; adjacency broadcast
    once."""
    gref = ray.put(graph)

    def walks_fn(t: pa.Table) -> pa.Table:
        g = ray.get(gref)
        nodes_out, widx, steps = [], [], []
        for node in t.column("node").to_pylist():
            for w in range(cfg.walks_per_node):
                walk = random_walk(g, node, node_rng(cfg.seed, node, w),
                                   cfg)
                nodes_out.append(node)
                widx.append(w)
                steps.append(walk)
        return pa.table({
            "start": pa.array(nodes_out, pa.string()),
            "walk_idx": pa.array(widx, pa.int64()),
            "walk": pa.array(steps, pa.list_(pa.string()))})

    return _nodes_ds(graph).map_batches(walks_fn, batch_format="pyarrow")


def node2vec_embeddings(edges_ds, cfg: EmbeddingConfig) -> rd.Dataset:
    """Full Node2Vec: distributed walks → deterministic walk reorder
    (walk-index-major over sorted start nodes = the kernel's order) →
    sequential skip-gram on the driver (reference semantics) → node
    embedding table."""
    graph = _graph_from_edges_ds(edges_ds)
    rows = node2vec_walks_ds(graph, cfg).take_all()
    rows.sort(key=lambda r: (r["walk_idx"], r["start"]))
    walks = [list(r["walk"]) for r in rows]
    embeddings = init_embeddings(graph, cfg)
    train_skipgram(embeddings, walks, cfg)
    return _emb_table(embeddings, cfg.dimension)


def graphsage_embeddings(edges_ds, cfg: GraphSAGEConfig) -> rd.Dataset:
    """Full GraphSAGE: per-layer fan-out over the node table with the
    (adjacency, features) pair re-broadcast each layer — num_layers
    broadcasts total, no shuffle."""
    graph = _graph_from_edges_ds(edges_ds)
    gref = ray.put(graph)
    features = {n: node_rng(cfg.seed, n, 2 ** 30).random(cfg.dimension)
                for n in graph.nodes}
    for layer in range(cfg.num_layers):
        samples = (cfg.samples_per_layer[layer]
                   if layer < len(cfg.samples_per_layer) else 10)
        fref = ray.put(features)

        def layer_fn(t: pa.Table, _layer=layer, _samples=samples,
                     _fref=fref) -> pa.Table:
            g = ray.get(gref)
            feats = ray.get(_fref)
            nodes = t.column("node").to_pylist()
            out = graphsage_layer(g, feats, _samples, _layer, cfg,
                                  nodes=nodes)
            return pa.table({
                "node": pa.array(nodes, pa.string()),
                "embedding": pa.array(
                    [out[n].tolist() for n in nodes],
                    pa.list_(pa.float64()))})

        new = _nodes_ds(graph).map_batches(
            layer_fn, batch_format="pyarrow").take_all()
        features = {r["node"]: np.asarray(r["embedding"]) for r in new}
    return _emb_table(features, cfg.dimension)


def _emb_table(embeddings: dict[str, np.ndarray], dim: int) -> rd.Dataset:
    nodes = sorted(embeddings)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.string()),
        "dim": pa.array([dim] * len(nodes), pa.int64()),
        "l2_norm": pa.array(
            [round(float(np.linalg.norm(embeddings[n])), 8)
             for n in nodes], pa.float64()),
        "embedding": pa.array([embeddings[n].tolist() for n in nodes],
                              pa.list_(pa.float64()))}))
