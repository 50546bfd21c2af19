"""Graph embedding kernels — Node2Vec + GraphSAGE (``graph/embeddings.rs``).

Semantics ported from the reference's simplified implementations:
- Node2Vec (``embeddings.rs:132-320``): biased random walks (uniform
  first step, then weight·alpha with alpha = 1/p for the return edge and
  1/q otherwise — the reference's "BFS check" comment is dead, every
  non-return neighbor gets 1/q), cumulative-distribution sampling with
  the last-neighbor fallback, and the simplified symmetric skip-gram
  update (±lr·diff per positive pair, no negative sampling).
- GraphSAGE (``embeddings.rs:360-509``): random node features, per-layer
  sample-without-replacement (the reference's index-remove loop), mean
  aggregation (all other aggregators fall back to mean, faithful TODO),
  combine = (node + neighbors)/2.

DOCUMENTED DEVIATIONS (the reference is non-reproducible by design):
- ``thread_rng`` is replaced by counter-based seeded streams — every
  random draw is keyed by (seed, node, walk/layer index), so walks and
  samples are identical regardless of partition order or parallelism.
- Node order is pinned to sorted() (the reference iterates a HashSet).
- f64 instead of f32 (repo-wide convention).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "EmbeddingConfig", "EmbeddingGraph", "GraphSAGEConfig",
    "generate_walks", "graphsage_fit", "node2vec_fit", "random_walk",
    "init_embeddings", "train_skipgram", "node_rng",
]


@dataclass
class EmbeddingConfig:
    """``embeddings.rs:25-60`` defaults."""
    dimension: int = 128
    walk_length: int = 80
    walks_per_node: int = 10
    context_size: int = 10
    return_param: float = 1.0
    inout_param: float = 1.0
    learning_rate: float = 0.025
    negative_samples: int = 5
    epochs: int = 10
    seed: int = 42


@dataclass
class GraphSAGEConfig:
    """``embeddings.rs:324-357`` defaults."""
    dimension: int = 128
    num_layers: int = 2
    samples_per_layer: list[int] = field(default_factory=lambda: [25, 10])
    aggregator: str = "mean"   # maxpool/lstm/attention fall back to mean
    seed: int = 42


class EmbeddingGraph:
    """``embeddings.rs:63-129``: undirected adjacency in edge-input
    order (each edge pushes both directions), node list pinned sorted."""

    def __init__(self, adjacency: dict[str, list[tuple[str, float]]],
                 nodes: list[str]):
        self.adjacency = adjacency
        self.nodes = nodes
        self.node_index = {n: i for i, n in enumerate(nodes)}

    @classmethod
    def from_edges(cls, edges: list[tuple[str, str, float]]
                   ) -> "EmbeddingGraph":
        adjacency: dict[str, list[tuple[str, float]]] = {}
        nodes_set: set[str] = set()
        for source, target, weight in edges:
            adjacency.setdefault(source, []).append((target, weight))
            adjacency.setdefault(target, []).append((source, weight))
            nodes_set.add(source)
            nodes_set.add(target)
        return cls(adjacency, sorted(nodes_set))

    def node_count(self) -> int:
        return len(self.nodes)

    def neighbors(self, node: str) -> list[tuple[str, float]] | None:
        return self.adjacency.get(node)


def node_rng(seed: int, node: str, stream: int) -> np.random.Generator:
    """Counter-based stream: draws for (node, stream) are independent of
    scheduling/partition order — the property that lets walk generation
    fan out as a stateless map."""
    h = hashlib.blake2b(node.encode("utf-8"), digest_size=8).digest()
    return np.random.default_rng(
        [seed, int.from_bytes(h, "big"), stream])


def _sample_next(prev: str, neighbors: list[tuple[str, float]],
                 return_param: float, inout_param: float,
                 rng: np.random.Generator) -> str:
    """``embeddings.rs:211-252``: weight·alpha probabilities, normalize,
    cumulative sampling with r <= cumsum, last-neighbor fallback."""
    probs = np.array(
        [w * (1.0 / return_param if n == prev else 1.0 / inout_param)
         for n, w in neighbors], dtype=np.float64)
    s = probs.sum()
    if s > 0.0:
        probs /= s
    r = rng.random()
    cumsum = 0.0
    for i, p in enumerate(probs):
        cumsum += p
        if r <= cumsum:
            return neighbors[i][0]
    return neighbors[-1][0]


def random_walk(graph: EmbeddingGraph, start: str,
                rng: np.random.Generator, cfg: EmbeddingConfig
                ) -> list[str]:
    """``embeddings.rs:175-208``."""
    walk = [start]
    for _ in range(1, cfg.walk_length):
        current = walk[-1]
        neighbors = graph.neighbors(current)
        if not neighbors:
            break
        if len(walk) == 1:
            nxt = neighbors[int(rng.integers(0, len(neighbors)))][0]
        else:
            nxt = _sample_next(walk[-2], neighbors, cfg.return_param,
                               cfg.inout_param, rng)
        walk.append(nxt)
    return walk


def generate_walks(graph: EmbeddingGraph, cfg: EmbeddingConfig,
                   nodes: list[str] | None = None
                   ) -> list[list[str]]:
    """``embeddings.rs:160-172`` — walk w of node n draws from the
    (seed, n, w) stream, so a partitioned fan-out emits exactly these
    walks.  Order: walk-index-major over sorted nodes (the reference's
    loop nesting over its arbitrary node order, pinned)."""
    nodes = graph.nodes if nodes is None else nodes
    walks = []
    for w in range(cfg.walks_per_node):
        for node in nodes:
            walks.append(
                random_walk(graph, node, node_rng(cfg.seed, node, w), cfg))
    return walks


def init_embeddings(graph: EmbeddingGraph, cfg: EmbeddingConfig
                    ) -> dict[str, np.ndarray]:
    """``embeddings.rs:255-265``: uniform (-0.5, 0.5)/dimension, one
    seeded stream per node (stream index -1 = init)."""
    return {node: (node_rng(cfg.seed, node, 2 ** 31).random(cfg.dimension)
                   - 0.5) / cfg.dimension
            for node in graph.nodes}


def train_skipgram(embeddings: dict[str, np.ndarray],
                   walks: list[list[str]], cfg: EmbeddingConfig) -> None:
    """``embeddings.rs:268-309``: sequential symmetric ±lr·diff updates
    over every (center, context) pair inside the window, per epoch.
    Inherently order-dependent (each update reads current state) — runs
    as a single deterministic pass over the walk list, the reference's
    own execution model."""
    lr = cfg.learning_rate
    for _ in range(cfg.epochs):
        for walk in walks:
            n = len(walk)
            for i, node in enumerate(walk):
                start = max(0, i - cfg.context_size)
                end = min(i + cfg.context_size + 1, n)
                for j in range(start, end):
                    if i == j:
                        continue
                    context = walk[j]
                    te = embeddings.get(node)
                    ce = embeddings.get(context)
                    if te is None or ce is None:
                        continue
                    diff = ce - te
                    embeddings[node] = te + lr * diff
                    embeddings[context] = ce - lr * diff


def node2vec_fit(graph: EmbeddingGraph, cfg: EmbeddingConfig,
                 walks: list[list[str]] | None = None
                 ) -> dict[str, np.ndarray]:
    """``embeddings.rs:148-157``: walks → init → skip-gram.  ``walks``
    may be supplied by the distributed walk stage."""
    if walks is None:
        walks = generate_walks(graph, cfg)
    embeddings = init_embeddings(graph, cfg)
    train_skipgram(embeddings, walks, cfg)
    return embeddings


def sample_neighbors(neighbors: list[tuple[str, float]], num_samples: int,
                     rng: np.random.Generator) -> list[str]:
    """``embeddings.rs:408-419``: the index-remove loop (sample without
    replacement, draw order preserved)."""
    sample_size = min(num_samples, len(neighbors))
    indices = list(range(len(neighbors)))
    sampled = []
    for _ in range(sample_size):
        idx = int(rng.integers(0, len(indices)))
        sampled.append(neighbors[indices.pop(idx)][0])
    return sampled


def aggregate_neighbors(features: dict[str, np.ndarray],
                        neighbors: list[str], dimension: int
                        ) -> np.ndarray:
    """``embeddings.rs:438-483``: mean over present neighbor features,
    divided by len(neighbors) — missing neighbors still count in the
    denominator (faithful)."""
    if not neighbors:
        return np.zeros(dimension)
    total = np.zeros(dimension)
    for n in neighbors:
        feat = features.get(n)
        if feat is not None:
            total += feat
    return total / len(neighbors)


def graphsage_layer(graph: EmbeddingGraph,
                    features: dict[str, np.ndarray], num_samples: int,
                    layer: int, cfg: GraphSAGEConfig,
                    nodes: list[str] | None = None
                    ) -> dict[str, np.ndarray]:
    """``embeddings.rs:397-435``: per node — sampled neighbors, mean
    aggregate, combine = (node + agg)/2.  Per-node seeded streams keep
    the sample set partition-order-independent, so a layer fans out as a
    stateless map over nodes with the feature table broadcast."""
    out = {}
    for node in (graph.nodes if nodes is None else nodes):
        neighs = graph.neighbors(node)
        sampled = (sample_neighbors(
            neighs, num_samples, node_rng(cfg.seed, node, 2 ** 20 + layer))
            if neighs else [])
        agg = aggregate_neighbors(features, sampled, cfg.dimension)
        out[node] = (features[node] + agg) / 2.0
    return out


def graphsage_fit(graph: EmbeddingGraph, cfg: GraphSAGEConfig
                  ) -> dict[str, np.ndarray]:
    """``embeddings.rs:375-394``."""
    features = {node: node_rng(cfg.seed, node, 2 ** 30).random(cfg.dimension)
                for node in graph.nodes}
    for layer in range(cfg.num_layers):
        samples = (cfg.samples_per_layer[layer]
                   if layer < len(cfg.samples_per_layer) else 10)
        features = graphsage_layer(graph, features, samples, layer, cfg)
    return features
