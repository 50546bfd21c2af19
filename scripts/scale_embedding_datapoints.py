"""At-scale datapoints for the SHARDED graph-embedding twins.

The sf test KG saturates at ~900 entities, so ``graphsage_embeddings``
and the node2vec walk generation always ride the broadcast fast path on
driver benchmarks.  This script generates a seeded sparse random graph
(with the ``eidx`` edge-input-order column the sharded twins require),
forces the no-broadcast paths, and prints one JSON line per op for
BASELINE.md.

Costs to expect: GraphSAGE moves ~samples×nodes×dim×8B through two
bucketed exchanges per layer; node2vec pays one exchange per walk step
(walk state + adjacency), so wall scales with walk_length × per-round
exchange time.

Run:  python scripts/scale_embedding_datapoints.py [n_nodes] [n_edges]
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 7


def stage_edges(n_nodes: int, n_edges: int, path: str) -> str:
    rng = np.random.Generator(np.random.PCG64(SEED))
    os.makedirs(path, exist_ok=True)
    per = 1_000_000
    written = 0
    shard = 0
    while written < n_edges:
        k = min(per, n_edges - written)
        a = rng.integers(0, n_nodes, size=k)
        b = rng.integers(0, n_nodes, size=k)
        t = pa.table({
            "src": pa.array([f"n{x}" for x in a], pa.string()),
            "dst": pa.array([f"n{x}" for x in b], pa.string()),
            "w": pa.array(np.ones(k), pa.float64()),
            "eidx": pa.array(np.arange(written, written + k), pa.int64()),
        })
        pq.write_table(t, os.path.join(path, f"part-{shard:04d}.parquet"))
        written += k
        shard += 1
    return path


def main():
    import ray
    import ray.data as rd

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    from graphrag_rs_ray.functions.graph_embeddings import (
        EmbeddingConfig, GraphSAGEConfig)
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        graphsage_embeddings_sharded, node2vec_walks_sharded)

    path = f"/tmp/graft_scale_emb_{n_nodes}_{n_edges}"
    if not os.path.exists(os.path.join(path, "_DONE")):
        stage_edges(n_nodes, n_edges, os.path.join(path, "edges"))
        open(os.path.join(path, "_DONE"), "w").write("1")
    edges = rd.read_parquet(os.path.join(path, "edges"))
    edges.count()  # warm page cache + worker pool untimed

    scfg = GraphSAGEConfig(dimension=64, num_layers=2,
                           samples_per_layer=[10, 5], seed=SEED)
    t0 = time.perf_counter()
    emb = graphsage_embeddings_sharded(edges, scfg, num_buckets=64)
    n_emb = emb.count()
    t_sage = time.perf_counter() - t0
    print(json.dumps({
        "op": "graphsage_sharded", "n_nodes": n_nodes, "n_edges": n_edges,
        "dim": scfg.dimension, "layers": scfg.num_layers,
        "sec": round(t_sage, 1), "n_embeddings": n_emb,
        "nodes_per_sec": round(n_emb / t_sage)}), flush=True)

    ncfg = EmbeddingConfig(walk_length=10, walks_per_node=1, seed=SEED)
    t0 = time.perf_counter()
    walks = node2vec_walks_sharded(edges, ncfg, num_buckets=64)
    n_walks = walks.count()
    t_walk = time.perf_counter() - t0
    print(json.dumps({
        "op": "node2vec_walks_sharded", "n_nodes": n_nodes,
        "n_edges": n_edges, "walk_length": ncfg.walk_length,
        "walks_per_node": ncfg.walks_per_node, "sec": round(t_walk, 1),
        "n_walks": n_walks,
        "steps_per_sec": round(n_walks * ncfg.walk_length / t_walk)}),
        flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
