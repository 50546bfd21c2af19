"""At-scale datapoints for the DISTRIBUTED ANN path (sharded HNSW).

The sf embeddings table tops out at ~6k vectors, so the per-shard
HNSW build is never stressed by the driver bench.  This script stages
N seeded random unit vectors to Parquet, runs the same sharded
build + fan-out search + global exact rerank pipeline the `hnsw_topk`
query uses (`training_data.hnsw_shard_candidates`), runs the exact
brute-force top-k over the same vectors for comparison, and prints one
JSON line per op (wall seconds + recall@k) for BASELINE.md.

Scale shape: one HNSW per hash shard, built INSIDE the shard's task —
shard count is the memory/build knob (build is O(n_shard · ef · M)),
queries fan out to every shard, candidates are exact-reranked globally.

Run:  python scripts/scale_ann_datapoints.py [n_vecs] [dim] [shards]
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 16
K = 10


def stage_vectors(n: int, dim: int, path: str, seed: int = 42):
    rng = np.random.Generator(np.random.PCG64(seed))
    os.makedirs(path, exist_ok=True)
    per = 250_000
    written = 0
    shard = 0
    while written < n:
        k = min(per, n - written)
        v = rng.normal(size=(k, dim))
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        t = pa.table({
            "vec_id": pa.array(range(written, written + k), pa.int64()),
            "embedding": pa.array(v.tolist(),
                                  pa.list_(pa.float64(), dim)),
        })
        pq.write_table(t, os.path.join(path, f"part-{shard:04d}.parquet"))
        written += k
        shard += 1
    return path


def main():
    import ray
    import ray.data as rd

    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    num_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    ef_search = int(sys.argv[4]) if len(sys.argv) > 4 else 96

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    vdir = f"/tmp/graft_scale_ann_{n_vecs}_{dim}"
    if not os.path.exists(os.path.join(vdir, "_DONE")):
        stage_vectors(n_vecs, dim, vdir)
        open(os.path.join(vdir, "_DONE"), "w").write("1")

    # queries = the first N_QUERIES staged vectors (same device as the
    # sf hnsw_topk / knn_bruteforce queries)
    head = pq.read_table(os.path.join(vdir, "part-0000.parquet"))
    qids = head.column("vec_id").to_pylist()[:N_QUERIES]
    qmat = np.array(head.column("embedding").to_pylist()[:N_QUERIES],
                    dtype=np.float64)
    qref = ray.put((qids, qmat))

    def read():
        return rd.read_parquet(vdir, columns=["vec_id", "embedding"])

    read().count()  # warm page cache + worker pool untimed

    # ---- sharded HNSW: per-shard build + fan-out search + exact rerank
    from graphrag_rs_ray.functions.hnsw import HNSWIndex

    def shard_col(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        return batch.append_column(
            "shard", pa.array(vid % num_shards, pa.int64()))

    def build_search(group: pa.Table) -> pa.Table:
        ids_, qm = ray.get(qref)
        keys = group.column("vec_id").to_pylist()
        vecs = np.array(group.column("embedding").to_pylist(),
                        dtype=np.float64)
        index = HNSWIndex(m=8, ef_construction=64).build(keys, vecs)
        oq, ov, osc = [], [], []
        for qid, qv in zip(ids_, qm):
            for key, s in index.candidates(qv, ef_search=ef_search):
                oq.append(qid)
                ov.append(key)
                osc.append(s)
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "score": pa.array(osc, pa.float64())})

    import pandas as pd

    def final_topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["score", "vec_id"],
                              ascending=[False, True]).head(K)
        return pa.table({
            "query_id": pa.array(g["query_id"].tolist(), pa.int64()),
            "vec_id": pa.array(g["vec_id"].tolist(), pa.int64()),
            "rank": pa.array(range(1, len(g) + 1), pa.int64())})

    t0 = time.perf_counter()
    hnsw = (read()
            .map_batches(shard_col, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(lambda g: build_search(g.drop_columns(["shard"])),
                        batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pandas")
            .to_pandas())
    t_hnsw = time.perf_counter() - t0

    # ---- exact brute force: per-batch matmul partial top-k, driver merge
    def partial_topk(batch: pa.Table) -> pa.Table:
        ids_, qm = ray.get(qref)
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        scores = vecs @ qm.T                      # (n, Q); rows unit-norm
        oq, ov, osc = [], [], []
        for j, qid in enumerate(ids_):
            col = scores[:, j]
            top = np.argsort(-col, kind="stable")[:K]
            oq.extend([qid] * len(top))
            ov.extend(vid[top].tolist())
            osc.extend(col[top].tolist())
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "score": pa.array(osc, pa.float64())})

    t0 = time.perf_counter()
    parts = read().map_batches(partial_topk,
                               batch_format="pyarrow").to_pandas()
    exact = (parts.sort_values(["score", "vec_id"],
                               ascending=[False, True])
             .groupby("query_id", sort=False).head(K))
    t_exact = time.perf_counter() - t0

    recalls = []
    for qid in qids:
        h = set(hnsw[hnsw["query_id"] == qid]["vec_id"])
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        recalls.append(len(h & e) / K)

    print(json.dumps({"op": "hnsw_sharded", "n_vecs": n_vecs, "dim": dim,
                      "num_shards": num_shards, "ef_search": ef_search,
                      "n_queries": N_QUERIES,
                      "k": K, "sec": round(t_hnsw, 1),
                      "recall_at_k": round(float(np.mean(recalls)), 3)}),
          flush=True)
    print(json.dumps({"op": "knn_bruteforce_exact", "n_vecs": n_vecs,
                      "dim": dim, "n_queries": N_QUERIES, "k": K,
                      "sec": round(t_exact, 1)}), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
