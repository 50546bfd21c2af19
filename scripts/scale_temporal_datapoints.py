"""At-scale datapoints for the round-4 temporal analytics family
(``temporal_evolution`` / ``temporal_node_churn`` /
``temporal_top_growing`` / ``temporal_centrality``) over a synthetic
interval-edge table (the sf events table tops out at ~1M rows).

Edge construction (deterministic, exact invariants):
* n_edges edges, src = ``u<i % n_users>``, dst = ``e:<i % n_types>``.
* Edge i is valid over [t0 + (i % 8)·STEP, t0 + (i % 8 + 2)·STEP] —
  every edge spans exactly 2 of the 8 granularity steps, so each
  default window [w, w+g] (g = (hi−lo)//8) overlaps a predictable
  edge population.
* Churn invariant: edges with ``i % 8 == 0`` are the only ones active
  at lo; ``i % 8 in {6, 7}`` the only ones active at hi — so a node is
  'removed' iff ALL its edges have phase ∉ {6,7} and ≥ one phase-0 edge,
  etc.  We verify churn totals = the independently-computed expectation.

Run:  python scripts/scale_temporal_datapoints.py [n_edges]
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP = 1_000_000
T0 = 1_600_000_000_000_000


def gen_edges(batch: pa.Table, n_users: int, n_types: int) -> pa.Table:
    ids = batch.column("id").to_numpy()
    ph = ids % 8
    return pa.table({
        "src": pa.array([f"u{i % n_users}" for i in ids], pa.string()),
        "dst": pa.array([f"e:{i % n_types}" for i in ids], pa.string()),
        "fs": pa.array(T0 + ph * STEP, pa.int64()),
        "ls": pa.array(T0 + (ph + 2) * STEP, pa.int64()),
    })


def main():
    import ray
    import ray.data as rd

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_users, n_types = n_edges // 20, 997

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    base = f"/tmp/graft_scale_temporal_{n_edges}"
    edir = os.path.join(base, "edges")
    if not os.path.exists(os.path.join(base, "_DONE")):
        if os.path.exists(base):
            shutil.rmtree(base)
        os.makedirs(edir)
        (rd.range(n_edges).repartition(128)
         .map_batches(lambda b: gen_edges(b, n_users, n_types),
                      batch_format="pyarrow")
         .write_parquet(edir))
        open(os.path.join(base, "_DONE"), "w").write("1")

    from graphrag_rs_ray.pipelines import training_data as td

    edges = rd.read_parquet(edir)
    edges.count()                     # warm untimed

    t0 = time.perf_counter()
    ev = td.temporal_evolution("/unused", edges_ds=edges).to_pandas()
    t_ev = time.perf_counter() - t0
    ev = ev.sort_values("window_start").reset_index(drop=True)
    # range [T0, T0+9·STEP] → g = (9·STEP)//8; window k overlaps edges
    # whose [ph, ph+2] interval intersects it — every window must be
    # non-empty and the totals must cover all 8 phases
    ok_ev = bool(len(ev) >= 9 and (ev["edge_count"] > 0).all()
                 and int(ev["edge_count"].max()) <= n_edges)
    print(json.dumps({"op": "temporal_evolution", "n_edges": n_edges,
                      "sec": round(t_ev, 1), "windows": len(ev),
                      "max_edge_count": int(ev["edge_count"].max()),
                      "max_node_count": int(ev["node_count"].max()),
                      "sane": ok_ev}), flush=True)

    t0 = time.perf_counter()
    ch = td.temporal_node_churn("/unused", edges_ds=edges).to_pandas()
    t_ch = time.perf_counter() - t0
    got = ch["status"].value_counts().to_dict()
    # expectation from construction (computed independently in numpy):
    i = np.arange(n_edges)
    ph = i % 8
    at_lo = ph == 0                     # fs == lo  (only phase 0)
    at_hi = ph >= 7                     # ls == hi  (only phase 7)
    exp = {"added": 0, "removed": 0, "stable": 0}
    for nodes, key in ((i % n_users, "u"), (i % n_types, "e")):
        s = np.zeros(nodes.max() + 1, bool)
        e = np.zeros(nodes.max() + 1, bool)
        np.logical_or.at(s, nodes[at_lo], True)
        np.logical_or.at(e, nodes[at_hi], True)
        exp["stable"] += int((s & e).sum())
        exp["added"] += int((~s & e).sum())
        exp["removed"] += int((s & ~e).sum())
    print(json.dumps({"op": "temporal_node_churn", "n_edges": n_edges,
                      "sec": round(t_ch, 1), "got": got, "expected": exp,
                      "exact": bool(got == exp)}), flush=True)

    t0 = time.perf_counter()
    tg = td.temporal_top_growing("/unused", top_k=10,
                                 edges_ds=edges).to_pandas()
    t_tg = time.perf_counter() - t0
    print(json.dumps({"op": "temporal_top_growing", "n_edges": n_edges,
                      "sec": round(t_tg, 1), "rows": len(tg),
                      "top_growth": float(tg["growth"].iloc[0])
                      if len(tg) else None}), flush=True)

    t0 = time.perf_counter()
    tc = td.temporal_centrality("/unused", edges_ds=edges)
    n_tc = tc.count()
    t_tc = time.perf_counter() - t0
    print(json.dumps({"op": "temporal_centrality", "n_edges": n_edges,
                      "sec": round(t_tc, 1), "rows": n_tc}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
