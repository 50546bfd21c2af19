"""At-scale datapoints for hybrid entity linking: the distributed
grouped twin (``pipelines/entity_linking.hybrid_linking_grouped``) vs
the driver-columnar twin (``functions/entity_linker.
hybrid_linking_columnar``) on a synthesized mention table with planted
structure, so cluster counts are checkable by arithmetic:

* ``K = n // 40`` multi surface forms, each drawn uniformly (~40
  mentions each), PLUS one hub name taking ~1% of all mentions — the
  skew case for the name-hash exchange;
* ``S`` singleton names (globally unique), the fuzzy fall-through set —
  kept bounded because the greedy star pass is order-sequential by
  reference semantics (the documented scale bound of the hybrid path).

Both paths must report identical stats; the script asserts it.  Prints
one JSON line per path for BASELINE.md.

Run:  python scripts/scale_linking_datapoints.py [n_mentions] [n_singles]
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 99


def gen_batch(batch: pa.Table, *, n_total: int, n_singles: int) -> pa.Table:
    ids = batch.column("id").to_numpy()
    rng = np.random.Generator(np.random.PCG64(SEED + int(ids[0])))
    n_multi_rows = n_total - n_singles
    k = max(n_multi_rows // 40, 1)
    names = []
    for i in ids:
        if i >= n_multi_rows:                  # singleton tail
            names.append(f"Solo Q{i} Z")
        elif i % 100 == 7:                     # ~1% hub name (skew)
            names.append("Hub Mega Corp")
        else:
            names.append(f"Org {int(rng.integers(0, k))} Co")
    return pa.table({
        "doc_id": pa.array([f"d{int(i) % 9973:04d}" for i in ids],
                           pa.string()),
        "local_entity_id": pa.array([f"e{int(i):09d}" for i in ids],
                                    pa.string()),
        "name": pa.array(names, pa.string())})


def main():
    import ray
    import ray.data as rd

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_singles = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    base = f"/tmp/graft_scale_linking_{n}_{n_singles}"
    flat_dir = os.path.join(base, "flat.parquet")
    if not os.path.exists(os.path.join(base, "_DONE")):
        if os.path.exists(flat_dir):
            shutil.rmtree(flat_dir)
        os.makedirs(flat_dir, exist_ok=True)
        import functools
        (rd.range(n).repartition(128)
         .map_batches(functools.partial(gen_batch, n_total=n,
                                        n_singles=n_singles),
                      batch_format="pyarrow")
         .write_parquet(flat_dir))
        open(os.path.join(base, "_DONE"), "w").write("1")

    from graphrag_rs_ray.functions.entity_linker import (
        hybrid_linking_columnar)
    from graphrag_rs_ray.pipelines.entity_linking import (
        hybrid_linking_grouped)

    rd.read_parquet(flat_dir).count()          # warm page cache + workers

    # distributed twin
    t0 = time.perf_counter()
    clusters_ds, asg_ds, g_stats = hybrid_linking_grouped(
        rd.read_parquet(flat_dir))
    n_clusters = clusters_ds.count()
    n_asg = asg_ds.count()
    t_grouped = time.perf_counter() - t0
    print(json.dumps({
        "op": "hybrid_linking_grouped", "n_mentions": n,
        "n_singles": n_singles, "sec": round(t_grouped, 1),
        "clusters": n_clusters, "assignments": n_asg,
        "mentions_per_sec": round(n / t_grouped),
        "stats": {k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in g_stats.items()}}), flush=True)

    # driver-columnar twin over the same rows, pre-sorted (its contract)
    import pyarrow.dataset as pads
    t0 = time.perf_counter()
    tbl = (pads.dataset(flat_dir).to_table()
           .sort_by([("doc_id", "ascending"),
                     ("local_entity_id", "ascending")]))
    cc, asg_cols, c_stats = hybrid_linking_columnar(
        tbl.column("doc_id"), tbl.column("local_entity_id"),
        tbl.column("name"))
    t_columnar = time.perf_counter() - t0
    print(json.dumps({
        "op": "hybrid_linking_columnar", "n_mentions": n,
        "sec": round(t_columnar, 1),
        "clusters": len(cc["cluster_id"]),
        "mentions_per_sec": round(n / t_columnar)}), flush=True)

    assert {k: round(v, 9) if isinstance(v, float) else v
            for k, v in g_stats.items()} == \
           {k: round(v, 9) if isinstance(v, float) else v
            for k, v in c_stats.items()}, (g_stats, c_stats)
    print(json.dumps({"op": "stats_equal", "ok": True}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
