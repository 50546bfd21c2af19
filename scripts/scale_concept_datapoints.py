"""At-scale datapoint for the concept-edge BUCKETED vocabulary path
(round-2 verdict weak #3): the distinct-concept table exceeds any
driver-broadcast budget, so edges must come from the string-pair +
Dataset-counts + bucketed-Jaccard-join path with NO driver collection.

Planted structure (exact arithmetic):

* chunk ``i`` carries concepts ``{p<k>a, p<k>b}`` with ``k = i // 2`` —
  each (a, b) pair co-occurs in exactly the 2 chunks {2k, 2k+1}, so it
  passes threshold 2 with count 2 and Jaccard 2/(2+2-2) = 1.0;
* plus 4 per-chunk UNIQUE filler concepts ``u<i>x<j>`` that never
  co-occur twice (their pairs die at the threshold).

Distinct concepts = n_chunks + 4·n_chunks  (2 planted per 2 chunks →
n_chunks; 4 fillers per chunk) — the default 2M chunks ⇒ **10M distinct
concepts**; expected edges = n_chunks // 2 exactly, all with count 2
and confidence 1.0.

Run:  python scripts/scale_concept_datapoints.py [n_chunks]
"""

import json
import os
import shutil
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_lists(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_pylist()
    cids, lists = [], []
    for i in ids:
        k = i // 2
        cs = sorted([f"p{k}a", f"p{k}b",
                     f"u{i}x0", f"u{i}x1", f"u{i}x2", f"u{i}x3"])
        cids.append(f"chunk_{i}")
        lists.append(cs)
    return pa.table({
        "chunk_id": pa.array(cids, pa.string()),
        "concepts": pa.array(lists, pa.list_(pa.string()))})


def main():
    import ray
    import ray.data as rd

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    base = f"/tmp/graft_scale_concepts_{n_chunks}"
    lists_dir = os.path.join(base, "lists")
    if not os.path.exists(os.path.join(base, "_DONE")):
        if os.path.exists(base):
            shutil.rmtree(base)
        os.makedirs(lists_dir)
        (rd.range(n_chunks).repartition(128)
         .map_batches(gen_lists, batch_format="pyarrow")
         .write_parquet(lists_dir))
        open(os.path.join(base, "_DONE"), "w").write("1")

    from graphrag_rs_ray.pipelines.concepts import concept_edges_from_lists

    lists = rd.read_parquet(lists_dir)
    lists.count()                      # warm untimed

    t0 = time.perf_counter()
    # vocab_broadcast_limit=0 forces the bucketed path outright (the
    # auto route would burn the limit-capped driver scan first)
    edges = concept_edges_from_lists(lists, 2,
                                     vocab_broadcast_limit=0).materialize()
    n_edges = edges.count()
    t = time.perf_counter() - t0

    import pyarrow.compute as pc

    def check(tb: pa.Table) -> pa.Table:
        ok = pc.and_(pc.equal(tb.column("count"), 2),
                     pc.equal(tb.column("confidence"), 1.0))
        return pa.table({"n_ok": pa.array(
            [pc.sum(pc.cast(ok, pa.int64())).as_py() or 0], pa.int64())})

    n_ok = int(edges.map_batches(check, batch_format="pyarrow").sum("n_ok"))
    expected = n_chunks // 2
    print(json.dumps({
        "op": "concept_edges_bucketed", "n_chunks": n_chunks,
        "n_distinct_concepts": 5 * n_chunks, "sec": round(t, 1),
        "edges": n_edges, "expected": expected,
        "all_count2_conf1": n_ok,
        "exact": bool(n_edges == expected == n_ok)}), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
