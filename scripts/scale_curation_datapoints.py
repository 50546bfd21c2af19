"""At-scale datapoints for the curation scorers (bigram-LM perplexity
buckets) and the duplicate-span removal transform over the SAME planted
1M-doc corpus as ``scale_dedup_datapoints.py``.

Quality metrics:
* perplexity_buckets — bucket sizes within one doc of exact thirds (the
  value-tie rule can only merge, never split);
* remove_dup_spans — docs with a planted SMALLER twin (id % 33 in
  {31, 32}) must lose chars; independent docs must lose none.

Run:  python scripts/scale_curation_datapoints.py [n_docs]
"""

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_dedup_datapoints import gen_batch  # noqa: E402  (same corpus)


def main():
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    sf_dir = f"/tmp/graft_scale_dedup_{n_docs}"
    docs_dir = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(os.path.join(sf_dir, "_DONE")):
        import shutil
        if os.path.exists(docs_dir):
            shutil.rmtree(docs_dir)
        os.makedirs(docs_dir, exist_ok=True)
        (rd.range(n_docs).repartition(128)
         .map_batches(gen_batch, batch_format="pyarrow")
         .write_parquet(docs_dir))
        open(os.path.join(sf_dir, "_DONE"), "w").write("1")

    from graphrag_rs_ray.pipelines import training_data as td

    td._docs(sf_dir).count()   # warm page cache + worker pool untimed

    t0 = time.perf_counter()
    # the synthetic corpus has no lang column -> inject (doc_id, text);
    # the pipeline assigns lang='xx', one bucket family
    buckets = td.perplexity_buckets(sf_dir, docs_ds=td._docs(sf_dir))
    bcnt = (buckets.map_batches(
        lambda t: pa.table({"h": pc.cast(pc.equal(t.column("bucket"), "head"), pa.int64()),
                            "m": pc.cast(pc.equal(t.column("bucket"), "middle"), pa.int64()),
                            "t": pc.cast(pc.equal(t.column("bucket"), "tail"), pa.int64())}),
        batch_format="pyarrow").materialize())
    n_head, n_mid, n_tail = bcnt.sum("h"), bcnt.sum("m"), bcnt.sum("t")
    t_ppl = time.perf_counter() - t0
    print(json.dumps({"op": "perplexity_buckets", "n_docs": n_docs,
                      "sec": round(t_ppl, 1),
                      "head": n_head, "middle": n_mid, "tail": n_tail}),
          flush=True)

    t0 = time.perf_counter()
    prof = td.remove_dup_spans(sf_dir)

    def flags(t: pa.Table) -> pa.Table:
        rem = pc.subtract(t.column("doc_id"),
                          pc.multiply(pc.divide(t.column("doc_id"), 33), 33))
        twin = pc.or_(pc.equal(rem, 31), pc.equal(rem, 32))
        cut = pc.greater(t.column("removed_chars"), 0)
        return pa.table({
            "twin_cut": pc.cast(pc.and_(twin, cut), pa.int64()),
            "twin": pc.cast(twin, pa.int64()),
            "other_cut": pc.cast(pc.and_(pc.invert(twin), cut), pa.int64()),
            "removed": t.column("removed_chars")})

    f = prof.map_batches(flags, batch_format="pyarrow").materialize()
    t_rm = time.perf_counter() - t0
    print(json.dumps({
        "op": "remove_dup_spans", "n_docs": n_docs,
        "sec": round(t_rm, 1),
        "twin_cut_recall": round(f.sum("twin_cut") / f.sum("twin"), 4),
        "false_cuts_on_independent_docs": f.sum("other_cut"),
        "total_chars_removed": f.sum("removed")}), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
