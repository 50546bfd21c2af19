"""At-scale datapoints for the sketch trio (HLL / Count-Min / Bloom)
over the planted 1M-doc corpus: wall time, docs/s, and the property
that makes sketches THE 100-TB cardinality/frequency answer — the
exchange is bounded by the register table (≤ 4096 / 65536 / set-bit
rows) no matter the input size, and the HLL estimate lands within its
standard error of the exact distinct count.

Run:  python scripts/scale_sketch_datapoints.py [n_docs]
"""

import json
import os
import sys
import time

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

    td._docs(sf_dir).count()   # warm untimed

    t0 = time.perf_counter()
    est = td.hll_estimate(sf_dir)
    t_hll = time.perf_counter() - t0
    # exact distinct tokens for the error check (one grouped pass)
    from graphrag_rs_ray.stages.hashagg import (
        grouped_arrow_agg,
        hash_grouped_aggregate,
    )
    import pyarrow as pa
    from graphrag_rs_ray.functions.textstats import lm_tokenize

    def toks(batch: pa.Table) -> pa.Table:
        s = set()
        for t in batch.column("text").to_pylist():
            s.update(lm_tokenize(t))
        out = sorted(s)
        return pa.table({"token": pa.array(out, pa.string()),
                         "one": pa.array([1] * len(out), pa.int64())})

    exact = hash_grouped_aggregate(
        td._docs(sf_dir).map_batches(toks, batch_format="pyarrow"),
        ["token"],
        grouped_arrow_agg(["token"], [("one", "max")],
                          rename=["token", "one"])).count()
    got = est["est_x10k"].iloc[0] / 10000.0
    print(json.dumps({
        "op": "hll_estimate", "n_docs": n_docs, "sec": round(t_hll, 1),
        "docs_per_sec": round(n_docs / t_hll),
        "est": round(got, 1), "exact_distinct": exact,
        "rel_err": round(abs(got - exact) / exact, 4),
        "n_buckets_used": int(est["n_buckets_used"].iloc[0])}), flush=True)

    t0 = time.perf_counter()
    regs = td.cms_registers(sf_dir).materialize()
    t_cms = time.perf_counter() - t0
    print(json.dumps({
        "op": "cms_registers", "n_docs": n_docs, "sec": round(t_cms, 1),
        "docs_per_sec": round(n_docs / t_cms),
        "register_rows": regs.count()}), flush=True)

    t0 = time.perf_counter()
    bits = td.bloom_bits(sf_dir).materialize()
    t_bloom = time.perf_counter() - t0
    print(json.dumps({
        "op": "bloom_bits", "n_docs": n_docs, "sec": round(t_bloom, 1),
        "docs_per_sec": round(n_docs / t_bloom),
        "set_bits": bits.count(), "m": td.BLOOM_M}), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
