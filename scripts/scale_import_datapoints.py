"""At-scale datapoints for the RDF / GraphML importers.

The oracle queries exercise the importers at sf sizes (≤60k docs); this
script stresses them at millions of lines so BASELINE.md can state a
measured throughput and show the per-subject entity merge is a bucketed
exchange, not a driver fold.

Synthesis is arithmetic (the same shapes as the `rdf_import` /
`graphml_import` oracle generators): subject i gets an rdfs:label iff
i%2==0, an rdf:type iff i%3==0, one `links` triple to (i*7+1)%N and one
`lang` literal — so every expected count is checkable in closed form:
entities == N, relationships == N, labels == ceil(N/2), typed == ceil(N/3).
GraphML is generated as F independent files of K nodes+edges each (the
importer's parallel unit is the file).

Run:  python scripts/scale_import_datapoints.py [n_subjects] [graphml_files]
      (defaults 2_000_000 and 64 × 20_000 nodes)
"""

import json
import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANGS = ["en", "de", "fr", "es", "zh"]
BASE = "http://ex.org/doc/"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _nt_lines(lo: int, hi: int, n: int) -> list[str]:
    lines = []
    for i in range(lo, hi):
        s = f"<{BASE}{i}>"
        if i % 2 == 0:
            lines.append(f'{s} <{LABEL}> "Doc {i}" .')
        if i % 3 == 0:
            lines.append(f"{s} <{RDF_TYPE}> <http://ex.org/ns#Document> .")
        lines.append(f"{s} <http://ex.org/ns/links> <{BASE}{(i * 7 + 1) % n}> .")
        lines.append(f'{s} <http://ex.org/ns/lang> "{LANGS[i % 5]}" .')
    return lines


def _graphml_file(fidx: int, k: int) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
             '<key id="d0" for="node" attr.name="name"/>',
             '<key id="d1" for="node" attr.name="type"/>',
             '<key id="d2" for="node" attr.name="lang"/>',
             '<key id="d3" for="edge" attr.name="type"/>',
             '<graph edgedefault="directed">']
    base = fidx * k
    for j in range(k):
        i = base + j
        data = []
        if i % 2 == 0:
            data.append(f'<data key="d0">Doc {i}</data>')
        if i % 3 == 0:
            data.append('<data key="d1">Report</data>')
        data.append(f'<data key="d2">{LANGS[i % 5]}</data>')
        lines.append(f'<node id="n{i}">{"".join(data)}</node>')
        edata = '<data key="d3">links_to</data>' if i % 2 == 0 else ""
        lines.append(f'<edge source="n{i}" target="n{base + (j * 7 + 1) % k}">{edata}</edge>')
    lines += ["</graph>", "</graphml>"]
    return "\n".join(lines)


def main():
    import ray
    import ray.data as rd

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k_per_file = 20_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    # ---- N-Triples: distributed shard generation (one .nt per range) ----
    nt_dir = f"/tmp/graft_scale_import_nt_{n}"
    if not os.path.exists(nt_dir + ".done"):
        import shutil
        if os.path.exists(nt_dir):
            shutil.rmtree(nt_dir)
        os.makedirs(nt_dir, exist_ok=True)
        shards = 128

        def write_shard(batch: pa.Table) -> pa.Table:
            sid = batch.column("id")[0].as_py()
            lo = sid * (n // shards)
            hi = n if sid == shards - 1 else (sid + 1) * (n // shards)
            with open(os.path.join(nt_dir, f"part-{sid:05d}.nt"), "w") as f:
                f.write("\n".join(_nt_lines(lo, hi, n)) + "\n")
            return pa.table({"n": pa.array([hi - lo], pa.int64())})

        (rd.from_arrow(pa.table({"id": pa.array(range(shards), pa.int64())}))
         .repartition(shards)
         .map_batches(write_shard, batch_format="pyarrow").sum("n"))
        open(nt_dir + ".done", "w").write("1")

    from graphrag_rs_ray.sources.rdf_graphml import (import_graphml, import_graphml_stream, import_rdf)

    n_lines = n + (n + 1) // 2 + (n + 2) // 3 + n
    t0 = time.perf_counter()
    ents, rels, errors = import_rdf(nt_dir)
    n_ents, n_rels, n_errs = ents.count(), rels.count(), errors.count()
    t_rdf = time.perf_counter() - t0
    ok = (n_ents == n and n_rels == n and n_errs == 0)
    print(json.dumps({"op": "rdf_import", "n_subjects": n,
                      "n_lines": n_lines, "sec": round(t_rdf, 1),
                      "lines_per_sec": round(n_lines / t_rdf),
                      "entities": n_ents, "relationships": n_rels,
                      "errors": n_errs, "counts_exact": bool(ok)}),
          flush=True)

    # ---- GraphML: F independent files, parallel per file ----
    gm_dir = f"/tmp/graft_scale_import_gm_{n_files}x{k_per_file}"
    if not os.path.exists(gm_dir + ".done"):
        import shutil
        if os.path.exists(gm_dir):
            shutil.rmtree(gm_dir)
        os.makedirs(gm_dir, exist_ok=True)

        def write_file(batch: pa.Table) -> pa.Table:
            fidx = batch.column("id")[0].as_py()
            with open(os.path.join(gm_dir, f"g-{fidx:04d}.graphml"), "w") as f:
                f.write(_graphml_file(fidx, k_per_file))
            return pa.table({"n": pa.array([k_per_file], pa.int64())})

        (rd.from_arrow(pa.table({"id": pa.array(range(n_files), pa.int64())}))
         .repartition(n_files)
         .map_batches(write_file, batch_format="pyarrow").sum("n"))
        open(gm_dir + ".done", "w").write("1")

    n_nodes = n_files * k_per_file
    t0 = time.perf_counter()
    ents, rels, errors = import_graphml(gm_dir)
    n_ents, n_rels, n_errs = ents.count(), rels.count(), errors.count()
    t_gm = time.perf_counter() - t0
    ok = (n_ents == n_nodes and n_rels == n_nodes and n_errs == 0)
    print(json.dumps({"op": "graphml_import", "n_files": n_files,
                      "nodes_per_file": k_per_file, "sec": round(t_gm, 1),
                      "elements_per_sec": round(2 * n_nodes / t_gm),
                      "entities": n_ents, "relationships": n_rels,
                      "errors": n_errs, "counts_exact": bool(ok)}),
          flush=True)

    # ---- GraphML single HUGE file: the constant-memory stream path ----
    big_k = 1_000_000
    big_path = f"/tmp/graft_scale_import_gm_one_{big_k}.graphml"
    if not os.path.exists(big_path + ".done"):
        with open(big_path, "w") as f:
            f.write(_graphml_file(0, big_k))
        open(big_path + ".done", "w").write("1")
    sz = os.path.getsize(big_path) / 1e6
    t0 = time.perf_counter()
    ents, rels, errors = import_graphml_stream(big_path)
    n_ents, n_rels, n_errs = ents.count(), rels.count(), errors.count()
    t_st = time.perf_counter() - t0
    ok = (n_ents == big_k and n_rels == big_k and n_errs == 0)
    print(json.dumps({"op": "graphml_import_stream", "file_mb": round(sz, 1),
                      "nodes": big_k, "sec": round(t_st, 1),
                      "elements_per_sec": round(2 * big_k / t_st),
                      "counts_exact": bool(ok),
                      "note": "single file = single parse task by XML "
                              "nesting; constant worker memory"}),
          flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
