"""At-scale datapoints for the web link-graph family over 1M generated
linked pages (3 outlinks + dup + junk per html page, 30% hub-target
bias → genuine in-degree skew):

* link_edges — extraction wall + edges/s (stateless map, the 100-TB
  shape: no shuffle at all);
* domain_edges — rollup wall (one hash-bucketed exchange whose
  map-side combine collapses ~4M edges onto ~1M distinct host pairs);
* host_pagerank — 8 fixed iterations over the distinct host graph
  (1000 hosts → local fast path; rerun with small_graph_limit=0 via
  GRAFT_FORCE_SHARDED=1 to exercise the sharded twin).

Run:  python scripts/scale_weblink_datapoints.py [n_pages]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    from graphrag_rs_ray.pipelines.weblinks import (
        domain_edges,
        host_pagerank,
        link_edges,
    )
    from graphrag_rs_ray.sources.pages import pages_dataset

    # warm the worker pool untimed with a small same-shape run
    link_edges(pages_dataset(2000, links=3)).count()

    pages = pages_dataset(n_pages, links=3,
                          override_num_blocks=max(128, n_pages // 8000))

    t0 = time.perf_counter()
    edges = link_edges(pages).materialize()
    t_ext = time.perf_counter() - t0
    n_edges = edges.count()
    print(json.dumps({"op": "link_edges", "n_pages": n_pages,
                      "sec": round(t_ext, 1), "n_edges": n_edges,
                      "pages_per_sec": round(n_pages / t_ext),
                      "edges_per_sec": round(n_edges / t_ext)}), flush=True)

    t0 = time.perf_counter()
    dom = domain_edges(edges).materialize()
    t_dom = time.perf_counter() - t0
    n_pairs = dom.count()
    top = (dom.to_pandas().groupby("dst_host")["n_links"].sum()
           .sort_values(ascending=False))
    print(json.dumps({"op": "domain_edges", "sec": round(t_dom, 1),
                      "distinct_host_pairs": n_pairs,
                      "top_in_host": top.index[0],
                      "top_in_links": int(top.iloc[0]),
                      "median_in_links": int(top.median())}), flush=True)

    from graphrag_rs_ray.pipelines.weblinks import clean_pages
    t0 = time.perf_counter()
    cp = clean_pages(pages).materialize()
    t_cp = time.perf_counter() - t0
    n_dropped = cp.sum("n_dropped")
    print(json.dumps({"op": "clean_pages", "n_pages": n_pages,
                      "sec": round(t_cp, 1),
                      "pages_per_sec": round(cp.count() / t_cp),
                      "blocks_dropped": n_dropped}), flush=True)

    kw = {}
    if os.environ.get("GRAFT_FORCE_SHARDED"):
        kw["small_graph_limit"] = 0
    t0 = time.perf_counter()
    ranks = host_pagerank(edges, max_iter=8, **kw)
    # small-graph fast path returns an Arrow table; sharded twin a Dataset
    rdf = (ranks if hasattr(ranks, "to_pandas") and not hasattr(
        ranks, "materialize") else ranks.materialize()).to_pandas()
    t_pr = time.perf_counter() - t0
    rdf = rdf.sort_values("score", ascending=False)
    print(json.dumps({"op": "host_pagerank", "sec": round(t_pr, 1),
                      "n_hosts": int(len(rdf)),
                      "top_host": rdf["node"].iloc[0],
                      "top_is_hub": bool(rdf["node"].iloc[0] in
                                         {f"site{k}.example"
                                          for k in range(10)})}),
          flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
