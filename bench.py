"""Benchmark harness.

Plain run: executes the headline KG-construction pipeline plus a set of
training-data operators over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) at ``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and
prints ONE JSON line:

    {"metric": "kg_e2e", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "triples": n, "triples_per_sec": r}

``--scaling``: runs the headline pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both plus
efficiency eff = (T_8 / T_32) / (32 / 8)  (≥ 0.8 target, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as e
    q = e.queries()

    # Warm the worker pool with an untimed SMALL run of the same pipeline:
    # spawns all workers, imports the library + numpy in each, and touches
    # the parquet page cache — so the timed runs measure compute + shuffle,
    # not process spawn (ray_guide: "warm the OS page cache ... first").
    from graphrag_rs_ray.config import KGConfig
    from graphrag_rs_ray.pipelines.kg import triples_dataset
    from graphrag_rs_ray.sources.pages import pages_dataset
    triples_dataset(pages_dataset(500, seed=1), KGConfig()).count()
    q["token_stats"](sf_dir).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: full synthetic-pages → deduped triples pipeline
    n_triples = timed("kg_triples", lambda: q["kg_triples"](sf_dir).count())

    if os.environ.get("GRAFT_HEADLINE_ONLY") == "1":
        headline = timings["kg_triples"]
        result = {"metric": "kg_e2e", "value": headline, "unit": "sec",
                  "queries": timings, "sf": sf_name, "num_cpus": num_cpus,
                  "triples": int(n_triples),
                  "triples_per_sec": round(n_triples / headline, 1) if headline else None}
        ray.shutdown()
        return result

    timed("kg_entities", lambda: q["kg_entities"](sf_dir).count())
    timed("concept_edges", lambda: q["concept_edges"](sf_dir).count())
    timed("ner_mentions", lambda: q["ner_mentions"](sf_dir).count())
    timed("exact_dedup", lambda: q["exact_dedup"](sf_dir).count())
    timed("minhash_lsh_candidates", lambda: q["minhash_lsh_candidates"](sf_dir).count())
    timed("bm25_df", lambda: q["bm25_df"](sf_dir).count())
    timed("knn_bruteforce", lambda: q["knn_bruteforce"](sf_dir).count())
    timed("quality_scores", lambda: q["quality_scores"](sf_dir).count())
    timed("windowed_event_counts", lambda: q["windowed_event_counts"](sf_dir).count())

    headline = timings["kg_triples"]
    result = {
        "metric": "kg_e2e",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf_name,
        "num_cpus": num_cpus,
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / headline, 1) if headline > 0 else None,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "kg_e2e_scaling",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "triples_per_sec_8": r_lo.get("triples_per_sec"),
        "triples_per_sec_32": r_hi.get("triples_per_sec"),
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi.get("sf"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
