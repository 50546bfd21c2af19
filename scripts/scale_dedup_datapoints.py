"""At-scale datapoints for the near-dedup family (exact / MinHash-LSH /
verify) with PLANTED duplicates, so recall is measurable.

The sf documents table tops out at ~60k rows, so the dedup pipelines are
never stressed by the driver bench.  This script synthesizes N docs into
a documents-shaped Parquet dir (schema ``doc_id:int64, text:string``) and
runs the exact pipelines from ``pipelines/training_data`` against it:

* every doc's text is a pure function of its doc_id (per-doc PCG64
  stream), so generation is an embarrassingly parallel map and the
  planted-pair set is enumerable by arithmetic with no cross-task state:
  - ``id % 33 == 31`` → EXACT copy of doc ``id-1``;
  - ``id % 33 == 32`` → NEAR-dup of doc ``id-2`` (3% token mutation →
    word-3-shingle Jaccard ≈ 0.9, char-trigram Jaccard ≈ 0.9);
  both source ids land on the base branch, so no dup-of-dup chains.

Prints one JSON line per op (wall seconds, counts, recall of planted
pairs) for BASELINE.md.

Run:  python scripts/scale_dedup_datapoints.py [n_docs]
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 50_000
SEED = 1234


def _doc_text(doc_id: int) -> str:
    """Deterministic text for a BASE doc id."""
    rng = np.random.Generator(np.random.PCG64(SEED + doc_id))
    n = int(rng.integers(80, 200))
    idx = rng.integers(0, VOCAB, size=n)
    return " ".join(f"w{j}" for j in idx)


def _mutate(text: str, doc_id: int, p: float = 0.03) -> str:
    rng = np.random.Generator(np.random.PCG64(SEED * 7 + doc_id))
    words = text.split()
    flips = rng.random(len(words)) < p
    repl = rng.integers(0, VOCAB, size=len(words))
    return " ".join(f"w{repl[i]}" if flips[i] else w
                    for i, w in enumerate(words))


def gen_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_pylist()
    texts = []
    for i in ids:
        r = i % 33
        if r == 31:
            texts.append(_doc_text(i - 1))            # exact dup
        elif r == 32:
            texts.append(_mutate(_doc_text(i - 2), i))  # near dup
        else:
            texts.append(_doc_text(i))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


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
    groups = td.exact_dedup(sf_dir)
    n_groups = groups.count()
    n_dup_groups = groups.filter(lambda r: r["n_dups"] > 1).count()
    t_exact = time.perf_counter() - t0
    planted_exact = sum(1 for i in range(n_docs) if i % 33 == 31)
    print(json.dumps({"op": "exact_dedup", "n_docs": n_docs,
                      "sec": round(t_exact, 1), "n_groups": n_groups,
                      "dup_groups": n_dup_groups,
                      "planted_exact": planted_exact}), flush=True)

    disk = os.environ.get("GRAFT_DISK_SHUFFLE") == "1"
    t0 = time.perf_counter()
    if disk:
        # band volume beyond the in-store/spill budget (the 20M case):
        # map-only hash-partitioned Parquet stage + per-shard reduces,
        # equality-gated vs the in-store path (tests/test_dedup_disk.py)
        cand = td.minhash_lsh_candidates_disk(
            sf_dir, stage_dir=os.path.join(sf_dir, "_minhash_stage"),
            num_shards=128).materialize()
    else:
        cand = td.minhash_lsh_candidates(sf_dir).materialize()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0
    print(json.dumps({"op": "minhash_lsh_candidates", "n_docs": n_docs,
                      "disk_shuffle": disk,
                      "sec": round(t_cand, 1), "n_candidates": n_cand}),
          flush=True)

    t0 = time.perf_counter()
    verified = td.ngram_dedup_pairs(sf_dir, cand_ds=cand).to_pandas()
    t_ver = time.perf_counter() - t0

    got = {(min(a, b), max(a, b))
           for a, b in zip(verified["doc_a"], verified["doc_b"])}
    planted_near = {(i - 2, i) for i in range(n_docs) if i % 33 == 32}
    planted_ex_pairs = {(i - 1, i) for i in range(n_docs) if i % 33 == 31}
    # the copy (id-1) and the mutation (id) of the SAME base doc are a
    # genuine near-dup pair too — count them as planted
    planted_sib = {(i - 1, i) for i in range(n_docs) if i % 33 == 32}
    rec_near = (len(got & planted_near) / len(planted_near)
                if planted_near else 1.0)
    rec_exact = (len(got & planted_ex_pairs) / len(planted_ex_pairs)
                 if planted_ex_pairs else 1.0)
    extras = len(got - planted_near - planted_ex_pairs - planted_sib)
    print(json.dumps({"op": "ngram_dedup_verify", "n_docs": n_docs,
                      "sec": round(t_ver, 1), "verified_pairs": len(got),
                      "recall_planted_near": round(rec_near, 4),
                      "recall_planted_exact": round(rec_exact, 4),
                      "non_planted_pairs": extras}), flush=True)

    # transitive clustering over the SAME candidates: the planted block
    # structure makes every i%33==32 a 3-doc chain {i-2 (base), i-1
    # (exact copy), i (near mutation)} whose representative is i-2 —
    # cluster recall is the fraction of those chains recovered intact
    import pyarrow.compute as _pc

    def _cluster_stats(ds):
        def flags(t: pa.Table) -> pa.Table:
            rep3 = _pc.and_(
                _pc.and_(_pc.equal(t.column("is_kept"), 1),
                         _pc.equal(t.column("cluster_size"), 3)),
                _pc.equal(_pc.subtract(
                    t.column("doc_id"),
                    _pc.multiply(_pc.divide(t.column("doc_id"), 33), 33)), 30))
            return pa.table({
                "kept": t.column("is_kept"),
                "rep3": _pc.cast(rep3, pa.int64())})
        f = ds.map_batches(flags, batch_format="pyarrow").materialize()
        return f.sum("kept"), f.sum("rep3")

    expected_chains = sum(1 for i in range(n_docs) if i % 33 == 32 and i >= 2)
    t0 = time.perf_counter()
    n_kept_cl, n_chains = _cluster_stats(td.dedup_clusters(sf_dir, cand_ds=cand))
    t_cl = time.perf_counter() - t0
    print(json.dumps({"op": "dedup_clusters", "n_docs": n_docs,
                      "sec": round(t_cl, 1), "kept": n_kept_cl,
                      "chains_of_3_recovered": n_chains,
                      "chains_planted": expected_chains,
                      "chain_recall": round(n_chains / expected_chains, 4)
                      if expected_chains else 1.0}), flush=True)

    # forced sharded twins (distributed CC + bucketed join-back, no
    # broadcast map) — must reproduce the fast-path summary exactly
    t0 = time.perf_counter()
    n_kept_sh, n_chains_sh = _cluster_stats(
        td.dedup_clusters(sf_dir, cand_ds=cand,
                          small_graph_limit=0, small_map_limit=0))
    t_sh = time.perf_counter() - t0
    print(json.dumps({"op": "dedup_clusters_sharded", "n_docs": n_docs,
                      "sec": round(t_sh, 1),
                      "equal_to_fast_path": bool(
                          (n_kept_sh, n_chains_sh)
                          == (n_kept_cl, n_chains))}), flush=True)

    # simhash banding, capped at 200k docs (documented scale bound:
    # 16-bit band occupancy grows ~N²/2^16 — the op is the exact-recall
    # small/medium-corpus dedup; MinHash-LSH is the web-scale path).
    # Exact copies have Hamming 0 → recall must be 1.0; the 3%-mutation
    # near-dups land wherever their vote margins fall — observed, not
    # gated.
    n_sim = min(n_docs, 200_000)
    sim_sigs = td.simhash_signatures(sf_dir).filter(
        expr=f"doc_id < {n_sim}").materialize()
    t0 = time.perf_counter()
    sh = td.simhash_dup_pairs(sf_dir, sigs_ds=sim_sigs).to_pandas()
    t_sh2 = time.perf_counter() - t0
    sh_pairs = set(zip(sh.doc_a, sh.doc_b))
    planted_ex_sim = {(i - 1, i) for i in range(n_sim) if i % 33 == 31}
    planted_nr_sim = {(i - 2, i) for i in range(n_sim) if i % 33 == 32}
    print(json.dumps({
        "op": "simhash_dup_pairs", "n_docs": n_sim,
        "sec": round(t_sh2, 1), "pairs": len(sh_pairs),
        "recall_exact": round(len(sh_pairs & planted_ex_sim)
                              / len(planted_ex_sim), 4),
        "recall_near_observed": round(len(sh_pairs & planted_nr_sim)
                                      / len(planted_nr_sim), 4)}),
        flush=True)

    # Manku permuted-prefix twin: (a) same capped corpus for a direct
    # comparison against banding (identical pair set required), (b) the
    # FULL corpus — the ~N²/2³² bucket regime is the point of the op
    t0 = time.perf_counter()
    mk = td.simhash_dup_pairs_manku(sf_dir, sigs_ds=sim_sigs).to_pandas()
    t_mk = time.perf_counter() - t0
    mk_pairs = set(zip(mk.doc_a, mk.doc_b))
    print(json.dumps({
        "op": "simhash_dup_pairs_manku", "n_docs": n_sim,
        "sec": round(t_mk, 1), "pairs": len(mk_pairs),
        "equal_to_banding": bool(mk_pairs == sh_pairs)}), flush=True)

    full_sigs = td.simhash_signatures(sf_dir).materialize()
    t0 = time.perf_counter()
    mk_full = td.simhash_dup_pairs_manku(sf_dir,
                                         sigs_ds=full_sigs).to_pandas()
    t_mkf = time.perf_counter() - t0
    mkf_pairs = set(zip(mk_full.doc_a, mk_full.doc_b))
    planted_ex_full = {(i - 1, i) for i in range(n_docs) if i % 33 == 31}
    print(json.dumps({
        "op": "simhash_dup_pairs_manku_full", "n_docs": n_docs,
        "sec": round(t_mkf, 1), "pairs": len(mkf_pairs),
        "recall_exact": round(len(mkf_pairs & planted_ex_full)
                              / len(planted_ex_full), 4)}), flush=True)

    # end-to-end curation (annotate → gates → exact dedup → LSH
    # near-dedup drop), recomputing signatures/candidates/verify inside —
    # the honest single-pipeline cost.  The synthetic vocab has no
    # stopwords, so the stopword gate is disabled; every other gate runs.
    t0 = time.perf_counter()
    n_kept = td.corpus_curation(sf_dir, min_stopword=0.0).count()
    t_cur = time.perf_counter() - t0
    # planted structure: ~1/33 exact copies (deduped) + ~1/33 near dups
    # (dropped as the larger id of a verified pair) → ~94% survive
    frac = n_kept / n_docs
    print(json.dumps({"op": "corpus_curation", "n_docs": n_docs,
                      "sec": round(t_cur, 1), "survivors": n_kept,
                      "survivor_frac": round(frac, 4),
                      "sane": bool(0.90 <= frac <= 0.97)}), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
