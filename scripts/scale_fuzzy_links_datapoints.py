"""At-scale datapoints for the fuzzy-linking SCALE path (round-2 verdict
weak #2): the link table stays a Dataset end-to-end and subj/obj remap
through bucketed left joins (``stages/linking.remap_column_bucketed``)
— no driver materialization, no whole-set broadcast.

Two phases, because they have different inherent bounds:

* **Clustering** (phase A, default 1M entities): blocked greedy
  clustering is O(Σ block²) Python by reference semantics
  (``string_similarity_linker.rs`` is O(n²) globally; our soundex
  blocking caps it at the block level, but the soundex key space is
  only ~26×7³ ≈ 9k keys per type, so block SIZE grows linearly with
  the corpus — a documented semantic bound, not a dataflow one).
  Entity names are deterministic pronounceable words spread across the
  soundex space; every ``i % 10 == 9`` entity is a 2-edit VOWEL-SWAP
  typo of entity ``i-1`` (soundex-preserving, so the pair shares a
  block; similarity ≈ 0.98 > 0.85).  Planted recall is REPORTED, not
  gated at 1.0: at ~200+ entities per soundex block, Jaro-Winkler's
  prefix bonus links chance prefix-sharing words (measured 0.886 for a
  7-char shared prefix), and the reference's greedy first-seed-wins
  clustering then absorbs some typos into those chance clusters — a
  property of the REFERENCE SEMANTICS on dense blocks, not of the
  dataflow.  The gated check is therefore EXACTNESS: the distributed
  links for ``--verify-blocks`` randomly sampled blocks must equal a
  driver-side greedy replay of those same blocks bit-for-bit.
* **Remap** (phase B, default 10M links × 10M triples): the part that
  must be unbounded — a synthesized (entity_id → canonical_id) table
  and a triple table remap through TWO bucketed left joins with an
  exact arithmetic invariant: subj values inside the link domain
  (``E<i<n_links>``) map to ``C…``, everything else passes through.

Run:  python scripts/scale_fuzzy_links_datapoints.py [n_cluster] [n_links] [n_triples]
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CONS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"


def _word(i: int, n_syll: int = 7) -> str:
    """Deterministic pronounceable word for id i — alternating
    consonant/vowel syllables, so words spread over the soundex key
    space and two independent words stay far under the 0.85 linking
    threshold on every metric (lev distance ≫ 2, JW ~0.6, token
    jaccard 0)."""
    rng = np.random.Generator(np.random.PCG64(4242 + i))
    cs = rng.integers(0, len(_CONS), size=n_syll)
    vs = rng.integers(0, len(_VOWELS), size=n_syll)
    # force the 1st and 3rd vowels distinct so the typo swap is real
    if vs[0] == vs[2]:
        vs[2] = (vs[2] + 1) % len(_VOWELS)
    return "".join(_CONS[c] + _VOWELS[v] for c, v in zip(cs, vs))


def _typo(w: str) -> str:
    """Swap the 1st and 3rd vowels — a 2-edit typo (similarity
    ≈ 1 - 2/len ≈ 0.86-0.88 > 0.85) that PRESERVES the soundex code
    (vowels are not coded), so the pair stays in one block."""
    out = list(w)
    out[1], out[5] = out[5], out[1]
    return "".join(out)


def gen_entities(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    names, eids, confs = [], [], []
    for i in ids:
        i = int(i)
        if i % 10 == 9:
            # typo variant of entity i-1 (2-edit vowel swap, same block)
            names.append(_typo(_word(i - 1)).capitalize())
            confs.append(0.7)
        else:
            names.append(_word(i).capitalize())
            confs.append(0.9)
        eids.append(f"PERSON_n{i}")
    return pa.table({
        "entity_id": pa.array(eids, pa.string()),
        "name": pa.array(names, pa.string()),
        "type": pa.array(["PERSON"] * len(ids), pa.string()),
        "conf": pa.array(np.asarray(confs, np.float32), pa.float32()),
        "mention_count": pa.array(np.ones(len(ids), np.int64), pa.int64()),
    })


def gen_links(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    return pa.table({
        "entity_id": pa.array([f"E{i}" for i in ids], pa.string()),
        "canonical_id": pa.array([f"C{i % 100_000}" for i in ids],
                                 pa.string()),
    })


def gen_triples(batch: pa.Table, domain: int) -> pa.Table:
    ids = batch.column("id").to_numpy()
    rng = np.random.Generator(np.random.PCG64(77 + int(ids[0])))
    s = rng.integers(0, domain, size=len(ids))
    o = rng.integers(0, domain, size=len(ids))
    return pa.table({
        "subj": pa.array([f"E{x}" for x in s], pa.string()),
        "pred": pa.array(["RELATED_TO"] * len(ids), pa.string()),
        "obj": pa.array([f"E{x}" for x in o], pa.string()),
    })


def main():
    import ray
    import ray.data as rd

    n_cluster = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_links = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_triples = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    import pyarrow.compute as pc

    from graphrag_rs_ray.stages.linking import (
        compute_links_ds,
        remap_column_bucketed,
    )

    # ---------------- phase A: blocked clustering at n_cluster --------
    base = f"/tmp/graft_scale_fuzzy_{n_cluster}"
    ents_dir = os.path.join(base, "ents")
    if not os.path.exists(os.path.join(base, "_DONE")):
        if os.path.exists(base):
            shutil.rmtree(base)
        os.makedirs(ents_dir)
        (rd.range(n_cluster).repartition(128)
         .map_batches(gen_entities, batch_format="pyarrow")
         .write_parquet(ents_dir))
        open(os.path.join(base, "_DONE"), "w").write("1")

    ents = rd.read_parquet(ents_dir)
    ents.count()                      # warm page cache + pool untimed

    t0 = time.perf_counter()
    links_ds = compute_links_ds(ents).materialize()
    got_links = links_ds.count()
    t_links = time.perf_counter() - t0

    planted = sum(1 for i in range(n_cluster) if i % 10 == 9)

    def planted_hits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        src = t.column("entity_id").to_pylist()
        dst = t.column("canonical_id").to_pylist()
        n = sum(1 for s, d in zip(src, dst)
                if int(s[8:]) % 10 == 9
                and d == f"PERSON_n{int(s[8:]) - 1}")
        return pa.table({"n": pa.array([n], pa.int64())})

    hits = links_ds.map_batches(planted_hits,
                                batch_format="pyarrow").sum("n")

    # ------- opt-in max_block_size leg (round-4 verdict task 1) -------
    mbs = int(os.environ.get("GRAFT_MAX_BLOCK_SIZE", "0"))
    if mbs:
        from graphrag_rs_ray.functions.similarity import LinkingConfig
        t0 = time.perf_counter()
        sub_links = compute_links_ds(
            ents, LinkingConfig(max_block_size=mbs)).materialize()
        t_sub = time.perf_counter() - t0
        sub_n = sub_links.count()
        sub_hits = int(sub_links.map_batches(
            planted_hits, batch_format="pyarrow").sum("n"))
        # divergence vs the faithful path: symmetric difference of the
        # (entity_id -> canonical_id) maps
        faithful = {}
        for b in links_ds.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                faithful.update(zip(b.column("entity_id").to_pylist(),
                                    b.column("canonical_id").to_pylist()))
        bounded = {}
        for b in sub_links.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                bounded.update(zip(b.column("entity_id").to_pylist(),
                                   b.column("canonical_id").to_pylist()))
        same = sum(1 for k, v in bounded.items() if faithful.get(k) == v)
        print(json.dumps({
            "op": "compute_links_ds_max_block_size",
            "n_entities": n_cluster, "max_block_size": mbs,
            "sec": round(t_sub, 1), "sec_faithful": round(t_links, 1),
            "n_links": sub_n, "n_links_faithful": got_links,
            "planted_recovered": sub_hits, "planted": planted,
            "recall_observed": round(sub_hits / planted, 4) if planted
            else 1.0,
            "links_agreeing_with_faithful": same,
            "divergent_or_missing": (got_links - same) + (sub_n - same),
        }), flush=True)

    # EXACTNESS gate: distributed links == driver-side greedy replay on
    # sampled blocks (recall above is observational; see docstring)
    import random

    from graphrag_rs_ray.functions.similarity import (LinkingConfig,
                                                      greedy_cluster,
                                                      soundex)
    got_by_src = {}
    for b in links_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            got_by_src.update(zip(b.column("entity_id").to_pylist(),
                                  b.column("canonical_id").to_pylist()))
    blocks: dict = {}
    for b in ents.iter_batches(batch_format="pyarrow"):
        for eid, name, conf in zip(b.column("entity_id").to_pylist(),
                                   b.column("name").to_pylist(),
                                   b.column("conf").to_pylist()):
            key = soundex(name.split(" ", 1)[0])
            blocks.setdefault(key, []).append((eid, name, conf))
    replayable = sorted(k for k, v in blocks.items() if len(v) <= 500)
    sample_keys = random.Random(7).sample(replayable,
                                          min(20, len(replayable)))
    replay_ok = True
    for k in sample_keys:
        replay = greedy_cluster(blocks[k], LinkingConfig())
        members = {e for e, _, _ in blocks[k]}
        dist = {s: d for s, d in got_by_src.items() if s in members}
        if replay != dist:
            replay_ok = False
    print(json.dumps({
        "op": "compute_links_ds", "n_entities": n_cluster,
        "sec": round(t_links, 1), "n_links": got_links,
        "planted": planted, "planted_recovered": int(hits),
        "recall_observed": round(int(hits) / planted, 4) if planted
        else 1.0,
        "extra_links": got_links - int(hits),
        "sampled_blocks_replay_equal": replay_ok}), flush=True)

    # ---------------- phase B: bucketed remap at n_links/n_triples ----
    base2 = f"/tmp/graft_scale_remap_{n_links}_{n_triples}"
    links_dir = os.path.join(base2, "links")
    tris_dir = os.path.join(base2, "tris")
    domain = 2 * n_links              # half the id space is linked
    if not os.path.exists(os.path.join(base2, "_DONE")):
        if os.path.exists(base2):
            shutil.rmtree(base2)
        os.makedirs(links_dir)
        os.makedirs(tris_dir)
        (rd.range(n_links).repartition(128)
         .map_batches(gen_links, batch_format="pyarrow")
         .write_parquet(links_dir))
        (rd.range(n_triples).repartition(128)
         .map_batches(lambda b: gen_triples(b, domain),
                      batch_format="pyarrow")
         .write_parquet(tris_dir))
        open(os.path.join(base2, "_DONE"), "w").write("1")

    big_links = rd.read_parquet(links_dir)
    tris = rd.read_parquet(tris_dir)
    tris.count()                      # warm untimed

    def count_prefix(col, pat):
        def f(t: pa.Table) -> pa.Table:
            m = pc.match_substring_regex(t.column(col), pat)
            return pa.table({"n": pa.array(
                [pc.sum(pc.cast(m, pa.int64())).as_py() or 0], pa.int64())})
        return f

    # exact invariant: subj/obj values E<u> with u < n_links are in
    # the link domain and must come out as C…; everything else passes
    # through untouched
    t0 = time.perf_counter()
    remapped = remap_column_bucketed(
        remap_column_bucketed(tris, big_links, "subj"), big_links, "obj"
    ).materialize()
    n_rows = remapped.count()
    t_remap = time.perf_counter() - t0

    got_c_subj = int(remapped.map_batches(
        count_prefix("subj", r"^C"), batch_format="pyarrow").sum("n"))
    got_c_obj = int(remapped.map_batches(
        count_prefix("obj", r"^C"), batch_format="pyarrow").sum("n"))

    # direct in-domain counts from the raw triples (u < n_links ⇔
    # linked), computed numerically — exact, no join needed
    def count_in_domain(col):
        def f(t: pa.Table) -> pa.Table:
            vals = pc.cast(pc.utf8_slice_codeunits(
                t.column(col), 1, 32), pa.int64())
            m = pc.less(vals, pa.scalar(n_links, pa.int64()))
            return pa.table({"n": pa.array(
                [pc.sum(pc.cast(m, pa.int64())).as_py() or 0], pa.int64())})
        return f

    want_subj = int(tris.map_batches(count_in_domain("subj"),
                                     batch_format="pyarrow").sum("n"))
    want_obj = int(tris.map_batches(count_in_domain("obj"),
                                    batch_format="pyarrow").sum("n"))
    print(json.dumps({
        "op": "remap_bucketed", "n_links": n_links,
        "n_triples": n_triples, "sec": round(t_remap, 1),
        "rows": n_rows,
        "subj_remapped": got_c_subj, "subj_expected": want_subj,
        "obj_remapped": got_c_obj, "obj_expected": want_obj,
        "exact": bool(n_rows == n_triples and got_c_subj == want_subj
                      and got_c_obj == want_obj)}), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
