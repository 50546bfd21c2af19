"""Corpus-scale hybrid entity-linking dataflow — the distributed twin of
``functions/entity_linker.hybrid_linking_columnar`` (reference semantics:
``corpus/entity_linker.rs:330-375``, strategy "hybrid").

Every exact-tier decision depends only on the surface form, so the exact
tier is a pure ``groupby(name)``: it runs hash-partitioned via
``hash_grouped_aggregate`` with no driver state — the north-star
canonicalization pattern (mention rows → cluster ids by surface form).
Cluster identity (``exact:<name>``), member order (rank by ``(doc_id,
local_entity_id)`` within a name) and cluster metadata are all pure
functions of the name group, so no cross-bucket coordination exists.
Only the singleton fall-through — the reference's order-sequential
greedy fuzzy star pass — is collected to the driver, in global
``(doc_id, local_entity_id)`` order.  At web scale the singleton set is
the long tail of surface forms; the default reference config never runs
the fuzzy pass at all (``strategy="exact"``), and the hybrid path's
collection point is documented as the scale bound.

Equality with the driver-columnar twin is gated in
``tests/test_entity_linker.py::test_hybrid_grouped_equals_columnar``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.entity_linker import fuzzy_match_linking, infer_entity_type
from ..stages.hashagg import hash_grouped_aggregate

# one wide schema for the three row kinds the bucket kernel emits
_KIND_CLUSTER, _KIND_ASG, _KIND_SINGLE = 0, 1, 2


def _exact_tier_bucket(t: pa.Table) -> pa.Table:
    """All rows of a name-hash bucket → cluster rows (one per multi
    name), assignment rows (one per multi mention) and singleton
    pass-through rows, in one wide table keyed by ``_kind``."""
    t = t.sort_by([("name", "ascending"), ("doc_id", "ascending"),
                   ("local_entity_id", "ascending")])
    names = t.column("name").combine_chunks()
    n = len(names)
    enc = pc.dictionary_encode(names)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary
    counts = np.bincount(codes, minlength=len(uniq))
    multi = counts[codes] > 1 if n else np.zeros(0, dtype=bool)

    # rows are name-sorted ⇒ name runs are contiguous; member_idx = rank
    # by (doc_id, local_entity_id) within the run (the sort's tail keys)
    run_starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if n \
        else np.zeros(0, dtype=np.int64)
    member_idx = np.arange(n, dtype=np.int64) - np.repeat(
        run_starts, np.diff(np.r_[run_starts, n]))

    multi_codes = np.flatnonzero(counts > 1)
    multi_names = uniq.take(pa.array(multi_codes, pa.int64())).to_pylist()
    cid_vals = pa.array([f"exact:{m}" for m in multi_names], pa.string())
    cid_pos = np.full(len(uniq), -1, dtype=np.int64)
    cid_pos[multi_codes] = np.arange(len(multi_codes))

    multi_pa = pa.array(multi)
    n_multi = int(multi.sum())
    nulls_s = pa.nulls(len(multi_names), pa.string())
    nulls_i = pa.nulls(len(multi_names), pa.int64())
    single_pa = pa.array(~multi)
    n_single = n - n_multi
    parts = [
        # cluster rows
        pa.table({
            "_kind": pa.array(np.full(len(multi_names), _KIND_CLUSTER,
                                      dtype=np.int8)),
            "doc_id": nulls_s, "local_entity_id": nulls_s,
            "name": pa.array(multi_names, pa.string()),
            "cluster_id": cid_vals,
            "member_idx": nulls_i,
            "entity_type": pa.array(
                [infer_entity_type(m) for m in multi_names], pa.string()),
            "n_members": pa.array(counts[multi_codes], pa.int64())}),
        # assignment rows
        pa.table({
            "_kind": pa.array(np.full(n_multi, _KIND_ASG, dtype=np.int8)),
            "doc_id": t.column("doc_id").combine_chunks().filter(multi_pa),
            "local_entity_id": t.column("local_entity_id").combine_chunks()
                .filter(multi_pa),
            "name": names.filter(multi_pa),
            "cluster_id": cid_vals.take(
                pa.array(cid_pos[codes[multi]], pa.int64())),
            "member_idx": pa.array(member_idx[multi], pa.int64()),
            "entity_type": pa.nulls(n_multi, pa.string()),
            "n_members": pa.nulls(n_multi, pa.int64())}),
        # singleton pass-through
        pa.table({
            "_kind": pa.array(np.full(n_single, _KIND_SINGLE,
                                      dtype=np.int8)),
            "doc_id": t.column("doc_id").combine_chunks().filter(single_pa),
            "local_entity_id": t.column("local_entity_id").combine_chunks()
                .filter(single_pa),
            "name": names.filter(single_pa),
            "cluster_id": pa.nulls(n_single, pa.string()),
            "member_idx": pa.nulls(n_single, pa.int64()),
            "entity_type": pa.nulls(n_single, pa.string()),
            "n_members": pa.nulls(n_single, pa.int64())}),
    ]
    return pa.concat_tables(parts)


def _take_kind(out_ds, kind: int):
    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("_kind"), kind))
    return out_ds.map_batches(f, batch_format="pyarrow")


def hybrid_linking_grouped(flat_ds, num_buckets: int = 64,
                           fuzzy_threshold: float = 0.85):
    """(doc_id, local_entity_id, name) mention Dataset → ``(clusters_ds,
    asg_ds, stats)`` with the exact same cluster/assignment/stat values
    as ``hybrid_linking_columnar`` over the sorted flat table (row order
    differs — both tables are unordered by contract; the oracle compare
    is order-insensitive).

    clusters_ds: cluster_id, kind, canonical_name, entity_type,
    n_members, confidence_score, document_frequency, aliases.
    asg_ds: doc_id, local_entity_id, cluster_id, kind, member_idx.
    """
    import ray.data as rd

    n_total = flat_ds.count()
    out = hash_grouped_aggregate(flat_ds, ["name"], _exact_tier_bucket,
                                 num_buckets=num_buckets).materialize()

    def cluster_rows(t: pa.Table) -> pa.Table:
        nm = t.column("name")
        nn = t.num_rows
        return pa.table({
            "cluster_id": t.column("cluster_id"),
            "kind": pa.array(["exact"] * nn, pa.string()),
            "canonical_name": nm,
            "entity_type": t.column("entity_type"),
            "n_members": t.column("n_members"),
            "confidence_score": pa.array(np.ones(nn), pa.float64()),
            "document_frequency": t.column("n_members"),
            "aliases": nm})

    def asg_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "local_entity_id": t.column("local_entity_id"),
            "cluster_id": t.column("cluster_id"),
            "kind": pa.array(["exact"] * t.num_rows, pa.string()),
            "member_idx": t.column("member_idx")})

    clusters_ds = _take_kind(out, _KIND_CLUSTER).map_batches(
        cluster_rows, batch_format="pyarrow")
    asg_ds = _take_kind(out, _KIND_ASG).map_batches(
        asg_rows, batch_format="pyarrow")

    # singleton fall-through: collected to the driver in global sorted
    # order — the greedy fuzzy star pass is order-sequential by
    # reference semantics (documented scale bound of the hybrid path)
    singles_tbl = pa.concat_tables(
        [pa.table({"doc_id": b.column("doc_id"),
                   "local_entity_id": b.column("local_entity_id"),
                   "name": b.column("name")})
         for b in _take_kind(out, _KIND_SINGLE)
         .iter_batches(batch_format="pyarrow")] or
        [pa.table({"doc_id": pa.array([], pa.string()),
                   "local_entity_id": pa.array([], pa.string()),
                   "name": pa.array([], pa.string())})])
    singles_tbl = singles_tbl.sort_by([
        ("doc_id", "ascending"), ("local_entity_id", "ascending")])
    singles = [{"doc_id": d, "local_entity_id": l, "name": m}
               for d, l, m in zip(singles_tbl.column("doc_id").to_pylist(),
                                  singles_tbl.column("local_entity_id")
                                  .to_pylist(),
                                  singles_tbl.column("name").to_pylist())]
    fuzzy, fuzzy_matches = fuzzy_match_linking(singles, fuzzy_threshold)
    if fuzzy:
        fc = {"cluster_id": [], "kind": [], "canonical_name": [],
              "entity_type": [], "n_members": [], "confidence_score": [],
              "document_frequency": [], "aliases": []}
        fa = {"doc_id": [], "local_entity_id": [], "cluster_id": [],
              "kind": [], "member_idx": []}
        for c in fuzzy:
            fc["cluster_id"].append(c["cluster_id"])
            fc["kind"].append(c["kind"])
            fc["canonical_name"].append(c["canonical_name"])
            fc["entity_type"].append(c["entity_type"])
            fc["n_members"].append(len(c["members"]))
            fc["confidence_score"].append(c["confidence_score"])
            fc["document_frequency"].append(c["document_frequency"])
            fc["aliases"].append(",".join(c["aliases"]))
            for idx, m in enumerate(c["members"]):
                fa["doc_id"].append(m["doc_id"])
                fa["local_entity_id"].append(m["local_entity_id"])
                fa["cluster_id"].append(c["cluster_id"])
                fa["kind"].append(c["kind"])
                fa["member_idx"].append(idx)
        clusters_ds = clusters_ds.union(rd.from_arrow(pa.table({
            "cluster_id": pa.array(fc["cluster_id"], pa.string()),
            "kind": pa.array(fc["kind"], pa.string()),
            "canonical_name": pa.array(fc["canonical_name"], pa.string()),
            "entity_type": pa.array(fc["entity_type"], pa.string()),
            "n_members": pa.array(fc["n_members"], pa.int64()),
            "confidence_score": pa.array(fc["confidence_score"],
                                         pa.float64()),
            "document_frequency": pa.array(fc["document_frequency"],
                                           pa.int64()),
            "aliases": pa.array(fc["aliases"], pa.string())})))
        asg_ds = asg_ds.union(rd.from_arrow(pa.table({
            "doc_id": pa.array(fa["doc_id"], pa.string()),
            "local_entity_id": pa.array(fa["local_entity_id"], pa.string()),
            "cluster_id": pa.array(fa["cluster_id"], pa.string()),
            "kind": pa.array(fa["kind"], pa.string()),
            "member_idx": pa.array(fa["member_idx"], pa.int64())})))

    clusters_ds = clusters_ds.materialize()
    n_exact_clusters = clusters_ds.count() - len(fuzzy)
    n_multi = n_total - len(singles)
    exact_matches = n_multi - n_exact_clusters
    stats = {"entities_processed": n_total,
             "clusters_created": n_exact_clusters + len(fuzzy),
             "exact_matches": exact_matches,
             "fuzzy_matches": fuzzy_matches,
             "semantic_matches": 0, "lmcd_clusters": 0,
             "disambiguation_conflicts": 0,
             "linking_accuracy": ((exact_matches + fuzzy_matches) / n_total
                                  if n_total else 0.0)}
    return clusters_ds, asg_ds, stats
