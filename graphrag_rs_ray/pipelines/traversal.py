"""Traversal-phase operators beyond plain BFS (``graph/traversal.rs``).

Reference: ``graphrag-core/src/graph/traversal.rs`` —
``ego_network`` (:248-309), ``multi_source_bfs`` (:322-374),
``query_focused_subgraph`` (:521-566).  ``get_neighbors`` (:486-505)
follows relationships in BOTH directions, so a self-loop is enumerated
twice per visit; every relationship with ``confidence <
min_relationship_strength`` is invisible to the walk (:279, :356).

Semantics pinned here (and re-derived by the DuckDB oracles):

- ``ego_network``: BFS layers 1..k from the ego node over the
  confidence-filtered graph.  Entity rows = (node, min-hop ≤ k).
  Relationship rows keep the reference's DUPLICATE-push quirk: each
  layer node u (hop(u) ≤ k-1) pushes every incident passing
  relationship once per incidence (:278-284), so a relationship's
  occurrence count = [hop(subj) ≤ k-1] + [hop(obj) ≤ k-1] (a self-loop
  contributes 2 — both ``get_neighbors`` arms fire).
- ``multi_source_bfs``: distances = min BFS hop from ANY source
  (first-enqueue wins ≡ min under FIFO order, :362); the distances map
  keeps nodes at hop == max_depth but entities only nodes popped at
  hop < max_depth (:340-351) → ``in_entities`` flag.
- ``query_focused_subgraph``: union of per-seed ego networks with
  first-seen entity dedup, (source, target, type)-key relationship
  dedup and min-over-seeds distances (:534-557).  min-over-seeds of
  per-seed BFS distance ≡ multi-source BFS distance, so the combined
  table reuses the same distance core.

Distributed shape: distances run the ``graph_ops.k_hop`` loop (frontier
Dataset, one ``bucketed_join`` per hop, min-hop re-aggregate — the
driver never holds the reached set); relationship rows come from two
``bucketed_join``s of the filtered relationship table against the
distance table (one per endpoint) + a hash-bucketed occurrence sum.
No step materializes the graph on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from graphrag_rs_ray.pipelines.graph_ops import k_hop
from graphrag_rs_ray.stages.hashagg import (
    bucketed_join,
    grouped_arrow_agg,
    hash_grouped_aggregate,
)


def _filtered(triples_ds, min_strength: float):
    """Relationship rows passing the strength gate (``traversal.rs:279``:
    strictly-less confidences are skipped, == passes)."""
    def keep(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t.column("conf"), min_strength)
        return t.filter(m).select(["subj", "pred", "obj"])
    return triples_ds.map_batches(keep, batch_format="pyarrow")


# ---- small-graph local kernels ------------------------------------------
# Two-path discipline (the connected_components pattern): each BFS round
# of the distributed loop costs seconds of fixed Ray overhead (3+
# shuffles), pure waste on a graph that fits one worker.  ≤
# small_graph_limit filtered edges → driver kernel; the sharded twin is
# the scale path; equality pinned in tests (small_graph_limit=0 forces
# the sharded path).

def _bfs_min_hops_local(rels: list[tuple[str, str, str]], seeds: list[str],
                        max_depth: int) -> dict[str, int]:
    from collections import deque
    adj: dict[str, list[str]] = {}
    for s, _, o in rels:
        adj.setdefault(s, []).append(o)
        adj.setdefault(o, []).append(s)
    dist = {n: 0 for n in seeds}
    dq = deque((n, 0) for n in seeds)
    while dq:
        u, d = dq.popleft()
        if d >= max_depth:
            continue
        for v in adj.get(u, ()):  # noqa: B905
            if v not in dist:
                dist[v] = d + 1
                dq.append((v, d + 1))
    return dist


def _subgraph_local(rels, seeds, hops: int, dedup: bool):
    import ray.data as rd
    dist = _bfs_min_hops_local(rels, seeds, hops)
    kind, a, b, rel_type, val = [], [], [], [], []
    for node in dist:
        kind.append("node"); a.append(node); b.append("")
        rel_type.append(""); val.append(dist[node])
    for s, p, o in rels:
        occ = ((dist.get(s, hops + 1) <= hops - 1)
               + (dist.get(o, hops + 1) <= hops - 1))
        if occ:
            kind.append("rel"); a.append(s); b.append(o)
            rel_type.append(p); val.append(1 if dedup else occ)
    return rd.from_arrow(pa.table({
        "kind": pa.array(kind, pa.string()),
        "a": pa.array(a, pa.string()),
        "b": pa.array(b, pa.string()),
        "rel_type": pa.array(rel_type, pa.string()),
        "val": pa.array(val, pa.int64())}))


def traversal_distances(triples_ds, seeds: list[str], max_depth: int,
                        min_strength: float = 0.5, num_buckets: int = 64,
                        small_graph_limit: int = 2_000_000):
    """(node, hop) min-BFS distances ≤ max_depth over the
    confidence-filtered undirected multigraph — the distance core shared
    by bfs / ego / multi-source / query-focused traversal.  The caller's
    ``small_graph_limit`` is FORWARDED into ``k_hop`` so forcing the
    sharded twin (limit 0) really exercises the distributed loop."""
    return k_hop(_filtered(triples_ds, min_strength), seeds, k=max_depth,
                 direction="both", num_buckets=num_buckets,
                 small_graph_limit=small_graph_limit)


def _rel_occurrences(rels, dist_ds, inner_max_hop: int,
                     num_buckets: int, dedup: bool):
    """Relationship rows of the subgraph: one ``bucketed_join`` per
    endpoint against the ≤ inner_max_hop distance slice, occurrence
    counts summed per (subj, pred, obj).  ``dedup=True`` collapses to
    the (source, target, type)-key set (``traversal.rs:544-550``).
    ``rels`` is the already-confidence-filtered relationship table."""
    inner = dist_ds.filter(expr=f"hop <= {inner_max_hop}").map_batches(
        lambda t: pa.table({"node": t.column("node")}),
        batch_format="pyarrow")

    def from_subj(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("subj"), "subj": t.column("subj"),
                         "pred": t.column("pred"), "obj": t.column("obj")})

    def from_obj(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("obj"), "subj": t.column("subj"),
                         "pred": t.column("pred"), "obj": t.column("obj")})

    hits = None
    for prep in (from_subj, from_obj):
        j = bucketed_join(rels.map_batches(prep, batch_format="pyarrow"),
                          inner, on=["node"], num_buckets=num_buckets)
        occ = j.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"),
                "occ": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow")
        hits = occ if hits is None else hits.union(occ)
    agg = hash_grouped_aggregate(
        hits, ["subj", "pred", "obj"],
        grouped_arrow_agg(["subj", "pred", "obj"], [("occ", "sum")],
                          rename=["subj", "pred", "obj", "occ"]),
        num_buckets=num_buckets)
    if not dedup:
        return agg

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"subj": t.column("subj"), "pred": t.column("pred"),
                         "obj": t.column("obj"),
                         "occ": pa.array(np.ones(t.num_rows, dtype=np.int64))})
    return agg.map_batches(one, batch_format="pyarrow")


def _subgraph_table(triples_ds, seeds: list[str], hops: int,
                    min_strength: float, num_buckets: int, dedup: bool,
                    small_graph_limit: int):
    filtered = _filtered(triples_ds, min_strength).materialize()
    if filtered.count() <= small_graph_limit:
        rels = [(r["subj"], r["pred"], r["obj"])
                for r in filtered.take_all()]
        return _subgraph_local(rels, seeds, hops, dedup)
    dist = k_hop(filtered, seeds, k=hops, direction="both",
                 num_buckets=num_buckets,
                 small_graph_limit=small_graph_limit).materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "kind": pa.array(["node"] * n, pa.string()),
            "a": t.column("node"),
            "b": pa.array([""] * n, pa.string()),
            "rel_type": pa.array([""] * n, pa.string()),
            "val": t.column("hop")})

    def rel_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "kind": pa.array(["rel"] * n, pa.string()),
            "a": t.column("subj"),
            "b": t.column("obj"),
            "rel_type": t.column("pred"),
            "val": t.column("occ")})

    rels = _rel_occurrences(filtered, dist, hops - 1, num_buckets, dedup)
    return (dist.map_batches(node_rows, batch_format="pyarrow")
            .union(rels.map_batches(rel_rows, batch_format="pyarrow")))


def ego_network(triples_ds, seed: str, k_hops: int = 2,
                min_strength: float = 0.5, num_buckets: int = 64,
                small_graph_limit: int = 2_000_000):
    """K-hop ego network around one entity (``traversal.rs:248-309``).
    Returns a tagged union table: ('node', node, '', '', min_hop) rows ∪
    ('rel', subj, obj, pred, occurrences) rows, where occurrences keeps
    the reference's duplicate-push semantics (see module docstring)."""
    return _subgraph_table(triples_ds, [seed], k_hops, min_strength,
                           num_buckets, dedup=False,
                           small_graph_limit=small_graph_limit)


def query_focused_subgraph(triples_ds, seeds: list[str],
                           expansion_hops: int = 2,
                           min_strength: float = 0.5,
                           num_buckets: int = 64,
                           small_graph_limit: int = 2_000_000):
    """Union of per-seed ego networks with entity / (source, target,
    type)-key relationship dedup and min-over-seeds distances
    (``traversal.rs:521-566``); rel rows carry val=1 (the combined set
    keeps each key once, :544-550).  min-over-seeds of per-seed BFS
    distance ≡ multi-source BFS distance, so both paths share the
    distance core."""
    return _subgraph_table(triples_ds, sorted(set(seeds)), expansion_hops,
                           min_strength, num_buckets, dedup=True,
                           small_graph_limit=small_graph_limit)


def multi_source_bfs(triples_ds, seeds: list[str], max_depth: int = 3,
                     min_strength: float = 0.5, num_buckets: int = 64,
                     small_graph_limit: int = 2_000_000):
    """Simultaneous BFS from several sources (``traversal.rs:322-374``):
    (node, dist, in_entities) where dist = min hop from any source
    (≤ max_depth) and in_entities flags nodes the reference pops before
    the depth gate (dist < max_depth, :340-351)."""
    import ray.data as rd
    filtered = _filtered(triples_ds, min_strength).materialize()
    if filtered.count() <= small_graph_limit:
        rels = [(r["subj"], r["pred"], r["obj"])
                for r in filtered.take_all()]
        dist = _bfs_min_hops_local(rels, sorted(set(seeds)), max_depth)
        nodes = sorted(dist)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "dist": pa.array([dist[n] for n in nodes], pa.int64()),
            "in_entities": pa.array(
                [int(dist[n] < max_depth) for n in nodes], pa.int64())}))
    dist = traversal_distances(triples_ds, sorted(set(seeds)), max_depth,
                               min_strength, num_buckets,
                               small_graph_limit=small_graph_limit)

    def fin(t: pa.Table) -> pa.Table:
        hop = t.column("hop")
        return pa.table({
            "node": t.column("node"),
            "dist": hop,
            "in_entities": pc.cast(pc.less(hop, max_depth), pa.int64())})

    return dist.map_batches(fin, batch_format="pyarrow")
