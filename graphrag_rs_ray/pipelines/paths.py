"""Weighted path finding over the relationship graph.

Reference: ``graphrag-core/src/graph/analytics.rs``
  - ``shortest_path`` (Dijkstra, :272-345) — single-source weighted
    shortest path over the UNDIRECTED weighted adjacency built by
    ``GraphAnalytics::new`` (:63-88, both directions inserted).
  - ``all_paths`` / ``dfs_paths`` (:347-404) — every simple path from
    ``start`` to ``end`` with at most ``max_depth`` nodes; the end node
    is terminal (reached ⇒ the path is emitted and NOT extended).

Two paths per operator, identical output (the repo-wide discipline):

* ``small_graph_limit`` or fewer edge rows → a driver-local kernel
  (heapq Dijkstra / iterative DFS).  The per-round fixed Ray cost is
  pure waste on graphs that fit one heap.
* larger → a sharded dataflow: Bellman-Ford rounds of
  ``bucketed_join`` + min-aggregate for SSSP (convergence check folded
  into the round's aggregate via a carried old-dist column, per-round
  Parquet checkpoint as the lineage cut — same rules as
  ``connected_components``), and breadth-wise frontier expansion for
  ``all_paths`` (each round extends every live path by one edge; the
  visited check is a vectorized numpy substring scan over the
  delimiter-encoded path column).

Determinism notes (both paths, and the DuckDB oracle, agree exactly):

* distances are f64 sums accumulated IN PATH ORDER — fl(+) is monotone,
  so per-round min composition (Bellman-Ford) and settled-order
  relaxation (Dijkstra) both yield min over the identical set of
  left-associated path sums: bit-equal results, no rounding needed;
* the reference's reconstructed path is whatever HashSet iteration
  order produced (not reproducible even in the reference), so we expose
  the deterministic quotient instead: ``pred(v)`` = lexicographically
  smallest ``u`` with ``dist(u) + w(u,v) == dist(v)``;
* unreachable nodes are omitted (reference returns ``None``).

Partitioning assumptions: SSSP state is one row per node — rounds are
O(diameter) joins on the edge table's partitioning key.  ``all_paths``
frontiers grow with the path count; the depth bound is the contract
(the reference caps at ``max_depth`` for the same reason).  Weights
must be positive.
"""

from __future__ import annotations

import heapq
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.hashagg import (
    bucketed_join,
    grouped_arrow_agg,
    hash_grouped_aggregate,
)

SEP = "|"


def _symmetrize(edges_ds):
    """(src, dst, w) → both directions, self-loops dropped
    (``GraphAnalytics::new`` inserts each edge under both endpoints)."""
    def both(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))
        return pa.concat_tables([
            pa.table({"src": keep.column("src"), "dst": keep.column("dst"),
                      "w": pc.cast(keep.column("w"), pa.float64())}),
            pa.table({"src": keep.column("dst"), "dst": keep.column("src"),
                      "w": pc.cast(keep.column("w"), pa.float64())})])
    return edges_ds.map_batches(both, batch_format="pyarrow")


def _pred_table(dist: dict[str, float], adj_rows) -> dict[str, str]:
    """pred(v) = min u with dist[u] + w == dist[v] (source excluded by
    the caller).  ``adj_rows`` yields (src, dst, w) in both directions."""
    pred: dict[str, str] = {}
    for u, v, w in adj_rows:
        du = dist.get(u)
        dv = dist.get(v)
        if du is None or dv is None:
            continue
        if du + w == dv and (v not in pred or u < pred[v]):
            pred[v] = u
    return pred


def shortest_paths(edges_ds, source: str, num_buckets: int = 64,
                   max_rounds: int = 64,
                   small_graph_limit: int = 2_000_000):
    """Single-source weighted shortest paths (``analytics.rs:272-345``).

    ``edges_ds``: (src, dst, w) rows, treated as undirected, w > 0.
    Returns a Dataset (node, dist, pred) over reachable nodes; the
    source row has ``pred = ''``.  ``small_graph_limit=0`` forces the
    sharded Bellman-Ford path (equality tests do)."""
    if edges_ds.count() <= small_graph_limit:
        return _shortest_paths_local(edges_ds, source)
    return _shortest_paths_sharded(edges_ds, source, num_buckets, max_rounds)


def _shortest_paths_local(edges_ds, source: str):
    import ray.data as rd
    adj: list[tuple[str, str, float]] = []
    nbrs: dict[str, list[tuple[str, float]]] = {}
    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        for s, d, w in zip(b.column("src").to_pylist(),
                           b.column("dst").to_pylist(),
                           b.column("w").to_pylist()):
            if s == d:
                continue
            w = float(w)
            adj.append((s, d, w))
            adj.append((d, s, w))
            nbrs.setdefault(s, []).append((d, w))
            nbrs.setdefault(d, []).append((s, w))
    dist: dict[str, float] = {source: 0.0}
    done: set[str] = set()
    heap: list[tuple[float, str]] = [(0.0, source)]
    while heap:
        du, u = heapq.heappop(heap)
        if u in done:
            continue
        done.add(u)
        for v, w in nbrs.get(u, ()):  # noqa: B909
            alt = du + w
            if v not in dist or alt < dist[v]:
                dist[v] = alt
                heapq.heappush(heap, (alt, v))
    pred = _pred_table(dist, adj)
    nodes = sorted(dist)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.string()),
        "dist": pa.array([dist[n] for n in nodes], pa.float64()),
        "pred": pa.array(["" if n == source else pred[n] for n in nodes],
                         pa.string())}))


def _shortest_paths_sharded(edges_ds, source: str, num_buckets: int,
                            max_rounds: int):
    import ray.data as rd
    sym = _symmetrize(edges_ds).materialize()
    work_dir = tempfile.mkdtemp(prefix="graphrag_sssp_")
    dist = rd.from_arrow(pa.table({"node": pa.array([source], pa.string()),
                                   "dist": pa.array([0.0], pa.float64())}))
    for rnd in range(max_rounds):
        # candidates: every reached node relaxes its out-edges
        as_src = dist.map_batches(
            lambda t: pa.table({"src": t.column("node"),
                                "d_src": t.column("dist")}),
            batch_format="pyarrow")
        relax = bucketed_join(sym, as_src, on=["src"], num_buckets=num_buckets)
        cand = relax.map_batches(
            lambda t: pa.table({
                "node": t.column("dst"),
                "dist": pc.add(t.column("d_src"), t.column("w")),
                "old_dist": pa.nulls(t.num_rows, pa.float64())}),
            batch_format="pyarrow")
        older = dist.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "dist": t.column("dist"),
                                "old_dist": t.column("dist")}),
            batch_format="pyarrow")
        merged = hash_grouped_aggregate(
            cand.union(older), ["node"],
            grouped_arrow_agg(["node"],
                              [("dist", "min"), ("old_dist", "max")],
                              rename=["node", "dist", "old_dist"]),
            num_buckets=num_buckets).materialize()
        n_changed = merged.map_batches(
            lambda t: pa.table({"chg": pc.cast(pc.or_kleene(
                pc.is_null(t.column("old_dist")),
                pc.not_equal(t.column("dist"), t.column("old_dist"))),
                pa.int64())}),
            batch_format="pyarrow").sum("chg")
        if not n_changed:
            break
        ck = os.path.join(work_dir, f"dist_{rnd % 2}")
        if os.path.exists(ck):           # write_parquet APPENDS
            shutil.rmtree(ck)
        os.makedirs(ck)
        merged.map_batches(lambda t: t.select(["node", "dist"]),
                           batch_format="pyarrow").write_parquet(ck)
        dist = rd.read_parquet(ck)

    # pred(v) = min u with dist(u) + w(u, v) == dist(v)
    as_src = dist.map_batches(
        lambda t: pa.table({"src": t.column("node"),
                            "d_src": t.column("dist")}),
        batch_format="pyarrow")
    cand = bucketed_join(sym, as_src, on=["src"],
                         num_buckets=num_buckets).map_batches(
        lambda t: pa.table({"node": t.column("dst"),
                            "u": t.column("src"),
                            "cd": pc.add(t.column("d_src"), t.column("w"))}),
        batch_format="pyarrow")
    dv = dist.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "d_node": t.column("dist")}),
        batch_format="pyarrow")
    hit = bucketed_join(cand, dv, on=["node"],
                        num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.equal(t.column("cd"), t.column("d_node"))),
        batch_format="pyarrow")
    preds = hash_grouped_aggregate(
        hit, ["node"],
        grouped_arrow_agg(["node"], [("u", "min"), ("d_node", "min")],
                          rename=["node", "pred", "dist"]),
        num_buckets=num_buckets)
    src_row = rd.from_arrow(pa.table({
        "node": pa.array([source], pa.string()),
        "pred": pa.array([""], pa.string()),
        "dist": pa.array([0.0], pa.float64())}))
    out = preds.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("node"), source)),
        batch_format="pyarrow").union(src_row).map_batches(
        lambda t: t.select(["node", "dist", "pred"]),
        batch_format="pyarrow").materialize()
    shutil.rmtree(work_dir, ignore_errors=True)
    return out


def all_paths(edges_ds, start: str, end: str, max_depth: int = 4,
              num_buckets: int = 64, small_graph_limit: int = 2_000_000):
    """Every simple path start→end with ≤ ``max_depth`` nodes
    (``analytics.rs:347-404``); the end node is terminal.  Returns a
    Dataset (path, n_nodes, weight) with ``path`` the ``|``-joined node
    list and ``weight`` the f64 edge-weight sum in path order.
    ``small_graph_limit=0`` forces the frontier-expansion path."""
    if max_depth < 1:
        import ray.data as rd
        return rd.from_arrow(_empty_paths())
    if edges_ds.count() <= small_graph_limit:
        return _all_paths_local(edges_ds, start, end, max_depth)
    return _all_paths_sharded(edges_ds, start, end, max_depth, num_buckets)


def _empty_paths() -> pa.Table:
    return pa.table({"path": pa.array([], pa.string()),
                     "n_nodes": pa.array([], pa.int64()),
                     "weight": pa.array([], pa.float64())})


def _all_paths_local(edges_ds, start: str, end: str, max_depth: int):
    import ray.data as rd
    nbrs: dict[str, list[tuple[str, float]]] = {}
    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        for s, d, w in zip(b.column("src").to_pylist(),
                           b.column("dst").to_pylist(),
                           b.column("w").to_pylist()):
            if s == d:
                continue
            w = float(w)
            nbrs.setdefault(s, []).append((d, w))
            nbrs.setdefault(d, []).append((s, w))
    out_paths: list[str] = []
    out_w: list[float] = []
    # iterative DFS mirroring dfs_paths: stack of (node, path, weight)
    stack: list[tuple[str, list[str], float]] = [(start, [start], 0.0)]
    while stack:
        node, path, w = stack.pop()
        if node == end:
            out_paths.append(SEP.join(path))
            out_w.append(w)
            continue                      # end is terminal
        if len(path) >= max_depth:
            continue
        seen = set(path)
        for nbr, ew in nbrs.get(node, ()):  # noqa: B909
            if nbr not in seen:
                stack.append((nbr, path + [nbr], w + ew))
    return rd.from_arrow(pa.table({
        "path": pa.array(out_paths, pa.string()),
        "n_nodes": pa.array([p.count(SEP) + 1 for p in out_paths], pa.int64()),
        "weight": pa.array(out_w, pa.float64())}))


def _not_visited_mask(paths: pa.Array, nexts: pa.Array) -> pa.Array:
    """Vectorized simple-path check: is ``|next|`` absent from
    ``|path|``?  numpy's elementwise char.find — no Python row loop."""
    pv = paths.to_numpy(zero_copy_only=False).astype(str)
    nv = nexts.to_numpy(zero_copy_only=False).astype(str)
    p = np.char.add(np.char.add(SEP, pv), SEP)
    n = np.char.add(np.char.add(SEP, nv), SEP)
    return pa.array(np.char.find(p, n) < 0)


def _all_paths_sharded(edges_ds, start: str, end: str, max_depth: int,
                       num_buckets: int):
    import ray.data as rd
    sym = _symmetrize(edges_ds).map_batches(
        lambda t: t.rename_columns(["last", "nxt", "ew"]),
        batch_format="pyarrow").materialize()
    frontier = rd.from_arrow(pa.table({
        "last": pa.array([start], pa.string()),
        "path": pa.array([start], pa.string()),
        "weight": pa.array([0.0], pa.float64()),
        "n_nodes": pa.array([1], pa.int64())}))
    work_dir = tempfile.mkdtemp(prefix="graphrag_allpaths_")
    results: list[pa.Table] = []

    def take_hits(fr) -> pa.Table:
        batches = list(fr.map_batches(
            lambda t: t.filter(pc.equal(t.column("last"), end)),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
        batches = [b for b in batches if b.num_rows]
        if not batches:
            return _empty_paths()
        t = pa.concat_tables(batches, promote_options="default")
        return t.select(["path", "n_nodes", "weight"])

    for rnd in range(max_depth - 1):
        results.append(take_hits(frontier))
        active = frontier.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("last"), end)),
            batch_format="pyarrow")
        ext = bucketed_join(active, sym, on=["last"],
                            num_buckets=num_buckets)

        def step(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return pa.table({"last": pa.array([], pa.string()),
                                 "path": pa.array([], pa.string()),
                                 "weight": pa.array([], pa.float64()),
                                 "n_nodes": pa.array([], pa.int64())})
            keep = t.filter(_not_visited_mask(t.column("path").combine_chunks(),
                                              t.column("nxt").combine_chunks()))
            sep = pa.array([SEP] * keep.num_rows, pa.string())
            return pa.table({
                "last": keep.column("nxt"),
                "path": pc.binary_join_element_wise(
                    keep.column("path"), keep.column("nxt"), sep),
                "weight": pc.add(keep.column("weight"), keep.column("ew")),
                "n_nodes": pc.add(keep.column("n_nodes"), 1)})

        stepped = ext.map_batches(step, batch_format="pyarrow")
        ck = os.path.join(work_dir, f"frontier_{rnd % 2}")
        if os.path.exists(ck):           # write_parquet APPENDS
            shutil.rmtree(ck)
        os.makedirs(ck)
        stepped.write_parquet(ck)
        frontier = rd.read_parquet(ck)
        if not frontier.count():
            break
    results.append(take_hits(frontier))
    out = pa.concat_tables([r for r in results if r.num_rows]
                           or [_empty_paths()], promote_options="default")
    shutil.rmtree(work_dir, ignore_errors=True)
    return rd.from_arrow(out)
