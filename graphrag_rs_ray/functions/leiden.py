"""Leiden-style community detection kernel (no Ray) — port of
``graphrag-core/src/graph/leiden.rs``.

The reference implements a single-level Louvain local-move pass (greedy
Newman-modularity deltas over UNWEIGHTED incident-edge counts, despite the
f32 edge weights — ``leiden.rs:707-731``) followed by the Leiden
refinement step: any community whose induced subgraph is disconnected is
split into its connected components (``leiden.rs:594-668``).  Hierarchy /
``max_levels`` / ``max_cluster_size`` exist in the reference config but
are not enforced by its current algorithm (``hierarchical_leiden`` runs
level 0 only, ``leiden.rs:496-540``); they are mirrored here unused for
config parity.

Determinism: the reference iterates ``HashSet``s (neighbor communities,
refinement community ids), which is nondeterministic run-to-run in Rust.
This port fixes the iteration order (nodes in the given order, candidate
communities ascending, refinement communities ascending, components
seeded from the lowest-indexed unvisited node) so results are
reproducible — a documented strengthening, not a semantic change.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class LeidenConfig:
    """Mirrors ``LeidenConfig`` defaults (``leiden.rs:443-455``)."""
    max_cluster_size: int = 10          # reference: present, unenforced
    use_lcc: bool = True                # reference: LCC extraction is a no-op
    seed: int | None = None             # reference: rng created, unused
    resolution: float = 1.0
    max_levels: int = 5                 # reference: single level only
    min_improvement: float = 0.001


def _build_adjacency(nodes: list[str], edges: list[tuple[str, str]]):
    index = {v: i for i, v in enumerate(nodes)}
    adj: list[list[int]] = [[] for _ in nodes]
    for a, b in edges:
        ia, ib = index.get(a), index.get(b)
        if ia is None or ib is None or ia == ib:
            continue
        # undirected multigraph, like petgraph add_edge per relationship
        adj[ia].append(ib)
        adj[ib].append(ia)
    return adj


def leiden_local_move(nodes: list[str], edges: list[tuple[str, str]],
                      config: LeidenConfig | None = None) -> list[int]:
    """The sequential Louvain local-move pass alone (``leiden.rs:520-539``)
    — node-index → community id, BEFORE the refinement split.  Split out so
    the ``communities`` oracle can stage exactly the non-SQL-expressible
    state and re-derive the refinement + labeling in DuckDB."""
    config = config or LeidenConfig()
    n = len(nodes)
    if n == 0:
        return []
    adj = _build_adjacency(nodes, edges)
    communities = _local_move(adj, config)
    return communities


def leiden_communities(nodes: list[str], edges: list[tuple[str, str]],
                       config: LeidenConfig | None = None) -> dict[str, int]:
    """node → community id (level-0 partition).  ``edges`` are undirected
    relationship endpoints; self-loops are dropped (petgraph ``neighbors``
    of a self-edge would revisit the node; the reference KG adapter never
    emits them)."""
    config = config or LeidenConfig()
    n = len(nodes)
    if n == 0:
        return {}
    adj = _build_adjacency(nodes, edges)
    communities = _local_move(adj, config)
    communities = _refine_split(adj, communities)
    return {nodes[v]: communities[v] for v in range(n)}


def _local_move(adj: list[list[int]], config: LeidenConfig) -> list[int]:
    n = len(adj)
    degree = [len(a) for a in adj]
    total_edges = float(sum(degree))          # = 2 × edge count (leiden.rs:712)
    communities = list(range(n))              # each node its own community

    if total_edges > 0:
        sigma = degree[:]                     # per-community total degree
        improved, iteration = True, 0
        while improved and iteration < 100:   # leiden.rs:520-539
            improved = False
            for v in range(n):
                cur = communities[v]
                # edge counts from v into each neighboring community
                counts: dict[int, int] = {}
                for u in adj[v]:
                    cu = communities[u]
                    counts[cu] = counts.get(cu, 0) + 1
                k_from = counts.get(cur, 0)
                deg_v = degree[v]
                best, best_delta = cur, 0.0
                for cand in sorted(counts):
                    if cand == cur:
                        continue
                    k_to = counts[cand]
                    # Newman delta (leiden.rs:707-731)
                    delta = ((k_to - k_from) / total_edges) \
                        - config.resolution * deg_v \
                        * ((sigma[cand] - sigma[cur] + deg_v)
                           / (total_edges * total_edges))
                    if delta > best_delta:
                        best_delta, best = delta, cand
                if best != cur:
                    sigma[cur] -= deg_v
                    sigma[best] += deg_v
                    communities[v] = best
                    improved = True
            iteration += 1
    return communities


def _refine_split(adj: list[list[int]], communities: list[int]) -> list[int]:
    """Leiden refinement (``leiden.rs:594-668``): split any community whose
    induced subgraph is disconnected into its connected components."""
    communities = communities[:]
    # refinement: split disconnected communities into components
    members: dict[int, list[int]] = {}
    for v, c in enumerate(communities):
        members.setdefault(c, []).append(v)
    next_id = max(communities) + 1 if communities else 0
    for c in sorted(members):
        nodes_c = members[c]
        if len(nodes_c) <= 1:
            continue
        in_c = set(nodes_c)
        comps: list[list[int]] = []
        unvisited = set(nodes_c)
        for start in nodes_c:                  # ascending-order seeds
            if start not in unvisited:
                continue
            comp, stack = [], [start]
            unvisited.discard(start)
            while stack:
                v = stack.pop()
                comp.append(v)
                for u in adj[v]:
                    if u in in_c and u in unvisited:
                        unvisited.discard(u)
                        stack.append(u)
            comps.append(comp)
        if len(comps) > 1:                     # leiden.rs:648-668 split
            for comp in comps:
                for v in comp:
                    communities[v] = next_id
                next_id += 1

    return communities


def modularity(nodes: list[str], edges: list[tuple[str, str]],
               assignment: dict[str, int], resolution: float = 1.0) -> float:
    """Newman modularity Q = Σ_c [ e_c/m − γ·(deg_c/2m)² ] over the
    undirected multigraph (m = edge count)."""
    index = {v: i for i, v in enumerate(nodes)}
    deg: dict[int, float] = {}
    within: dict[int, float] = {}
    m = 0
    for a, b in edges:
        if a not in index or b not in index or a == b:
            continue
        m += 1
        ca, cb = assignment[a], assignment[b]
        deg[ca] = deg.get(ca, 0.0) + 1
        deg[cb] = deg.get(cb, 0.0) + 1
        if ca == cb:
            within[ca] = within.get(ca, 0.0) + 1
    if m == 0:
        return 0.0
    q = 0.0
    for c, d in deg.items():
        q += within.get(c, 0.0) / m - resolution * (d / (2.0 * m)) ** 2
    return q
