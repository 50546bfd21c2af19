"""Deterministic in-memory HNSW index (pure numpy/heapq, no Ray).

The reference's vector store hands HNSW to the ``instant_distance`` crate
behind a feature flag (``vector/mod.rs:54-178``); this is the published
algorithm itself (Malkov & Yashunin, TPAMI 2018 — see PAPERS.md) so the
per-partition ANN stage has a real navigable-small-world graph rather
than a library stub:

* cosine similarity over unit-normalized f64 vectors (matching the
  brute-force and IVF paths);
* node level drawn from the geometric distribution, but DETERMINISTIC —
  the uniform comes from the key's blake2b digest, not an RNG, so the
  index is identical across runs, processes and partitionings;
* all heap entries are (±sim, node_index) tuples — ties break on the
  smaller index, never on hash order.

Scale posture: one index per data shard (built inside the shard's task),
queries fan out to every shard and the per-shard candidate lists are
exact-reranked globally — the classic distributed-ANN shape.  Build is
O(n · ef_construction · M) per shard, so shard size is the memory/build
knob, not corpus size.
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np


def _unit_from_key(key: int | str) -> float:
    """Uniform in (0, 1] derived from the key's blake2b digest."""
    h = int.from_bytes(hashlib.blake2b(str(key).encode(),
                                       digest_size=8).digest(), "big")
    return (h + 1) / 2.0 ** 64


class HNSWIndex:
    """Hierarchical navigable small world graph over cosine similarity."""

    def __init__(self, m: int = 8, ef_construction: int = 64):
        self.m = m
        self.m0 = 2 * m
        self.mult = 1.0 / math.log(m)
        self.ef_construction = ef_construction
        self.keys: list[int] = []
        self.vecs: np.ndarray | None = None      # (n, d) unit rows
        self.layers: list[dict[int, list[int]]] = []   # layer → idx → nbrs
        self.entry: int | None = None
        self.entry_level: int = -1

    # ------------------------------------------------------------ build --
    def build(self, keys: list[int], vecs: np.ndarray) -> "HNSWIndex":
        """Insert in ascending-key order (deterministic graph)."""
        order = np.argsort(np.asarray(keys, dtype=np.int64), kind="stable")
        mat = np.asarray(vecs, dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
        self.vecs = mat[order]
        self.keys = [int(keys[i]) for i in order]
        for idx in range(len(self.keys)):
            self._insert(idx)
        return self

    def _level_of(self, key: int) -> int:
        return int(-math.log(_unit_from_key(key)) * self.mult)

    def _sims(self, q: np.ndarray, idxs: list[int]) -> np.ndarray:
        return self.vecs[idxs] @ q

    def _insert(self, idx: int) -> None:
        level = self._level_of(self.keys[idx])
        q = self.vecs[idx]
        while len(self.layers) <= level:
            self.layers.append({})
        for lc in range(level + 1):
            self.layers[lc][idx] = []
        if self.entry is None:
            self.entry, self.entry_level = idx, level
            return
        ep = self.entry
        # greedy descent above the node's level
        for lc in range(self.entry_level, level, -1):
            ep = self._greedy(q, ep, lc)
        # ef_construction search + bidirectional linking at each level
        for lc in range(min(level, self.entry_level), -1, -1):
            cand = self._search_layer(q, [ep], self.ef_construction, lc)
            cap = self.m0 if lc == 0 else self.m
            nbrs = [i for _, i in heapq.nlargest(
                cap, [(s, -i) for s, i in cand])]
            nbrs = [-i for i in nbrs]
            self.layers[lc][idx] = list(nbrs)
            for n in nbrs:
                lst = self.layers[lc][n]
                lst.append(idx)
                if len(lst) > cap:           # prune to the cap by sim
                    sims = self._sims(self.vecs[n], lst)
                    keep = sorted(range(len(lst)),
                                  key=lambda j: (-sims[j], lst[j]))[:cap]
                    self.layers[lc][n] = [lst[j] for j in keep]
            if cand:
                ep = max(cand, key=lambda t: (t[0], -t[1]))[1]
        if level > self.entry_level:
            self.entry, self.entry_level = idx, level

    # ----------------------------------------------------------- search --
    def _greedy(self, q: np.ndarray, ep: int, layer: int) -> int:
        cur = ep
        cur_sim = float(self.vecs[cur] @ q)
        improved = True
        while improved:
            improved = False
            nbrs = self.layers[layer].get(cur, [])
            if not nbrs:
                break
            sims = self._sims(q, nbrs)
            j = int(np.lexsort((nbrs, -sims))[0])
            if sims[j] > cur_sim:
                cur, cur_sim = nbrs[j], float(sims[j])
                improved = True
        return cur

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        visited = set(eps)
        ep_sims = self._sims(q, eps)
        cand = [(-float(s), e) for s, e in zip(ep_sims, eps)]
        heapq.heapify(cand)
        result = [(float(s), e) for s, e in zip(ep_sims, eps)]
        heapq.heapify(result)
        while cand:
            negs, c = heapq.heappop(cand)
            if len(result) >= ef and -negs < result[0][0]:
                break
            nbrs = [n for n in self.layers[layer].get(c, [])
                    if n not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            sims = self._sims(q, nbrs)
            for s, n in zip(sims, nbrs):
                s = float(s)
                if len(result) < ef or s > result[0][0]:
                    heapq.heappush(cand, (-s, n))
                    heapq.heappush(result, (s, n))
                    if len(result) > ef:
                        heapq.heappop(result)
        return result

    def search(self, q: np.ndarray, k: int,
               ef_search: int = 48) -> list[tuple[int, float]]:
        """Top-k (key, cosine) — the ef_search candidate pool reranked.
        ``q`` need not be normalized."""
        if self.entry is None:
            return []
        q = np.asarray(q, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        ep = self.entry
        for lc in range(self.entry_level, 0, -1):
            ep = self._greedy(q, ep, lc)
        pool = self._search_layer(q, [ep], max(ef_search, k), 0)
        top = sorted(pool, key=lambda t: (-t[0], self.keys[t[1]]))[:k]
        return [(self.keys[i], s) for s, i in top]

    def candidates(self, q: np.ndarray,
                   ef_search: int = 48) -> list[tuple[int, float]]:
        """The full layer-0 candidate pool (key, cosine) — staged for the
        oracle's exact within-candidates rerank."""
        if self.entry is None:
            return []
        q = np.asarray(q, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        ep = self.entry
        for lc in range(self.entry_level, 0, -1):
            ep = self._greedy(q, ep, lc)
        pool = self._search_layer(q, [ep], ef_search, 0)
        return [(self.keys[i], s) for s, i in pool]
