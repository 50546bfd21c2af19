"""PageRank-based retrieval kernels — port of
``graphrag-core/src/retrieval/pagerank_retrieval.rs`` (fast-GraphRAG
approach) + the personalized-PageRank calculator it drives
(``graphrag-core/src/graph/pagerank.rs``).

Semantics pinned here (the distributed twins live in
``pipelines/pagerank_retrieval.py``; the DuckDB oracle re-derives all of
it):

- Vector similarity (``pagerank_retrieval.rs:228-283``): query and
  "name entity_type" both lowercased and whitespace-split;
  ``intersection`` counts QUERY tokens (duplicates included) present in
  the entity token LIST; ``union = |q| + |e| - intersection`` (list
  lengths, duplicates kept).  The Jaccard entry is inserted only when
  intersection > 0 AND similarity > 0.1; every entity MENTION whose
  chunk text (lowercased) contains the lowercased query adds a flat
  +0.3 (``:264-276`` — repeated addition; we compute
  ``0.3 * n_matching_mentions``, identical after the round(8) output
  discipline).
- Reset vector (``pagerank.rs:388-407``): vector scores normalized to
  sum 1 (``pagerank_retrieval.rs:296-310``), written over a DEFAULT of
  1/n — nodes without a vector score keep reset 1/n, so the reset
  vector's total mass exceeds 1.  Faithful (unlike the HippoRAG reset,
  which is a probability distribution).
- PPR iteration — the reference has THREE inconsistent paths:
  (a) dense (n < sparse_threshold, ``pagerank.rs:221-246``):
      ``new = (1-d)·reset + d·A·s`` with NO out-degree normalization
      and NO dangling handling (A row-major from→to, so the matvec
      pulls each node's OWN outgoing weights) — divergent on graphs
      with spectral radius > 1/d; pinned in ``dense_ppr_quirk`` on a
      DAG where it converges;
  (b) parallel sparse (the production large-graph default,
      ``pagerank.rs:248-269,300-358``): contribution
      ``d·s_j·w_ji / wsum_j`` (out-degree = WEIGHT SUM,
      ``pagerank.rs:117-128``), dangling nodes (wsum 0) redistribute
      ``d·s_j/n`` uniformly, start ``s0 = 1/n``, stop on
      ``max|Δ| < tolerance`` or ``max_iterations``;
  (c) sequential sparse (``pagerank_iteration``, :409-446) divides by
      the entry COUNT (nnz) instead of the weight sum.
  We pin (b) as the one production path (both engine twins + oracle)
  and document (a)/(c) as reference inconsistencies.
- Combination (``pagerank.rs:536-566``): over the union of vector and
  pagerank key sets, ``0.3·vector + 0.4·pagerank + 0.2·chunk_score``
  with chunk_score hardwired 0.0 (``:568-572``); results below
  min_score_threshold (default 0.1) are dropped
  (``pagerank_retrieval.rs:166-169``).
- Expansion (``pagerank_retrieval.rs:172-215``): one row per (entity,
  chunk-containing-entity); an entity with NO chunk rows falls back to
  a synthetic ``entity_<id>`` chunk row.  Final order: score desc,
  truncate max_results; ties broken (entity_id, chunk_id) asc —
  documented deviation, the reference's HashMap iteration order is
  unstable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PageRankRetrievalConfig:
    """``pagerank_retrieval.rs:59-75`` + ``pagerank.rs:38-53`` defaults.
    ``max_iterations``/``tolerance`` here are the driver-query pinning
    (fixed iterations, tolerance 0 → the DuckDB oracle can replay the
    recurrence); the reference default is (100, 1e-6)."""

    damping_factor: float = 0.85
    max_iterations: int = 12
    tolerance: float = 0.0
    vector_weight: float = 0.3
    pagerank_weight: float = 0.4
    chunk_weight: float = 0.2
    min_score_threshold: float = 0.1
    max_results: int = 25
    min_similarity: float = 0.1
    mention_bonus: float = 0.3
    round_digits: int = 8


def split_words(text: str) -> list[str]:
    """Rust ``split_whitespace``: any-whitespace split, no empties."""
    return text.lower().split()


def jaccard_entity_score(query_words: list[str], name: str,
                         entity_type: str) -> float | None:
    """``pagerank_retrieval.rs:239-262``: list-based Jaccard of query
    words vs "name entity_type" words; None unless intersection > 0 and
    similarity > 0.1."""
    entity_words = split_words(f"{name} {entity_type}")
    inter = sum(1 for w in query_words if w in entity_words)
    if inter == 0:
        return None
    union = len(query_words) + len(entity_words) - inter
    sim = inter / union
    return sim if sim > 0.1 else None


def vector_scores_local(query: str,
                        entities: list[tuple[str, str, str]],
                        mention_chunks: dict[str, list[str]],
                        chunk_texts: dict[str, str],
                        cfg: PageRankRetrievalConfig) -> dict[str, float]:
    """Driver-side twin of the vector-similarity stage (unit tests /
    small inputs).  ``entities``: (entity_id, name, type);
    ``mention_chunks``: entity_id → chunk_id PER MENTION (duplicates =
    repeated mentions, each worth +0.3 when its chunk matches)."""
    qwords = split_words(query)
    qlower = query.lower()
    scores: dict[str, float] = {}
    for eid, name, etype in entities:
        sim = jaccard_entity_score(qwords, name, etype)
        if sim is not None:
            scores[eid] = sim
        n_match = sum(1 for c in mention_chunks.get(eid, ())
                      if qlower in chunk_texts.get(c, "").lower())
        if n_match:
            scores[eid] = scores.get(eid, 0.0) + cfg.mention_bonus * n_match
    return {k: round(v, cfg.round_digits) for k, v in scores.items()}


def build_reset(vector_scores: dict[str, float],
                nodes: list[str]) -> np.ndarray:
    """``pagerank_retrieval.rs:296-310`` + ``pagerank.rs:388-407``:
    normalize the vector scores to total 1, write over a uniform-1/n
    default (unmatched nodes KEEP 1/n)."""
    n = len(nodes)
    reset = np.full(n, 1.0 / n)
    total = sum(vector_scores.values())
    if vector_scores and total > 0.0:
        idx = {node: i for i, node in enumerate(nodes)}
        for eid, s in vector_scores.items():
            i = idx.get(eid)
            if i is not None:
                reset[i] = s / total
    return reset


def ppr_weighted_local(edges: list[tuple[str, str, float]],
                       nodes: list[str], reset: np.ndarray,
                       cfg: PageRankRetrievalConfig) -> dict[str, float]:
    """Production PPR recurrence (``pagerank.rs:248-269,300-358`` —
    weight-sum out-degrees, uniform dangling redistribution, s0 = 1/n),
    vectorized with np.add.at; scores rounded to ``round_digits`` per
    iteration (both twins and the oracle share the discipline, killing
    summation-order ulp drift).  ``edges`` are the already-summed
    (src, dst, weight) triplets (``core/mod.rs:731-780`` sums duplicate
    (from, to) entries via TriMat→CSR)."""
    n = len(nodes)
    if n == 0:
        return {}
    idx = {node: i for i, node in enumerate(nodes)}
    src = np.array([idx[s] for s, _, _ in edges], dtype=np.int64)
    dst = np.array([idx[t] for _, t, _ in edges], dtype=np.int64)
    w = np.array([wt for _, _, wt in edges], dtype=np.float64)
    wsum = np.zeros(n)
    np.add.at(wsum, src, w)
    dangling = wsum == 0.0
    safe = np.where(dangling, 1.0, wsum)
    d = cfg.damping_factor
    s = np.full(n, 1.0 / n)
    for _ in range(cfg.max_iterations):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, d * s[src] * w / safe[src])
        dang_mass = d * s[dangling].sum() / n
        new = np.round((1.0 - d) * reset + contrib + dang_mass,
                       cfg.round_digits)
        if np.abs(new - s).max() < cfg.tolerance:
            s = new
            break
        s = new
    return {node: float(s[i]) for i, node in enumerate(nodes)}


def dense_ppr_quirk(edges: list[tuple[str, str, float]], nodes: list[str],
                    reset: np.ndarray, damping: float = 0.85,
                    max_iterations: int = 100,
                    tolerance: float = 1e-6) -> dict[str, float]:
    """The reference's small-graph dense path (``pagerank.rs:221-246``),
    QUIRK PRESERVED: ``new = (1-d)·reset + d·A·s`` with A the raw
    weighted adjacency (row = from) — no out-degree normalization, no
    dangling handling.  Convergent only when ρ(d·A) < 1 (e.g. DAGs);
    kept as a documented reference inconsistency, NOT a production
    path."""
    n = len(nodes)
    idx = {node: i for i, node in enumerate(nodes)}
    a = np.zeros((n, n))
    for s_, t_, w_ in edges:
        a[idx[s_], idx[t_]] += w_
    s = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        new = (1.0 - damping) * reset + damping * (a @ s)
        if np.abs(new - s).max() < tolerance:
            s = new
            break
        s = new
    return {node: float(s[i]) for i, node in enumerate(nodes)}


def combine_scores(vector_scores: dict[str, float],
                   pagerank_scores: dict[str, float],
                   cfg: PageRankRetrievalConfig) -> dict[str, float]:
    """``pagerank.rs:536-566``: union of key sets, weighted sum with the
    chunk term hardwired 0 (``:568-572``); rounded to round_digits."""
    combined = {}
    for eid in set(vector_scores) | set(pagerank_scores):
        combined[eid] = round(
            cfg.vector_weight * vector_scores.get(eid, 0.0)
            + cfg.pagerank_weight * pagerank_scores.get(eid, 0.0),
            cfg.round_digits)
    return combined


def quick_entity_search(entity_name: str,
                        entities: list[tuple[str, str, str]],
                        max_results: int) -> list[tuple[str, float]]:
    """``pagerank_retrieval.rs:333-372``: substring match on lowercased
    names — 1.0 exact, 0.8 partial; score desc, truncate.  Tie-break
    entity_id asc (documented deviation from unstable input order)."""
    low = entity_name.lower()
    out = [(eid, 1.0 if name.lower() == low else 0.8)
           for eid, name, _ in entities if low in name.lower()]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:max_results]
