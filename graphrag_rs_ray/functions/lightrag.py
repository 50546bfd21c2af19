"""LightRAG query-side kernels (pure Python, no Ray).

Port of the reference's ``lightrag/`` query stack: dual-level keyword
extraction plumbing (``keyword_extraction.rs:59-190``), dual-retrieval
merge strategies (``dual_retrieval.rs:197-322``), query refinement
(``query_refinement.rs:104-327``) and iterative-deepening search
(``iterative_deepening.rs:48-315``).  The concept-graph build side
(``concept_graph.rs``) is already ported in functions/concepts.py /
pipelines/concepts.py — these kernels consume its tables.

Documented deviations (HashSet/HashMap iteration order is
nondeterministic in the reference; we pin):
- concept iteration order = sorted ascending;
- related-concept ordering = (confidence desc, concept asc);
- expansion candidate ties = (score desc, concept asc);
- weighted-merge ties = (weighted score desc, source asc, position asc);
- output chunk-id lists are sorted ascending.
All arithmetic f64 (reference mixes f32/f64; parity is Ray↔DuckDB).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

# ------------------------------------------------ keyword extraction --


@dataclass(frozen=True)
class KeywordConfig:
    """keyword_extraction.rs:35-43 defaults."""
    max_keywords: int = 20
    language: str = "English"


def extract_json(response: str) -> str | None:
    """keyword_extraction.rs:126-144 — first '{' to last '}', else the
    trimmed response if it starts with '{', else None."""
    start = response.find("{")
    end = response.rfind("}")
    if start != -1 and end != -1:
        return response[start:end + 1]
    if response.strip().startswith("{"):
        return response.strip()
    return None


def parse_keywords_response(response: str) -> dict | None:
    """keyword_extraction.rs:112-123 — JSON with high_level/low_level
    string lists; None on any parse failure."""
    js = extract_json(response)
    if js is None:
        return None
    try:
        obj = json.loads(js)
        high = [str(x) for x in obj["high_level"]]
        low = [str(x) for x in obj["low_level"]]
        return {"high_level": high, "low_level": low}
    except (ValueError, KeyError, TypeError):
        return None


def validate_keywords(high: list[str], low: list[str],
                      cfg: KeywordConfig = KeywordConfig()) -> bool:
    """keyword_extraction.rs:146-166 — 0 < total ≤ max_keywords."""
    total = len(high) + len(low)
    return 0 < total <= cfg.max_keywords


def fallback_keywords(query: str) -> dict:
    """keyword_extraction.rs:168-190 — no-LLM degradation: query words
    longer than 3 BYTES, first 10, lowercased, all low-level."""
    words = [w.lower() for w in query.split()
             if len(w.encode("utf-8")) > 3][:10]
    return {"high_level": [], "low_level": words}


# ------------------------------------------------- dual retrieval --


@dataclass(frozen=True)
class DualRetrievalConfig:
    """dual_retrieval.rs:46-55 defaults."""
    high_level_weight: float = 0.6
    low_level_weight: float = 0.4


def merge_interleave(high: list[dict], low: list[dict],
                     top_k: int) -> list[dict]:
    """dual_retrieval.rs:212-250 — alternate sources (the toggle
    advances even when a pull is a dedup-skip or the source is
    exhausted), first occurrence of an id wins, stop at top_k."""
    events = []
    for j in range(max(len(high), len(low))):
        if j < len(high):
            events.append(high[j])
        if j < len(low):
            events.append(low[j])
    seen, merged = set(), []
    for r in events:
        if len(merged) >= top_k:
            break
        if r["id"] not in seen:
            seen.add(r["id"])
            merged.append(r)
    return merged


def merge_concat(first: list[dict], second: list[dict],
                 top_k: int) -> list[dict]:
    """dual_retrieval.rs:253-283."""
    seen, merged = set(), []
    for r in list(first) + list(second):
        if len(merged) >= top_k:
            break
        if r["id"] not in seen:
            seen.add(r["id"])
            merged.append(r)
    return merged


def merge_weighted(high: list[dict], low: list[dict], top_k: int,
                   cfg: DualRetrievalConfig = DualRetrievalConfig()
                   ) -> list[dict]:
    """dual_retrieval.rs:286-322 — sort every candidate by score×level
    weight (ties pinned: source asc, position asc), dedup first
    occurrence, take top_k; rows keep their ORIGINAL score."""
    allc = ([(r["score"] * cfg.high_level_weight, 0, j, r)
             for j, r in enumerate(high)]
            + [(r["score"] * cfg.low_level_weight, 1, j, r)
               for j, r in enumerate(low)])
    allc.sort(key=lambda t: (-t[0], t[1], t[2]))
    seen, merged = set(), []
    for _, _, _, r in allc:
        if r["id"] not in seen:
            seen.add(r["id"])
            merged.append(r)
        if len(merged) >= top_k:
            break
    return merged


def merge_results(high: list[dict], low: list[dict], top_k: int,
                  strategy: str,
                  cfg: DualRetrievalConfig = DualRetrievalConfig()
                  ) -> list[dict]:
    """dual_retrieval.rs:197-210 strategy dispatch."""
    if strategy == "interleave":
        return merge_interleave(high, low, top_k)
    if strategy == "high_first":
        return merge_concat(high, low, top_k)
    if strategy == "low_first":
        return merge_concat(low, high, top_k)
    if strategy == "weighted":
        return merge_weighted(high, low, top_k, cfg)
    raise ValueError(strategy)


# ---------------------------------------------- concept graph views --


def build_concept_views(concept_freq: dict[str, int],
                        edges: list[tuple[str, str, float]],
                        chunks_by_concept: dict[str, list[str]]) -> dict:
    """Prepare the lookup structures the refinement/search kernels use
    from the ported concept-graph tables: adjacency sorted (confidence
    desc, target asc) — the deterministic stand-in for
    ``concept_graph.rs:466-486`` get_related_concepts — plus a
    neighbour SET per concept for the has_relation connectivity test
    (``query_refinement.rs:237-249``)."""
    adj: dict[str, list[tuple[float, str]]] = {}
    nbr: dict[str, set] = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((float(w), b))
        adj.setdefault(b, []).append((float(w), a))
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    for c in adj:
        adj[c].sort(key=lambda t: (-t[0], t[1]))
    return {"freq": dict(concept_freq), "adj": adj, "nbr": nbr,
            "chunks": {c: sorted(v) for c, v in chunks_by_concept.items()}}


def _get_related(views: dict, concept: str, k: int) -> list[str]:
    return [c for _, c in views["adj"].get(concept, [])[:k]]


def _concept_relevance(views: dict, concept: str,
                       current: set[str]) -> float:
    """query_refinement.rs:224-256 == iterative_deepening.rs:259-287:
    (ln(freq)+1) × (1 + 0.5·connections-to-current)."""
    freq = views["freq"].get(concept)
    if freq is None:
        return 0.0
    score = math.log(freq) + 1.0
    connections = sum(1 for cur in current
                      if cur in views["nbr"].get(concept, ()))
    return score * (1.0 + connections * 0.5)


# --------------------------------------------------- query refinement --


@dataclass(frozen=True)
class RefinementConfig:
    """query_refinement.rs:69-79 defaults."""
    max_iterations: int = 3
    concepts_per_iteration: int = 5
    max_total_concepts: int = 20
    use_relevance_feedback: bool = True


def refine_query(query: str, views: dict,
                 cfg: RefinementConfig = RefinementConfig(),
                 initial_concepts: list[str] | None = None) -> dict:
    """query_refinement.rs:104-222 with pinned iteration order (sorted
    current-concept set).  Faithful quirks kept: the size cap checks the
    PRE-ITERATION set size; a concept related to several current
    concepts is appended to the expansion list repeatedly (score map
    keeps the LAST value); ``iterations`` reports the configured
    maximum, not the executed count."""
    from .concepts import extract_concepts
    if initial_concepts is None:
        initial_concepts = extract_concepts(query)
    if not initial_concepts:
        return {"initial_concepts": [], "expanded_concepts": [],
                "relevant_chunk_ids": [], "iterations": 0,
                "relevance_scores": {}}

    current: set[str] = set(initial_concepts)
    all_expanded: list[str] = []
    relevant_chunks: set[str] = set()
    scores: dict[str, float] = {c: 1.0 for c in initial_concepts}

    for iteration in range(cfg.max_iterations):
        new_concepts: list[str] = []
        for concept in sorted(current):
            for related in _get_related(views, concept,
                                        cfg.concepts_per_iteration):
                if (related not in current
                        and len(current) < cfg.max_total_concepts):
                    s = _concept_relevance(views, related, current)
                    if s > 0.0:
                        scores[related] = s
                        new_concepts.append(related)
        for c in new_concepts:
            current.add(c)
            all_expanded.append(c)
        if not new_concepts:
            break
        for c in new_concepts:
            relevant_chunks.update(views["chunks"].get(c, ()))
        if cfg.use_relevance_feedback and iteration < cfg.max_iterations - 1:
            freqs: dict[str, int] = {}
            for chunk in relevant_chunks:
                for ent in _entities_for_chunk(views, chunk):
                    freqs[ent] = freqs.get(ent, 0) + 1
            for concept, f in freqs.items():
                if concept in scores:
                    scores[concept] *= 1.0 + math.log(f)

    ranked = sorted(((c, scores.get(c, 0.0)) for c in all_expanded),
                    key=lambda t: (-t[1], t[0]))
    return {"initial_concepts": list(initial_concepts),
            "expanded_concepts": [c for c, _ in ranked],
            "relevant_chunk_ids": sorted(relevant_chunks),
            "iterations": cfg.max_iterations,
            "relevance_scores": dict(ranked)}


def _entities_for_chunk(views: dict, chunk_id: str):
    inv = views.get("_inv")
    if inv is None:
        inv = {}
        for c, chunks in views["chunks"].items():
            for ch in chunks:
                inv.setdefault(ch, []).append(c)
        for ch in inv:
            inv[ch].sort()
        views["_inv"] = inv
    return inv.get(chunk_id, ())


# ----------------------------------------- iterative deepening search --


@dataclass(frozen=True)
class SearchConfig:
    """iterative_deepening.rs:69-80 defaults."""
    max_depth: int = 3
    min_chunks: int = 5
    max_chunks: int = 50
    concepts_per_depth: int = 5
    use_adaptive_depth: bool = True
    adaptive_quality_threshold: float = 0.7


def iterative_deepening_search(query: str, views: dict,
                               cfg: SearchConfig = SearchConfig(),
                               initial_concepts: list[str] | None = None
                               ) -> dict:
    """iterative_deepening.rs:112-315 with pinned orders.  Faithful
    quirk kept: ``should_stop_early`` reads total_chunks /
    total_concepts_explored, which the reference only populates AFTER
    the loop — so the quality-threshold early stop can never fire and
    the refiner's max_total_concepts is concepts_per_depth×max_depth."""
    refined = refine_query(
        query, views,
        RefinementConfig(max_iterations=cfg.max_depth,
                         concepts_per_iteration=cfg.concepts_per_depth,
                         max_total_concepts=(cfg.concepts_per_depth
                                             * cfg.max_depth),
                         use_relevance_feedback=True),
        initial_concepts=initial_concepts)
    out = {"depth_reached": 0, "total_chunks": 0,
           "total_concepts_explored": 0, "chunk_ids": [],
           "depth_results": [], "stop_reason": "MaxDepthReached"}
    if not refined["initial_concepts"]:
        return out

    current: set[str] = set(refined["initial_concepts"])
    visited: set[str] = set()

    for depth in range(cfg.max_depth):
        new_found = 0
        for concept in sorted(current):
            for chunk in views["chunks"].get(concept, ()):
                if chunk not in visited:
                    visited.add(chunk)
                    new_found += 1
        out["depth_results"].append(
            {"depth": depth, "concepts_explored": len(current),
             "new_chunks_found": new_found})
        if len(visited) >= cfg.max_chunks:
            out["depth_reached"] = depth
            out["stop_reason"] = "MaxChunksReached"
            break
        # quality early-stop: dead code in the reference (see docstring)
        expanded: dict[str, float] = {}
        for concept in sorted(current):
            for related in _get_related(views, concept,
                                        cfg.concepts_per_depth):
                if related not in current:
                    expanded[related] = (expanded.get(related, 0.0)
                                         + _concept_relevance(
                                             views, related, current))
        top = [c for c, _ in sorted(expanded.items(),
                                    key=lambda t: (-t[1], t[0]))
               [:cfg.concepts_per_depth]]
        if not top:
            out["depth_reached"] = depth
            out["stop_reason"] = "NoMoreConcepts"
            break
        current.update(top)
        out["depth_reached"] = depth + 1

    out["total_chunks"] = len(visited)
    out["total_concepts_explored"] = len(current)
    out["chunk_ids"] = sorted(visited)
    return out
