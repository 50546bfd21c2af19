"""HippoRAG PPR weight kernels — pure-Python port of
``graphrag-core/src/retrieval/hipporag_ppr.rs:142-305``.

The weight calculation operates on the TOP-K facts (≤ ``top_k_facts``,
default 100) and the dense-retrieval passage shortlist — both inherently
small, so these kernels run driver-side; the large-data halves (fact
scoring, passage-frequency counts, the PPR itself) are distributed in
``pipelines/retrieval.py``.

Arithmetic in f64 (the reference mixes f32 fact/passage scores into f64
weights; we take scores as f64 throughout — DuckDB-oracle parity).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class HippoRAGConfig:
    """``hipporag_ppr.rs:20-63`` defaults (damping 0.5, passages 5%)."""

    damping_factor: float = 0.5
    max_iterations: int = 100
    tolerance: float = 1e-6
    top_k_facts: int = 100
    passage_node_weight: float = 0.05
    top_k_results: int = 10
    min_entity_frequency: int = 1
    normalize_scores: bool = True


def minmax_normalize(weights: dict[str, float]) -> None:
    """In-place min-max normalization (``hipporag_ppr.rs:293-305``):
    no-op on empty input or when max-min ≤ 1e-10."""
    if not weights:
        return
    lo = min(weights.values())
    hi = max(weights.values())
    if abs(hi - lo) > 1e-10:
        for k in weights:
            weights[k] = (weights[k] - lo) / (hi - lo)


def entity_weights(facts: list[tuple[str, str, float]],
                   passage_counts: dict[str, int],
                   cfg: HippoRAGConfig) -> dict[str, float]:
    """``hipporag_ppr.rs:146-195``: for each of the top-k facts, each of
    {subject, object} contributes fact_score / num_passages (skipped when
    num_passages < min_entity_frequency), then the per-entity sum is
    averaged over its occurrence count and min-max normalized.

    ``facts``: (subject, object, score) triples ALREADY ranked/truncated
    to top-k.  ``passage_counts``: entity → number of passages containing
    it (0 when absent)."""
    weights: dict[str, float] = {}
    occurrences: dict[str, int] = {}
    for subj, obj, score in facts[:cfg.top_k_facts]:
        for entity in (subj, obj):
            np_ = passage_counts.get(entity, 0)
            if np_ >= cfg.min_entity_frequency:
                weighted = score / np_ if np_ > 0 else score
                weights[entity] = weights.get(entity, 0.0) + weighted
                occurrences[entity] = occurrences.get(entity, 0) + 1
    for entity, count in occurrences.items():
        weights[entity] /= count
    if cfg.normalize_scores:
        minmax_normalize(weights)
    return weights


def passage_weights(passage_scores: dict[str, float],
                    cfg: HippoRAGConfig) -> dict[str, float]:
    """``hipporag_ppr.rs:198-216``: dense scores × passage_node_weight
    (default 0.05), min-max normalized."""
    weights = {p: s * cfg.passage_node_weight
               for p, s in passage_scores.items()}
    if cfg.normalize_scores:
        minmax_normalize(weights)
    return weights


def combine_weights(entity_w: dict[str, float],
                    passage_w: dict[str, float]) -> dict[str, float]:
    """``hipporag_ppr.rs:219-240``: elementwise sum, then normalize the
    total mass to 1 (a probability distribution for the PPR reset)."""
    combined = dict(entity_w)
    for p, w in passage_w.items():
        combined[p] = combined.get(p, 0.0) + w
    total = sum(combined.values())
    if total > 0.0:
        for k in combined:
            combined[k] /= total
    return combined
