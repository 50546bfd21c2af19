"""Confidence cross-encoder reranking kernel.

Port of the reference's heuristic cross-encoder
(``graphrag-core/src/reranking/cross_encoder.rs:93-146``,
``ConfidenceCrossEncoder::calculate_relevance``): token-set Jaccard
overlap between query and document (whitespace tokens, case-sensitive,
0.7 weight) blended with a document-length factor (len/100 capped at 1,
0.3 weight), then squashed through 1/(1+exp(-5*(raw-0.5))) when
``normalize_scores`` is on.

Deviations (documented):
- arithmetic in f64 instead of the reference's f32 (DuckDB-oracle parity;
  the recurrence is identical),
- ties in the final ordering break by ascending doc id (the reference's
  ``sort_by(partial_cmp)`` keeps Rust's stable pre-sort order, which is
  the caller's candidate order — not reproducible across engines).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class CrossEncoderConfig:
    """``cross_encoder.rs:19-50`` (model/batch fields dropped — the
    heuristic scorer has no model to load)."""

    top_k: int = 10
    min_confidence: float = 0.0
    normalize_scores: bool = True


def reranking_stats(original_count: int,
                    score_deltas: list[float]) -> dict[str, float]:
    """``RerankingStats::from_results`` (``cross_encoder.rs:213-264``):
    candidate/result counts, mean/max score improvement, percentage of
    candidates filtered out."""
    n = len(score_deltas)
    return {
        "candidates_count": float(original_count),
        "results_count": float(n),
        "avg_score_improvement": (sum(score_deltas) / n) if n else 0.0,
        "max_score_improvement": max(score_deltas, default=0.0),
        "filter_rate": ((original_count - n) / original_count * 100.0)
        if original_count > 0 else 0.0,
    }


def relevance_score(query: str, document: str,
                    normalize: bool = True) -> float:
    """``cross_encoder.rs:104-146``.  Case-sensitive whitespace tokens;
    empty query or document scores 0.0 (before normalization)."""
    q_toks = query.split()
    d_toks = document.split()
    if not q_toks or not d_toks:
        return 0.0
    q_set = set(q_toks)
    d_set = set(d_toks)
    inter = len(q_set & d_set)
    union = len(q_set) + len(d_set) - inter
    jaccard = inter / union if union > 0 else 0.0
    length_factor = min(len(d_toks) / 100.0, 1.0)
    raw = jaccard * 0.7 + length_factor * 0.3
    if normalize:
        return 1.0 / (1.0 + math.exp(-5.0 * (raw - 0.5)))
    return raw
