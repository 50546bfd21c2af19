"""Hybrid retrieval fusion — port of
``graphrag-core/src/retrieval/hybrid.rs`` (RRF / Weighted / CombSUM /
MaxScore fusion of a semantic and a keyword shortlist).

Semantics pinned (both shortlists are top-``max_candidates`` lists —
inherently small, so fusion is a driver-side kernel; the shortlist
PRODUCTION is distributed in ``pipelines/hybrid.py``):

- Corpus ids are namespaced ``entity:<id>`` / ``chunk:<id>``
  (``hybrid.rs:118-160``); entity BM25 content is "name entity_type",
  chunk content is the chunk text.  The semantic search returns the ID
  as its content (``hybrid.rs:196-208`` — "use the ID as content"), so
  a semantic-only result's content IS its id; keyword results overwrite
  the content map (``:249,308,338,367``).
- RRF (``:230-253``): rrf = 1/(rrf_k + rank + 1) with 0-based rank per
  list; semantic inserts rrf·semantic_weight, keyword ADDS
  rrf·keyword_weight; with the DEFAULT config (rrf_k=60,
  min_score_threshold=0.1) the maximum possible RRF score is
  (0.7+0.3)/61 ≈ 0.016 < 0.1 — the reference's default RRF returns
  ZERO results (quirk pinned in tests; production cohorts run RRF with
  threshold 0).
- Weighted (``:256-313``): each list normalized by its own MAX (not
  min-max); max ≤ 0 → 0.
- CombSUM (``:316-343``): raw score addition, no normalization.
- MaxScore (``:346-373``): semantic-only keeps its (possibly negative
  cosine) score; keyword applies max() against the 0.0 default — a
  keyword-only entry is max(0, kw).
- create_hybrid_results (``:376-427``): threshold is ``>=``,
  result_type from the id prefix, entities = [content] for entity
  results, source_chunks = [id]; sort score desc (ties by id asc —
  documented deviation from the reference's unstable HashMap order),
  truncate limit.  f32 → f64 arithmetic (repo-wide discipline); score
  fields rounded to 8.
"""

from __future__ import annotations

from dataclasses import dataclass

FUSION_METHODS = ("rrf", "weighted", "combsum", "maxscore")


@dataclass
class HybridFusionConfig:
    """``hybrid.rs:66-78`` defaults."""

    semantic_weight: float = 0.7
    keyword_weight: float = 0.3
    rrf_k: float = 60.0
    max_candidates: int = 100
    min_score_threshold: float = 0.1
    limit: int = 15
    round_digits: int = 8


def fuse_shortlists(sem: list[tuple[str, float, str]],
                    kw: list[tuple[str, float, str]],
                    method: str,
                    cfg: HybridFusionConfig | None = None):
    """Fuse rank-ordered (id, score, content) shortlists.  Returns rows
    (id, content, score, semantic_score, keyword_score, result_type,
    entities, source_chunks) sorted score desc / id asc, truncated."""
    cfg = cfg or HybridFusionConfig()
    combined: dict[str, list[float]] = {}   # id -> [combined, sem, kw]
    content: dict[str, str] = {}

    if method == "rrf":
        for rank, (i, s, c) in enumerate(sem):
            rrf = 1.0 / (cfg.rrf_k + rank + 1.0)
            combined[i] = [rrf * cfg.semantic_weight, s, 0.0]
            content[i] = c
        for rank, (i, s, c) in enumerate(kw):
            rrf = 1.0 / (cfg.rrf_k + rank + 1.0)
            e = combined.setdefault(i, [0.0, 0.0, 0.0])
            e[0] += rrf * cfg.keyword_weight
            e[2] = s
            content[i] = c
    elif method == "weighted":
        max_s = max((s for _, s, _ in sem), default=float("-inf"))
        for i, s, c in sem:
            norm = s / max_s if max_s > 0.0 else 0.0
            combined[i] = [norm * cfg.semantic_weight, s, 0.0]
            content[i] = c
        max_k = max((s for _, s, _ in kw), default=float("-inf"))
        for i, s, c in kw:
            norm = s / max_k if max_k > 0.0 else 0.0
            e = combined.setdefault(i, [0.0, 0.0, 0.0])
            e[0] += norm * cfg.keyword_weight
            e[2] = s
            content[i] = c
    elif method == "combsum":
        for i, s, c in sem:
            combined[i] = [s, s, 0.0]
            content[i] = c
        for i, s, c in kw:
            e = combined.setdefault(i, [0.0, 0.0, 0.0])
            e[0] += s
            e[2] = s
            content[i] = c
    elif method == "maxscore":
        for i, s, c in sem:
            combined[i] = [s, s, 0.0]
            content[i] = c
        for i, s, c in kw:
            e = combined.setdefault(i, [0.0, 0.0, 0.0])
            e[0] = max(e[0], s)
            e[2] = s
            content[i] = c
    else:
        raise ValueError(f"unknown fusion method {method}")

    rows = []
    for i, (comb, s, k) in combined.items():
        if comb >= cfg.min_score_threshold:
            c = content.get(i, i)
            if i.startswith("entity:"):
                rtype = "entity"
            elif i.startswith("chunk:"):
                rtype = "chunk"
            else:
                rtype = "hybrid"
            rows.append((i, c, round(comb, cfg.round_digits),
                         round(s, cfg.round_digits),
                         round(k, cfg.round_digits), rtype,
                         c if rtype == "entity" else "", i))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:cfg.limit]
