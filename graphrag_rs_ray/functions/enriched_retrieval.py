"""Enriched metadata-aware retrieval kernels — port of
``graphrag-core/src/retrieval/enriched.rs`` (keyword / structure /
summary / completeness boosting over enriched chunk metadata).

Semantics pinned (re-derived by the DuckDB oracle):

- Query words: lowercase whitespace split, ONLY words longer than 3
  chars, as a SET (``enriched.rs:74-79``).
- Structure references (``:309-337``): first regex match per pattern
  (``chapter\\s+(\\d+|[ivxlcdm]+|\\w+)``, ``section\\s+(\\d+\\.?\\d*)``,
  ``part\\s+(\\d+|[ivxlcdm]+)``) over the LOWERCASED query; the trailing
  "direct mentions" loop tests ``is_uppercase`` on the lowercased text —
  dead code in the reference, faithfully never fires (pinned).
- metadata_search boosts (``:85-140``): chunks with entities OR
  keywords; keyword boost = (matches / max(|qw|, 1)) ·
  keyword_match_weight when matches ≥ min_keyword_matches; structure
  boost = Σ over refs (chapter contains → +0.5, section → +0.3,
  subsection → +0.2), then × structure_match_weight if > 0; summary
  boost = +summary_weight when ≥ max(|qw|/2, 1) query words appear in
  the summary; completeness > 0.7 → +0.05; results kept only when the
  total boost > 0.05; final score = min(base + boost, 1).  Base score =
  the chunk's score in the base result list, 0.5 default (``:300-307``).
- Completeness (``core/metadata.rs:166-200``): 9 fields / 9.  Engine
  mapping: ``heading_path`` non-empty ⇔ ``chapter`` set (the enricher
  derives both from the same section path) and ``topic`` is never set —
  chapter therefore counts 2/9 (documented on both sides).
- search_by_keywords (``:246-283``): score = Σ 1/|keywords| per
  case-insensitive keyword hit, > 0 kept, score desc (id asc tie —
  documented deviation), top-k.
- boost_with_metadata (``:174-221``): +matches/|qw|·0.2, +0.15 if the
  query contains the chapter, +0.1 for the section, min 1.0, re-sort.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_STRUCTURE_PATTERNS = [
    r"chapter\s+(\d+|[ivxlcdm]+|\w+)",
    r"section\s+(\d+\.?\d*)",
    r"part\s+(\d+|[ivxlcdm]+)",
]


@dataclass
class EnrichedRetrievalConfig:
    """``enriched.rs:29-39`` defaults."""

    keyword_match_weight: float = 0.3
    structure_match_weight: float = 0.2
    summary_weight: float = 0.15
    min_keyword_matches: int = 1
    enable_structure_filtering: bool = True
    round_digits: int = 8


def query_words(query: str) -> set[str]:
    return {w for w in query.lower().split() if len(w) > 3}


def extract_structure_references(query_lower: str) -> list[str]:
    refs = []
    for pat in _STRUCTURE_PATTERNS:
        m = re.search(pat, query_lower)
        if m:
            refs.append(m.group(0))
    # reference's "direct mentions" loop: is_uppercase over an
    # already-lowercased string — never true (enriched.rs:329-334)
    for word in query_lower.split():
        if word[:1].isupper() and len(word) > 5:   # pragma: no cover
            refs.append(word)
    return refs


def count_keyword_matches(chunk_keywords: list[str],
                          qwords: set[str]) -> int:
    return sum(1 for k in chunk_keywords if k.lower() in qwords)


def structure_boost_raw(chapter: str | None, section: str | None,
                        subsection: str | None,
                        refs: list[str]) -> float:
    """``enriched.rs:340-378``: 0.5/0.3/0.2 per containing field per
    ref; returns 0.0 when nothing matches (the reference returns None →
    no boost applied)."""
    boost = 0.0
    for ref in refs:
        rl = ref.lower()
        if chapter and rl in chapter.lower():
            boost += 0.5
        if section and rl in section.lower():
            boost += 0.3
        if subsection and rl in subsection.lower():
            boost += 0.2
    return boost


def matches_query(text: str, qwords: set[str]) -> bool:
    """``enriched.rs:381-388``: ≥ max(|qw|/2, 1) query words contained."""
    tl = text.lower()
    return sum(1 for w in qwords if w in tl) >= max(len(qwords) // 2, 1)


def completeness_from_row(chapter, section, subsection, keywords,
                          summary, structural_level,
                          position_in_document) -> float:
    """``core/metadata.rs:166-200`` over the engine's enriched-chunk
    columns (heading_path ⇔ chapter, topic never set — see module
    docstring)."""
    score = 0.0
    if chapter is not None:
        score += 2.0                       # chapter + heading_path
    if section is not None:
        score += 1.0
    if subsection is not None:
        score += 1.0
    if keywords:
        score += 1.0
    if summary is not None:
        score += 1.0
    if structural_level is not None:
        score += 1.0
    if position_in_document is not None:
        score += 1.0
    return score / 9.0


def metadata_boost(row: dict, qwords: set[str], refs: list[str],
                   cfg: EnrichedRetrievalConfig) -> float:
    """The full boost stack for one enriched chunk row
    (``enriched.rs:85-127``); addition order pinned (keyword →
    structure → summary → completeness)."""
    boost = 0.0
    matches = count_keyword_matches(row.get("keywords") or [], qwords)
    if matches >= cfg.min_keyword_matches:
        boost += (matches / max(len(qwords), 1)) * cfg.keyword_match_weight
    if cfg.enable_structure_filtering:
        raw = structure_boost_raw(row.get("chapter"), row.get("section"),
                                  row.get("subsection"), refs)
        if raw > 0.0:
            boost += raw * cfg.structure_match_weight
    summary = row.get("summary")
    if summary is not None and matches_query(summary, qwords):
        boost += cfg.summary_weight
    comp = completeness_from_row(
        row.get("chapter"), row.get("section"), row.get("subsection"),
        row.get("keywords") or [], summary, row.get("structural_level"),
        row.get("position_in_document"))
    if comp > 0.7:
        boost += 0.05
    return boost


def search_by_keywords(keywords: list[str],
                       chunks: list[tuple[str, list[str]]],
                       top_k: int) -> list[tuple[str, float]]:
    """``enriched.rs:246-283``: (chunk_id, chunk_keywords) rows scored
    Σ 1/|keywords| per case-insensitive hit."""
    out = []
    for cid, ckw in chunks:
        score = 0.0
        low = [k.lower() for k in ckw]
        for kw in keywords:
            if kw.lower() in low:
                score += 1.0 / len(keywords)
        if score > 0.0:
            out.append((cid, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:top_k]


def boost_with_metadata(results: list[tuple[str, float]],
                        chunk_meta: dict[str, dict], query: str
                        ) -> list[tuple[str, float]]:
    """``enriched.rs:174-221``: per-result keyword/chapter/section
    boosts (chunk looked up via the result's first source chunk), min
    1.0, re-sorted (id asc ties — documented)."""
    qw = query_words(query)
    ql = query.lower()
    out = []
    for cid, score in results:
        meta = chunk_meta.get(cid)
        if meta is not None:
            matches = count_keyword_matches(meta.get("keywords") or [], qw)
            if matches > 0:
                score = min(score + (matches / max(len(qw), 1)) * 0.2, 1.0)
            ch = meta.get("chapter")
            if ch and ch.lower() in ql:
                score = min(score + 0.15, 1.0)
            sec = meta.get("section")
            if sec and sec.lower() in ql:
                score = min(score + 0.1, 1.0)
        out.append((cid, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def filter_by_structure(results: list[str], chunk_meta: dict[str, dict],
                        query: str) -> list[str]:
    """``enriched.rs:146-171``: keep results whose chunk metadata
    contains any structure ref; results without metadata are KEPT."""
    refs = extract_structure_references(query.lower())
    if not refs:
        return results
    kept = []
    for cid in results:
        meta = chunk_meta.get(cid)
        if meta is None:
            kept.append(cid)
            continue
        if structure_boost_raw(meta.get("chapter"), meta.get("section"),
                               meta.get("subsection"), refs) > 0.0:
            kept.append(cid)
    return kept
