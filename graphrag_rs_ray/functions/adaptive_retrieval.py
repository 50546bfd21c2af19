"""Adaptive strategy selection kernels — port of
``graphrag-core/src/retrieval/adaptive.rs`` (per-query-type strategy
weights, cross-strategy fusion, diversity-aware selection) and the
query analyzer it consumes (``retrieval/mod.rs:600-683,1290-1316,
1410-1419``).

Semantics pinned (the fusion half is re-derived by the DuckDB oracle;
diversity selection is sequential-stateful → unit-gated, driver row
check only):

- analyze_query: key entities = graph entities whose lowercased name
  and any query word MUTUALLY substring-match (either direction);
  concepts = >3-char non-stop-words unrelated to any key entity; type =
  Relationship (>1 entity) → EntityFocused (1) → Conceptual (abstract
  indicator) → Exploratory (question word) → Factual; complexity =
  min(0.1·|words| + 0.3·|entities| + 0.2·|concepts|, 1).
- select_strategy_weights (``adaptive.rs:196-214``): confidence below
  min_confidence_for_specialization (0.6) → the balanced complex
  weights REGARDLESS of type; else the per-type table
  (``adaptive.rs:56-86``); Exploratory also maps to complex.
- retrieve (``adaptive.rs:129-193``): each strategy contributes its
  top ``trunc(results_per_strategy · weight)`` rows (f32→usize
  truncation!) with scores × weight, in vector → graph → hierarchical
  → bm25 order; dedup keeps the strictly-higher-scored version; sort
  score desc (id asc ties — documented deviation).
- diversity_aware_selection (``adaptive.rs:257-297``): walk the sorted
  list, keep rows with score > 0.8 OR a not-yet-seen entity OR while
  fewer than max_results/2 (integer division) rows are selected; then
  a fill pass appends remaining non-duplicate rows in score order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

ANALYZE_STOP_WORDS = frozenset([
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i", "it",
    "for", "not", "on", "with", "he", "as", "you", "do", "at", "this",
    "but", "his", "by", "from", "they", "we", "say", "her", "she", "or",
    "an", "will", "my", "one", "all", "would", "there", "their", "what",
    "so", "up", "out", "if", "about", "who", "get", "which", "go", "me",
])
ABSTRACT_INDICATORS = frozenset([
    "concept", "idea", "theory", "principle", "philosophy", "meaning",
    "understanding", "knowledge", "wisdom", "truth", "beauty", "justice",
])
QUESTION_WORDS = frozenset([
    "what", "how", "why", "when", "where", "who", "which", "explain",
    "describe",
])

STRATEGY_ORDER = ("vector", "graph", "hierarchical", "bm25")


@dataclass
class StrategyWeights:
    """``adaptive.rs:14-34`` (default = balanced complex weights)."""

    vector_weight: float = 0.25
    graph_weight: float = 0.25
    hierarchical_weight: float = 0.25
    bm25_weight: float = 0.25


@dataclass
class AdaptiveConfig:
    """``adaptive.rs:56-86`` defaults."""

    entity_weights: StrategyWeights = field(
        default_factory=lambda: StrategyWeights(0.2, 0.5, 0.2, 0.1))
    conceptual_weights: StrategyWeights = field(
        default_factory=lambda: StrategyWeights(0.6, 0.1, 0.3, 0.0))
    factual_weights: StrategyWeights = field(
        default_factory=lambda: StrategyWeights(0.2, 0.1, 0.1, 0.6))
    relational_weights: StrategyWeights = field(
        default_factory=lambda: StrategyWeights(0.2, 0.6, 0.1, 0.1))
    complex_weights: StrategyWeights = field(default_factory=StrategyWeights)
    min_confidence_for_specialization: float = 0.6
    results_per_strategy: int = 10


def analyze_query(query: str, entity_names: list[str]) -> dict:
    """``retrieval/mod.rs:600-683`` (intent included).  ``entity_names``
    should be passed in a deterministic (sorted) order — the reference
    iterates HashMap order (documented deviation)."""
    query_lower = query.lower()
    words = query_lower.split()
    key_entities = []
    for name in entity_names:
        nl = name.lower()
        if any(w in nl or nl in w for w in words):
            key_entities.append(name)
    concepts = []
    for w in words:
        if len(w) > 3 and w not in ANALYZE_STOP_WORDS:
            related = any(w in e.lower() or e.lower() in w
                          for e in key_entities)
            if not related:
                concepts.append(w)
    if len(key_entities) > 1:
        qtype = "relationship"
    elif key_entities:
        qtype = "entity_focused"
    elif any(w in ABSTRACT_INDICATORS for w in words):
        qtype = "conceptual"
    elif any(w in QUESTION_WORDS for w in words):
        qtype = "exploratory"
    else:
        qtype = "factual"
    if any(w in ("overview", "summary", "general", "about") for w in words):
        intent = "overview"
    elif any(w in ("detailed", "specific", "exactly", "precise")
             for w in words):
        intent = "detailed"
    elif any(w in ("compare", "vs", "versus", "between", "difference")
             for w in words):
        intent = "comparative"
    elif any(w in ("cause", "why", "because", "lead", "result")
             for w in words):
        intent = "causal"
    elif any(w in ("when", "time", "before", "after", "during")
             for w in words):
        intent = "temporal"
    else:
        intent = "detailed"
    complexity = min(len(words) * 0.1 + len(key_entities) * 0.3
                     + len(concepts) * 0.2, 1.0)
    return {"query_type": qtype, "key_entities": key_entities,
            "concepts": concepts, "intent": intent,
            "complexity_score": complexity}


def select_strategy_weights(query_type: str, confidence: float,
                            cfg: AdaptiveConfig) -> StrategyWeights:
    """``adaptive.rs:196-214``."""
    if confidence < cfg.min_confidence_for_specialization:
        return cfg.complex_weights
    return {
        "entity_focused": cfg.entity_weights,
        "conceptual": cfg.conceptual_weights,
        "factual": cfg.factual_weights,
        "relationship": cfg.relational_weights,
        "exploratory": cfg.complex_weights,
    }[query_type]


def _weight_of(w: StrategyWeights, strategy: str) -> float:
    return {"vector": w.vector_weight, "graph": w.graph_weight,
            "hierarchical": w.hierarchical_weight,
            "bm25": w.bm25_weight}[strategy]


def weight_and_fuse(strategy_lists: dict[str, list[tuple[str, float, str]]],
                    weights: StrategyWeights, cfg: AdaptiveConfig,
                    round_digits: int = 8):
    """``adaptive.rs:129-193,222-254``: truncate each strategy list to
    trunc(results_per_strategy · weight), multiply scores by the
    weight, concatenate in fixed strategy order, dedup keeping the
    strictly-higher score, sort score desc / id asc.  Lists are
    (id, score, entities_joined) rank-ordered.  Returns (rows,
    total_before_fusion)."""
    all_rows: list[tuple[str, float, str]] = []
    for strategy in STRATEGY_ORDER:
        w = _weight_of(weights, strategy)
        if w > 0.0:
            take = int(cfg.results_per_strategy * w)
            for i, s, e in strategy_lists.get(strategy, [])[:take]:
                all_rows.append((i, s * w, e))
    total_before = len(all_rows)
    best: dict[str, tuple[str, float, str]] = {}
    for row in all_rows:
        cur = best.get(row[0])
        if cur is None or row[1] > cur[1]:
            best[row[0]] = row
    fused = sorted(best.values(), key=lambda r: (-r[1], r[0]))
    fused = [(i, round(s, round_digits), e) for i, s, e in fused]
    return fused, total_before


def diversity_aware_selection(results: list[tuple[str, float, str]],
                              max_results: int):
    """``adaptive.rs:257-297`` exact port; ``entities`` is the
    comma-joined name string (empty = no entities)."""
    selected: list[tuple[str, float, str]] = []
    seen_entities: set[str] = set()
    for row in results:
        if len(selected) >= max_results:
            break
        ents = [e for e in row[2].split(",") if e]
        has_new = any(e not in seen_entities for e in ents)
        if row[1] > 0.8 or has_new or len(selected) < max_results // 2:
            seen_entities.update(ents)
            selected.append(row)
    if len(selected) < max_results:
        chosen = {r[0] for r in selected}
        for row in results:
            if len(selected) >= max_results:
                break
            if row[0] not in chosen:
                selected.append(row)
                chosen.add(row[0])
    return selected
