"""Query-intelligence kernels (pure Python, no Ray).

Port of the reference's deterministic query-side analysis outside
ROGRAG: adaptive complexity routing (``query/adaptive_routing.rs:
14-287``) and query rewriting / expansion (``query/intelligence.rs:
15-358``).  Spec tables (keyword lists, synonym map, templates, stop
words) live here as DATA shared with the generated DuckDB oracle SQL.

f32→f64 deviation as elsewhere (parity is Ray↔DuckDB, both f64).
"""

from __future__ import annotations

# ------------------------------------------------- adaptive routing --
# adaptive_routing.rs:77-100 keyword sets.
BROAD_KEYWORDS = [
    "overview", "summary", "summarize", "main", "general", "all",
    "themes", "topics", "overall", "broadly", "big picture",
    "what are", "list all", "show me all",
]
SPECIFIC_KEYWORDS = [
    "relationship between", "how does", "why does", "specific",
    "detail", "exactly", "precisely", "what is the connection",
    "explain how", "describe the", "between", "and",
]

ROUTING_WEIGHTS = {"keyword": 0.5, "length": 0.3, "entity": 0.2}
ROUTING_MAX_LEVEL = 3

COMPLEXITY_EXPLANATIONS = {
    "VeryBroad": "Very broad query detected → using level {} for "
                 "high-level overview",
    "Broad": "Broad query detected → using level {} for general "
             "understanding",
    "Medium": "Medium complexity query → using level {} for balanced "
              "detail",
    "Specific": "Specific query detected → using level {} for detailed "
                "information",
    "VerySpecific": "Very specific query detected → using level {} for "
                    "precise relationships",
}


def _count_nonoverlap(hay: str, needle: str) -> int:
    """Rust ``str::matches().count()`` — non-overlapping scan."""
    return hay.count(needle)


def routing_keyword_score(query_lower: str) -> float:
    """adaptive_routing.rs:133-159 — ±1 per CONTAINED keyword,
    normalized by the number of matched keywords."""
    score, matches = 0.0, 0
    for kw in BROAD_KEYWORDS:
        if kw in query_lower:
            score += 1.0
            matches += 1
    for kw in SPECIFIC_KEYWORDS:
        if kw in query_lower:
            score -= 1.0
            matches += 1
    return score / matches if matches > 0 else 0.0


def routing_length_score(query: str) -> float:
    """adaptive_routing.rs:162-175 — word-count buckets."""
    wc = len(query.split())
    if 1 <= wc <= 3:
        return 0.5
    if 4 <= wc <= 5:
        return 0.2
    if 6 <= wc <= 7:
        return 0.0
    if 8 <= wc <= 10:
        return -0.3
    return -0.5


def routing_entity_score(query_lower: str) -> float:
    """adaptive_routing.rs:178-194 — quote pairs + ' and ' + 'between'
    occurrence counts."""
    ind = (_count_nonoverlap(query_lower, '"') // 2
           + _count_nonoverlap(query_lower, " and ")
           + _count_nonoverlap(query_lower, "between"))
    if ind == 0:
        return 0.3
    if ind == 1:
        return 0.0
    if ind == 2:
        return -0.4
    return -0.7


def _complexity_from_score(total: float) -> str:
    if total >= 0.7:
        return "VeryBroad"
    if total >= 0.4:
        return "Broad"
    if total >= -0.2:
        return "Medium"
    if total >= -0.5:
        return "Specific"
    return "VerySpecific"


def _complexity_to_level(cx: str, max_level: int = ROUTING_MAX_LEVEL) -> int:
    """adaptive_routing.rs:64-74."""
    return {"VeryBroad": max(max_level, 2), "Broad": max(max_level - 1, 1),
            "Medium": 1, "Specific": 0, "VerySpecific": 0}[cx]


def analyze_routing(query: str) -> dict:
    """adaptive_routing.rs:203-223 ``analyze_detailed`` (zero word-count
    queries fall into the final `_` bucket → -0.5, faithfully)."""
    ql = query.lower()
    ks = routing_keyword_score(ql)
    ls = routing_length_score(query)
    es = routing_entity_score(ql)
    total = (ks * ROUTING_WEIGHTS["keyword"] + ls * ROUTING_WEIGHTS["length"]
             + es * ROUTING_WEIGHTS["entity"])
    cx = _complexity_from_score(total)
    level = _complexity_to_level(cx)
    return {"complexity": cx, "suggested_level": level,
            "keyword_score": round(ks, 8), "length_score": round(ls, 8),
            "entity_score": round(es, 8), "total_score": round(total, 8),
            "explanation": COMPLEXITY_EXPLANATIONS[cx].format(level)}


# ----------------------------------------------------- query rewrite --
# intelligence.rs:297-349 default synonym / template / stop-word tables
# (synonym insertion order matters only for output ordering, preserved).
SYNONYMS: list[tuple[str, list[str]]] = [
    ("find", ["search", "locate"]),
    ("person", ["individual", "people"]),
    ("company", ["organization", "business", "firm"]),
    ("show", ["display", "present"]),
    ("get", ["retrieve", "fetch"]),
    ("large", ["big", "huge", "significant"]),
    ("small", ["tiny", "minor"]),
    ("important", ["significant", "critical", "key"]),
]

TEMPLATES: list[tuple[str, str, str]] = [   # (pattern, query_type, rewrite)
    ("who is", "EntityLookup", "entity:"),
    ("what is", "EntityLookup", "define:"),
    ("how many", "Aggregation", "count:"),
    ("compare", "Comparison", "compare:"),
]

REWRITE_STOP_WORDS = frozenset([
    "a", "an", "and", "are", "as", "at", "be", "by", "for",
    "from", "has", "he", "in", "is", "it", "its", "of", "on",
    "that", "the", "to", "was", "will", "with",
])

_SYN_MAP = dict(SYNONYMS)


def detect_query_type(query_lower: str) -> str:
    """intelligence.rs:170-230 — first matching family wins."""
    q = query_lower
    if ("relationship between" in q or "how does" in q or "related to" in q
            or "connection between" in q):
        return "Relationship"
    if (q.startswith("who is") or q.startswith("what is")
            or q.startswith("define")):
        return "EntityLookup"
    if (q.startswith("how many") or q.startswith("count") or "total" in q
            or "sum" in q or "average" in q):
        return "Aggregation"
    if ("compare" in q or "difference between" in q or "versus" in q
            or "vs" in q):
        return "Comparison"
    if ("when" in q or "before" in q or "after" in q or "during" in q
            or "timeline" in q):
        return "Temporal"
    if ("why" in q or "because" in q or "cause" in q or "reason" in q
            or "led to" in q):
        return "Causal"
    return "General"


def apply_templates(query: str, query_type: str) -> str:
    """intelligence.rs:233-240 — first template of the detected type
    whose pattern is contained; replaces ALL occurrences."""
    for pattern, ttype, rewrite in TEMPLATES:
        if ttype == query_type and pattern in query:
            return query.replace(pattern, rewrite)
    return query


def expand_synonyms(query: str) -> list[str]:
    """intelligence.rs:243-261 — base words appended unconditionally
    (duplicates allowed); synonyms appended only if not already present
    ANYWHERE in the accumulated list."""
    out: list[str] = []
    for word in query.split():
        out.append(word)
        for syn in _SYN_MAP.get(word, ()):
            if syn not in out:
                out.append(syn)
    return out


def rewrite_query(query: str) -> dict:
    """intelligence.rs:92-123 ``rewrite_query`` with the no-feedback
    default relevance (0.5 per term)."""
    normalized = query.strip().lower()
    qtype = detect_query_type(normalized)
    templated = apply_templates(normalized, qtype)
    expanded_words = expand_synonyms(templated)
    rewritten = " ".join(expanded_words)
    terms = [w for w in expanded_words if w not in REWRITE_STOP_WORDS]
    if not terms:
        conf = 0.5
    else:
        wc = len(normalized.split())
        spec = min(len(terms) / (wc + 1.0), 1.0)
        rel = sum(0.5 for _ in terms) / len(terms)
        conf = spec * 0.6 + rel * 0.4
    return {"query_type": qtype, "rewritten": rewritten,
            "expanded_terms": " ".join(terms), "n_terms": len(terms),
            "confidence": round(conf, 8)}
