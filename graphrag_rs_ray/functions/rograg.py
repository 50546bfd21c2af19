"""ROGRAG query-analysis kernels (pure Python, no Ray).

Port of the reference's deterministic rule-based query-processing stack
(``rograg/`` in graphrag-rs): intent classification
(``intent_classifier.rs:312-614``), hybrid query decomposition
(``decomposer.rs:291-699``), pattern-based logic-form parsing
(``logic_form.rs:367-558``), query validation (``validator.rs:267-365``)
and fuzzy matching (``fuzzy_matcher.rs:246-714``).

Pattern tables live here as DATA so ``__ray_entry__`` can generate the
DuckDB oracle SQL from the exact same specs the Python kernels use —
parity by construction.

Documented deviations from the reference (see also the repo's
reference-quirks notes):

- All arithmetic is f64 (the reference uses f32); both the Ray side and
  the DuckDB oracle compute in f64, so parity is between those two.
- The reference sorts competing intents / fuzzy matches with
  ``sort_by(partial_cmp)`` over a HashMap iteration — tie order is
  nondeterministic there.  We pin deterministic tie-breaks:
  intents by (score desc, intent name asc); fuzzy matches by
  (similarity desc, match id asc, match type asc); graph-expansion
  neighbours by (confidence desc, neighbour name asc, predicate asc);
  entity iteration order is name asc.
- ``is_alphabetic`` (Rust, Unicode) is mirrored with ``str.isalpha()``
  in Python and ``\\p{L}`` in the oracle SQL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .similarity import levenshtein_distance

# ------------------------------------------------------------- intents --
# intent_classifier.rs:314-407 — one IntentPattern per intent:
# (intent, keywords, regexes).  Keyword hits are substring `contains` on
# the lowercased query; regexes run on the lowercased query too
# (classify() lowercases before scoring).  Score per intent =
# min((kw_hits/n_kw)*0.5 + (rx_hits/n_rx)*0.5, 1.0).
INTENT_SPECS: list[tuple[str, list[str], list[str]]] = [
    ("Factual",
     ["what", "which", "how many", "how much"],
     [r"\bwhat (?:is|are|was|were)\b", r"\bwhich (?:is|are|was|were)\b",
      r"\bhow many\b", r"\bhow much\b"]),
    ("Definitional",
     ["define", "definition", "meaning", "explain", "what is"],
     [r"\bdefine\b", r"\bdefinition of\b", r"\bmeaning of\b",
      r"\bexplain what\b",
      r"\bwhat (?:is|are) (?:the )?(?:concept|idea|notion) of\b"]),
    ("Relational",
     ["relationship", "related", "connection", "between", "and"],
     [r"\brelationship between\b", r"\bhow (?:is|are) .+ related to\b",
      r"\bconnection between\b", r"\b\w+ and \w+\b"]),
    ("Temporal",
     ["when", "time", "date", "year", "before", "after", "during"],
     [r"\bwhen (?:did|was|were|will|is|are)\b", r"\bwhat (?:time|date|year)\b",
      r"\bbefore .+ happened\b", r"\bafter .+ happened\b",
      r"\bduring .+ period\b"]),
    ("Causal",
     ["why", "because", "cause", "reason", "result", "due to"],
     [r"\bwhy (?:did|was|were|is|are|do|does)\b", r"\bwhat (?:caused|causes)\b",
      r"\breason for\b", r"\bdue to what\b", r"\bwhat led to\b"]),
    ("Comparative",
     ["compare", "difference", "versus", "vs", "better", "worse", "similar"],
     [r"\bcompare .+ (?:to|with|and)\b", r"\bdifference between\b",
      r"\b.+ (?:versus|vs) .+\b", r"\bwhich is (?:better|worse)\b",
      r"\bhow (?:similar|different)\b"]),
    ("Summary",
     ["summarize", "overview", "summary", "tell me about", "describe"],
     [r"\bsummarize\b", r"\bgive (?:me )?(?:an )?overview\b",
      r"\btell me about\b", r"\bdescribe .+\b",
      r"\bwhat (?:can you tell me )?about\b"]),
]

# intent_classifier.rs:411-414
INAPPROPRIATE_RE = r"\b(?:hate|violence|harm|illegal|inappropriate)\b"

REFORMULATION_MSGS = {
    "tell": "Try asking a more specific question like 'What is...?' or "
            "'How does...?'",
    "and": "Try breaking your question into separate parts or focus on one "
           "aspect",
    "long": "Try using a shorter, more focused question",
    "punct": "Try phrasing your request as a clear question",
    "default": "Try being more specific about what information you're "
               "looking for",
}


@dataclass(frozen=True)
class IntentConfig:
    """intent_classifier.rs:197-207 defaults."""
    confidence_threshold: float = 0.7
    refusal_threshold: float = 0.8
    enable_inappropriate_detection: bool = True
    enable_ambiguity_detection: bool = True
    suggest_reformulations: bool = True


_INTENT_COMPILED = [(name, kws, [re.compile(rx) for rx in rxs])
                    for name, kws, rxs in INTENT_SPECS]
_INAPPROPRIATE = re.compile(INAPPROPRIATE_RE)


def _intent_score(query_lower: str, kws: list[str], rxs) -> float:
    """intent_classifier.rs:536-568 (single pattern per intent,
    requires_all=False, weight=1.0)."""
    kw_hits = sum(1 for k in kws if k in query_lower)
    rx_hits = sum(1 for r in rxs if r.search(query_lower))
    score = 0.0
    if kw_hits > 0:
        score += (kw_hits / len(kws)) * 0.5
    if rx_hits > 0:
        score += (rx_hits / len(rxs)) * 0.5
    return min(score, 1.0)


def complexity_score(query_lower: str) -> float:
    """intent_classifier.rs:576-592 (runs on the lowercased query)."""
    words = query_lower.split()
    wc = len(words)
    sc = max(sum(1 for c in query_lower if c in ".?!"), 1)
    alpha = sum(1 for c in query_lower if c.isalpha())
    awl = alpha / max(wc, 1)
    length_c = min(wc / 20.0, 1.0)
    sentence_c = min(sc / 3.0, 1.0)
    wordlen_c = min(awl / 8.0, 1.0)
    construct = 0.3 if any(m in query_lower for m in
                           (" and ", " or ", " but ", " because ", " since ",
                            " although ")) else 0.0
    return min(length_c * 0.3 + sentence_c * 0.2 + wordlen_c * 0.2 + construct,
               1.0)


def suggest_reformulation(query: str) -> str:
    """intent_classifier.rs:595-614 (first matching rule wins; word count
    and trailing punctuation checked on the RAW query)."""
    ql = query.lower()
    if ql.startswith("tell me about"):
        return REFORMULATION_MSGS["tell"]
    if " and " in ql:
        return REFORMULATION_MSGS["and"]
    if len(query.split()) > 20:
        return REFORMULATION_MSGS["long"]
    if not (query.endswith("?") or query.endswith(".") or query.endswith("!")):
        return REFORMULATION_MSGS["punct"]
    return REFORMULATION_MSGS["default"]


def classify_intent(query: str, cfg: IntentConfig = IntentConfig()) -> dict:
    """intent_classifier.rs:450-533 — flattened IntentResult row.

    Absent secondary intents are '' / 0.0 (table-friendly).  Competing
    intents are ordered (score desc, name asc) — deterministic stand-in
    for the reference's HashMap-order sort."""
    ql = query.lower()
    if cfg.enable_inappropriate_detection and _INAPPROPRIATE.search(ql):
        return {"primary_intent": "Inappropriate", "confidence": 1.0,
                "should_refuse": True,
                "refusal_reason": "Query contains inappropriate content",
                "suggested_reformulation": "", "complexity_score": 0.0,
                "secondary_intent_1": "", "secondary_score_1": 0.0,
                "secondary_intent_2": "", "secondary_score_2": 0.0}

    scored = sorted(
        ((name, s) for name, kws, rxs in _INTENT_COMPILED
         if (s := _intent_score(ql, kws, rxs)) > 0.0),
        key=lambda t: (-t[1], t[0]))
    cx = round(complexity_score(ql), 8)

    if not scored:
        return {"primary_intent": "Ambiguous", "confidence": 0.0,
                "should_refuse": True,
                "refusal_reason": "Unable to understand the query intent",
                "suggested_reformulation":
                    suggest_reformulation(query)
                    if cfg.suggest_reformulations else "",
                "complexity_score": cx,
                "secondary_intent_1": "", "secondary_score_1": 0.0,
                "secondary_intent_2": "", "secondary_score_2": 0.0}

    primary, p_score = scored[0]
    secondary = scored[1:3]
    ambiguous = (cfg.enable_ambiguity_detection
                 and any(s > p_score * 0.8 for _, s in secondary))
    should_refuse = p_score < cfg.refusal_threshold or ambiguous
    reason = ""
    if should_refuse:
        reason = ("Query intent is ambiguous - please be more specific"
                  if ambiguous else
                  "Insufficient confidence in understanding the query")
    sec = secondary + [("", 0.0)] * (2 - len(secondary))
    return {"primary_intent": "Ambiguous" if ambiguous else primary,
            "confidence": round(p_score, 8),
            "should_refuse": should_refuse,
            "refusal_reason": reason,
            "suggested_reformulation":
                suggest_reformulation(query)
                if should_refuse and cfg.suggest_reformulations else "",
            "complexity_score": cx,
            "secondary_intent_1": sec[0][0],
            "secondary_score_1": round(sec[0][1], 8),
            "secondary_intent_2": sec[1][0],
            "secondary_score_2": round(sec[1][1], 8)}


# -------------------------------------------------------- decomposition --
# decomposer.rs:316-364 — semantic patterns are CASE-SENSITIVE (matched
# against the raw query; only lowercase 'who'/'what'/'how' trigger).
SEMANTIC_PATTERNS: list[dict] = [
    {"regex": r"\b(who|what) is (.+?) and (.+)",
     "subquery_type": "Entity",
     # extractor at decomposer.rs:319-335: ["{g1} is {g2}", g3]
     "builds": ["{1} is {2}", "{3}"]},
    {"regex": r"\bhow (?:is|are) (.+?) (?:related to|connected to) (.+)",
     "subquery_type": "Relationship",
     # extractor at decomposer.rs:342-361
     "builds": ["What is {1}", "What is {2}",
                "How are {1} and {2} related"]},
]

# decomposer.rs:488-500 — list order matters for the leading-strip fold.
CLAUSE_SEPARATORS = ["and", "or", "but", ",", ";", "also", "furthermore",
                     "moreover", "however", "therefore"]

_SEMANTIC_COMPILED = [(re.compile(p["regex"]), p) for p in SEMANTIC_PATTERNS]


def _build_text(tpl: str, m: re.Match) -> str:
    out = tpl
    for gi in range(len(m.groups()), 0, -1):
        out = out.replace("{%d}" % gi, m.group(gi) or "")
    return out


def _semantic_subqueries(query: str):
    for rx, spec in _SEMANTIC_COMPILED:
        m = rx.search(query)
        if m:
            subs = []
            for idx, tpl in enumerate(spec["builds"]):
                text = _build_text(tpl, m).strip()
                if text:
                    subs.append({
                        "sub_id": f"sem_{idx}", "text": text,
                        "query_type": spec["subquery_type"],
                        "priority": 1.0 - idx * 0.1,
                        "deps": f"sem_{idx - 1}" if idx > 0 else ""})
            return subs
    return []


def _clause_boundaries(query: str) -> list[int]:
    """decomposer.rs:503-524 — raw substring occurrences of every
    separator on the lowercased query (NOT word-bounded: 'and' inside
    'England' is a boundary, faithfully)."""
    ql = query.lower()
    bounds = {0, len(query)}
    for sep in CLAUSE_SEPARATORS:
        start = 0
        while (pos := ql.find(sep, start)) != -1:
            bounds.add(pos)
            start = pos + len(sep)
    return sorted(bounds)


def _strip_leading_separators(clause: str) -> str:
    """decomposer.rs:534-544 — fold over the separator list IN ORDER,
    each applied at most once."""
    acc = clause
    for sep in CLAUSE_SEPARATORS:
        if acc.lower().startswith(sep):
            acc = acc[len(sep):].strip()
    return acc


def _extract_clauses(query: str) -> list[str]:
    bounds = _clause_boundaries(query)
    clauses = []
    for s, e in zip(bounds, bounds[1:]):
        clause = _strip_leading_separators(query[s:e].strip())
        if clause and len(clause) > 3:
            clauses.append(clause)
    return clauses


def classify_clause_type(clause: str) -> str:
    """decomposer.rs:555-573."""
    cl = clause.lower()
    if cl.startswith("who") or cl.startswith("what person"):
        return "Entity"
    if cl.startswith("what"):
        return "Definitional"
    if cl.startswith("when"):
        return "Temporal"
    if cl.startswith("why") or "because" in cl:
        return "Causal"
    if "relation" in cl or "connect" in cl:
        return "Relationship"
    if "compare" in cl or "versus" in cl:
        return "Comparative"
    return "Attribute"


def _single_query(query: str, strategy: str) -> dict:
    """decomposer.rs:716-730."""
    return {"strategy": strategy, "confidence": 1.0,
            "subqueries": [{"sub_id": "single", "text": query,
                            "query_type": "Entity", "priority": 1.0,
                            "deps": ""}]}


def decompose_hybrid(query: str) -> dict:
    """decomposer.rs:666-699 — semantic first (conf 0.8 > 0.6 always
    wins when a pattern matches), else syntactic clause split, else
    single query.  Returns {strategy, confidence, subqueries}."""
    subs = _semantic_subqueries(query)
    if subs:
        return {"strategy": "hybrid", "confidence": 0.8, "subqueries": subs}

    ql = query.lower()
    if any(sep in ql for sep in CLAUSE_SEPARATORS):
        clauses = _extract_clauses(query)
        if len(clauses) <= 1:
            return _single_query(query, "hybrid")
        return {"strategy": "hybrid", "confidence": 0.7,
                "subqueries": [
                    {"sub_id": f"syn_{idx}", "text": c,
                     "query_type": classify_clause_type(c),
                     "priority": 1.0 - idx * 0.1, "deps": ""}
                    for idx, c in enumerate(clauses)]}

    return _single_query(query, "semantic")


# ----------------------------------------------------------- logic form --
# logic_form.rs:404-496 — first matching pattern wins; the greedy (.+)
# before the optional \?? means a trailing '?' stays INSIDE the captured
# argument for the Is patterns (faithful quirk).
LOGIC_PATTERNS: list[dict] = [
    {"regex": r"(?i)what (?:is|are) (?:the )?(.+)\??", "predicate": "Is",
     "query_type": "Select", "args": [(1, "Entity", "X")]},
    {"regex": r"(?i)who (?:is|are) (?:the )?(.+)\??", "predicate": "Is",
     "query_type": "Select", "args": [(1, "Entity", "X")]},
    {"regex": r"(?i)how (?:is|are) (.+?) (?:related to|connected to) (.+)\??",
     "predicate": "Related", "query_type": "Select",
     "args": [(1, "Entity", "X"), (2, "Entity", "Y")]},
    {"regex": r"(?i)when (?:did|does|will) (.+?) (?:happen|occur)\??",
     "predicate": "Happened", "query_type": "Select",
     "args": [(1, "Entity", "X")]},
    {"regex": r"(?i)why (?:did|does) (.+?) (?:cause|lead to) (.+)\??",
     "predicate": "Caused", "query_type": "Select",
     "args": [(1, "Entity", "X"), (2, "Entity", "Y")]},
    {"regex": r"(?i)compare (.+?) (?:and|with|to) (.+)"
              r"(?:\s+(?:on|in terms of) (.+))?\??",
     "predicate": "Compare", "query_type": "Select",
     "args": [(1, "Entity", "X"), (2, "Entity", "Y")]},
]

_LOGIC_COMPILED = [(re.compile(p["regex"]), p) for p in LOGIC_PATTERNS]


def parse_logic_form(query: str) -> dict | None:
    """logic_form.rs:504-547 — None when no pattern matches; argument
    list skips empty captures (arg positions are post-filter)."""
    for rx, spec in _LOGIC_COMPILED:
        m = rx.search(query)
        if m:
            args = []
            for gi, arg_type, var in spec["args"]:
                val = (m.group(gi) or "").strip()
                if val:
                    args.append({"value": val, "variable": var,
                                 "arg_type": arg_type})
            return {"predicate": spec["predicate"],
                    "query_type": spec["query_type"],
                    "confidence": 0.8, "args": args}
    return None


# ----------------------------------------------------------- validation --
# validator.rs:268-274
SAFETY_PATTERNS = [
    r"\b(?:harm|violence|illegal|inappropriate|offensive)\b",
    r"\b(?:hate|discrimination|bias|prejudice)\b",
    r"\b(?:private|confidential|secret|classified)\b",
]

_SAFETY_COMPILED = [re.compile(p) for p in SAFETY_PATTERNS]


def validate_query(query: str) -> dict:
    """validator.rs:295-365 — issue counters + score.  At most one
    Safety issue (the reference breaks after the first matching
    pattern); length is Critical (empty) or Medium (>1000 bytes)."""
    n_issues = 0
    has_critical = False
    has_length = has_safety = has_format = False

    if not query.strip():
        n_issues += 1
        has_length = True
        has_critical = True
    elif len(query.encode("utf-8")) > 1000:   # query.len() is bytes in Rust
        n_issues += 1
        has_length = True

    ql = query.lower()
    if any(p.search(ql) for p in _SAFETY_COMPILED):
        n_issues += 1
        has_safety = True

    if not any(c.isalpha() for c in query):
        n_issues += 1
        has_format = True

    score = 0.0 if has_critical else 1.0 - min(n_issues * 0.1, 0.8)
    return {"is_valid": not has_critical,
            "validation_score": round(score, 8),
            "n_issues": n_issues, "has_length_issue": has_length,
            "has_safety_issue": has_safety, "has_format_issue": has_format}


# -------------------------------------------------------- fuzzy matching --


@dataclass(frozen=True)
class FuzzyMatchConfig:
    """fuzzy_matcher.rs:99-112 defaults."""
    similarity_threshold: float = 0.6
    max_matches: int = 10
    enable_entity_matching: bool = True
    enable_chunk_matching: bool = True
    enable_semantic_expansion: bool = True
    boost_exact_matches: bool = True


# fuzzy_matcher.rs:651-659 — type weights for overall confidence.
MATCH_TYPE_WEIGHTS = {"exact_entity": 1.0, "partial_entity": 0.8,
                      "semantic_entity": 0.7, "chunk_content": 0.6,
                      "related_concept": 0.5}


def fm_jaccard(words1: frozenset, words2: frozenset) -> float:
    """fuzzy_matcher.rs:554-566."""
    union = len(words1 | words2)
    return len(words1 & words2) / union if union else 0.0


def fm_containment(words1: frozenset, words2: frozenset) -> float:
    """fuzzy_matcher.rs:569-585."""
    if not words1 and not words2:
        return 1.0
    smaller = min(len(words1), len(words2))
    return len(words1 & words2) / smaller if smaller else 0.0


def fm_levenshtein_sim(t1: str, t2: str) -> float:
    """fuzzy_matcher.rs:588-598 — char-based distance over BYTE max-len
    (the reference divides by ``str::len()``)."""
    max_len = max(len(t1.encode("utf-8")), len(t2.encode("utf-8")))
    if max_len == 0:
        return 1.0
    return 1.0 - levenshtein_distance(t1, t2) / max_len


def fm_text_similarity(t1_lower: str, t2_lower: str) -> float:
    """fuzzy_matcher.rs:539-551 — jaccard*0.4 + containment*0.4 +
    levenshtein*0.2 on lowercased texts."""
    w1 = frozenset(t1_lower.split())
    w2 = frozenset(t2_lower.split())
    return (fm_jaccard(w1, w2) * 0.4 + fm_containment(w1, w2) * 0.4
            + fm_levenshtein_sim(t1_lower, t2_lower) * 0.2)


def fm_text_similarity_upper_bound(t1_lower: str, t2_lower: str) -> float:
    """Cheap upper bound (levenshtein term ≤ 0.2) used to prune the
    expensive edit-distance: pairs with jaccard+containment < 1 - 1e-9
    cannot reach the 0.6 threshold."""
    w1 = frozenset(t1_lower.split())
    w2 = frozenset(t2_lower.split())
    return fm_jaccard(w1, w2) * 0.4 + fm_containment(w1, w2) * 0.4 + 0.2


def fm_word_overlap(words1: list[str], words2: list[str]) -> float:
    """fuzzy_matcher.rs:628-640 — intersection of the SETS over the
    min LIST length (duplicates count in the denominator, faithfully)."""
    min_size = min(len(words1), len(words2))
    if min_size == 0:
        return 0.0
    return len(set(words1) & set(words2)) / min_size


def fuzzy_match_one(query: str, entities: list[dict],
                    adjacency: dict[str, list[dict]],
                    cfg: FuzzyMatchConfig = FuzzyMatchConfig()) -> list[dict]:
    """fuzzy_matcher.rs:308-365 match_query() restricted to entity
    matching + semantic expansion (chunk matching is a separate stage;
    see pipelines.queries).  ``entities`` must be sorted by name asc
    (pinned iteration order); each has name/name_lower/type_lower/
    entity_id/words (frozenset of name_lower tokens).  ``adjacency``
    maps entity ID → top-5 neighbour dicts (conf desc, name asc,
    pred asc; pre-truncated per fuzzy_matcher.rs:506 ``take(5)``).

    Returns ranked match rows (similarity desc, id asc, type asc),
    truncated to ``max_matches``, with the reference's position/type
    weighted overall confidence attached to every row."""
    ql = query.lower()
    qwords_list = ql.split()
    qset = frozenset(qwords_list)

    matches: list[dict] = []
    matched_eids: list[tuple[str, str]] = []   # (entity_id, name)
    if cfg.enable_entity_matching:
        for ent in entities:
            if ent["name_lower"] == ql:
                matches.append({
                    "match_id": ent["entity_id"],
                    "similarity": 1.0 if cfg.boost_exact_matches else 0.95,
                    "match_type": "exact_entity"})
                matched_eids.append((ent["entity_id"], ent["name"]))
                continue
            # partial name match (prune: levenshtein only when the
            # word-overlap terms could reach the threshold)
            if (fm_text_similarity_upper_bound(ql, ent["name_lower"])
                    >= cfg.similarity_threshold - 1e-9):
                ns = fm_text_similarity(ql, ent["name_lower"])
                if ns >= cfg.similarity_threshold:
                    matches.append({
                        "match_id": ent["entity_id"],
                        "similarity": round(ns * 0.9, 8),
                        "match_type": "partial_entity"})
                    matched_eids.append((ent["entity_id"], ent["name"]))
            # entity type match
            ov = fm_word_overlap(qwords_list, [ent["type_lower"]])
            if ov > 0.0:
                matches.append({
                    "match_id": f"type_{ent['entity_id']}",
                    "similarity": round(ov * 0.7, 8),
                    "match_type": "semantic_entity"})

    if cfg.enable_semantic_expansion and len(matches) < cfg.max_matches:
        for eid, _name in matched_eids:
            for nb in adjacency.get(eid, []):
                sim = nb["conf"] * 0.6
                if sim >= cfg.similarity_threshold * 0.7:
                    matches.append({
                        "match_id": f"expanded_{nb['neighbor_id']}",
                        "similarity": round(sim, 8),
                        "match_type": "related_concept"})

    matches.sort(key=lambda m: (-m["similarity"], m["match_id"],
                                m["match_type"]))
    matches = matches[:cfg.max_matches]

    # fuzzy_matcher.rs:641-685 overall confidence (position × type weight)
    if matches:
        ws = sum(m["similarity"] * MATCH_TYPE_WEIGHTS[m["match_type"]]
                 / (i + 1.0) for i, m in enumerate(matches))
        tw = sum(MATCH_TYPE_WEIGHTS[m["match_type"]] / (i + 1.0)
                 for i, m in enumerate(matches))
        conf = round(ws / tw, 8) if tw > 0 else 0.0
    else:
        conf = 0.0
    for rank, m in enumerate(matches, 1):
        m["rank"] = rank
        m["overall_confidence"] = conf
    return matches


# ---------------------------------------------- logic-form execution --
# logic_form.rs:562-781 — executor for Is / Related / Compare (Has /
# Happened / Caused are TODO-empty in the reference, faithfully).
# Entity iteration order pinned to name asc, id asc; relationship
# iteration pinned to (source, type, target) asc.


def lf_name_similarity(query_name: str, entity_name: str) -> float:
    """logic_form.rs:760-780 — exact 1.0 / contains-either 0.8 / word
    Jaccard."""
    ql = query_name.lower()
    el = entity_name.lower()
    if ql == el:
        return 1.0
    if ql in el or el in ql:
        return 0.8
    qw = set(ql.split())
    ew = set(el.split())
    union = len(qw | ew)
    return len(qw & ew) / union if union else 0.0


def lf_find_entity(entities: list[dict], name: str) -> dict | None:
    """logic_form.rs:744-757 — exact lowercase match first, else
    contains (either direction); first hit in pinned order."""
    nl = name.lower()
    for e in entities:
        if e["name"].lower() == nl:
            return e
    for e in entities:
        el = e["name"].lower()
        if nl in el or el in nl:
            return e
    return None


def execute_logic_form(lf: dict, entities: list[dict],
                       rels: list[dict], by_id: dict) -> list[dict]:
    """logic_form.rs:587-741 — bindings per predicate."""
    pred = lf["predicate"]
    args = lf["args"]
    bindings: list[dict] = []
    if pred == "Is" and args:
        arg = args[0]
        al = arg["value"].lower()
        for e in entities:
            if al in e["name"].lower():
                bindings.append({
                    "variable": arg["variable"] or "X",
                    "value": f"{e['name']} ({e['type']})",
                    "entity_id": e["entity_id"],
                    "confidence": lf_name_similarity(arg["value"],
                                                     e["name"])})
    elif pred == "Related" and len(args) >= 2:
        e1 = lf_find_entity(entities, args[0]["value"])
        e2 = lf_find_entity(entities, args[1]["value"])
        if e1 is not None and e2 is not None:
            for rel in rels:
                incident = (rel["source"] == e1["entity_id"]
                            or rel["target"] == e1["entity_id"])
                touches2 = (rel["source"] == e2["entity_id"]
                            or rel["target"] == e2["entity_id"])
                if incident and touches2:
                    bindings.append({
                        "variable": "R",
                        "value": f"{e1['name']} {rel['type']} {e2['name']}",
                        "entity_id": "",
                        "confidence": rel["conf"]})
            if not bindings:
                bindings.append({
                    "variable": "R",
                    "value": ("No direct relationship found between "
                              f"{e1['name']} and {e2['name']}"),
                    "entity_id": "", "confidence": 0.3})
    elif pred == "Compare" and len(args) >= 2:
        e1 = lf_find_entity(entities, args[0]["value"])
        e2 = lf_find_entity(entities, args[1]["value"])
        if e1 is not None and e2 is not None:
            bindings.append({
                "variable": "comparison",
                "value": (f"{e1['name']} is a {e1['type']} while "
                          f"{e2['name']} is a {e2['type']}"),
                "entity_id": "", "confidence": 0.7})
    return bindings


def retrieve_logic_form(query: str, entities: list[dict],
                        rels: list[dict], by_id: dict) -> dict | None:
    """logic_form.rs:834-930 — parse → execute → answer/confidence/
    sources; None when parsing fails or no bindings (the processor's
    signal to fall back to fuzzy matching)."""
    lf = parse_logic_form(query)
    if lf is None:
        return None
    bindings = execute_logic_form(lf, entities, rels, by_id)
    if not bindings:
        return None
    answer = bindings[0]["value"]
    conf = sum(b["confidence"] for b in bindings) / len(bindings)
    sources = [b["entity_id"] for b in bindings if b["entity_id"]]
    return {"predicate": lf["predicate"], "bindings": bindings,
            "answer": answer, "confidence": round(conf, 8),
            "sources": sources}


# ------------------------------------------------- processor pipeline --

VALIDATION_ISSUE_DESCRIPTIONS = [
    ("empty", "Query is empty"),
    ("toolong", "Query is very long"),
    ("safety", "Query contains potentially inappropriate content"),
    ("format", "Query contains no alphabetic characters"),
]


def _first_issue_description(v: dict) -> str:
    """validator.rs issue push order: length, safety, format."""
    if v["has_length_issue"]:
        return ("Query is empty" if not v["is_valid"]
                else "Query is very long")
    if v["has_safety_issue"]:
        return "Query contains potentially inappropriate content"
    if v["has_format_issue"]:
        return "Query contains no alphabetic characters"
    return "Query validation failed"


def process_query(query: str, entities: list[dict], rels: list[dict],
                  by_id: dict, adjacency: dict,
                  fuzzy_cfg: FuzzyMatchConfig = FuzzyMatchConfig(),
                  intent_cfg: IntentConfig = IntentConfig()) -> dict:
    """The ROGRAG processor pipeline (``processor.rs:353-560``):
    validate → intent gate → hybrid decomposition → per-subquery
    logic-form retrieval with fuzzy-matching fallback (fallback counter
    increments on every fuzzy use, and again when fuzzy itself finds
    nothing and the Fallback stub result is emitted).  Returns the
    STRUCTURAL response row; the reference's template-based prose
    assembly (``streaming.rs``) is presentation-layer and out of scope
    (documented).

    NOTE: with the reference's default refusal_threshold (0.8) and its
    intent formula topping out near 0.5, the intent gate refuses almost
    every query — faithful; pass a permissive ``intent_cfg`` (a public
    reference config knob) to exercise the retrieval path."""
    v = validate_query(query)
    if not v["is_valid"]:
        return {"status": "refused",
                "refusal_reason": _first_issue_description(v),
                "refusal_kind": "Invalid query", "n_subqueries": 0,
                "n_logic": 0, "n_fuzzy": 0, "n_fallback": 0,
                "fallback_count": 0, "answer": "",
                "mean_confidence": 0.0, "n_sources": 0}
    intent = classify_intent(query, intent_cfg)
    if intent["should_refuse"]:
        return {"status": "refused",
                "refusal_reason": intent["refusal_reason"]
                or "Query cannot be answered safely",
                "refusal_kind": "Safety refusal", "n_subqueries": 0,
                "n_logic": 0, "n_fuzzy": 0, "n_fallback": 0,
                "fallback_count": 0, "answer": "",
                "mean_confidence": 0.0, "n_sources": 0}

    dec = decompose_hybrid(query)
    n_logic = n_fuzzy = n_fallback = fallback_count = 0
    confs: list[float] = []
    sources: list[str] = []
    answer = ""
    for sub in dec["subqueries"]:
        lr = retrieve_logic_form(sub["text"], entities, rels, by_id)
        if lr is not None:
            n_logic += 1
            confs.append(lr["confidence"])
            sources.extend(lr["sources"])
            if not answer:
                answer = lr["answer"]
            continue
        matches = fuzzy_match_one(sub["text"], entities, adjacency,
                                  fuzzy_cfg)
        if matches:
            fallback_count += 1            # processor.rs:508 — fuzzy IS
            n_fuzzy += 1                   # the fallback level
            confs.append(matches[0]["overall_confidence"])
            sources.extend(m["match_id"] for m in matches)
        else:
            fallback_count += 1            # fuzzy failed → stub result
            n_fallback += 1
            confs.append(0.1)
    return {"status": "answered", "refusal_reason": "",
            "refusal_kind": "", "n_subqueries": len(dec["subqueries"]),
            "n_logic": n_logic, "n_fuzzy": n_fuzzy,
            "n_fallback": n_fallback, "fallback_count": fallback_count,
            "answer": answer,
            "mean_confidence": round(sum(confs) / len(confs), 8)
            if confs else 0.0,
            "n_sources": len(sources)}
