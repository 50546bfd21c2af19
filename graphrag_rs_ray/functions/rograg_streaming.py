"""ROGRAG response synthesis + streaming — port of
``graphrag-core/src/rograg/streaming.rs`` (the presentation layer the
``rograg_process`` query previously summarized; now a first-class
port).

Semantics pinned (every strategy, the template assembly and the
cleanup/attribution strings are re-derived by the DuckDB oracle from
staged subquery-result + intent rows):

- Synthesis strategies (``:811-1005``):
  * sequential — contents joined ". ", mean confidence;
  * weighted — zero total confidence falls back to sequential; stable
    sort desc, top-3 joined ". ", confidence = sqrt(Σc²/n);
  * best_only — max confidence with LAST-maximal ties (Rust
    ``max_by``);
  * smart_merge — logic-form rows preferred (fuzzy + fallback pooled),
    IN INPUT ORDER take 2 joined ". " (no sort — quirk), confidence =
    mean over ALL preferred rows (not just the two taken — quirk);
  * hierarchical — stable sort desc, primary + "Additionally: " +
    next-2 joined "; ", confidence = primary's.
- Template selection (``:405-457``): intent → type; Causal/Temporal
  have NO registered templates so they reach ``templates.get(...)
  .or(Fallback)`` and render the fallback pattern (quirk, pinned);
  unknown intents with > 1 subquery use Summary, else Fallback; every
  registered type carries exactly ONE template so the
  confidence-threshold scan always returns it.
- Placeholder generation (``:463-612``): entity = FIRST whitespace
  token of the first/indexed result ("the subject"/"entityN"
  fallbacks), relationship = first result containing
  "related"/"relationship" else "a connection", additional context =
  skip-1 contents joined ". " prefixed "Additionally, ", details =
  conf > 0.6 contents joined ". " ONLY when more than one, conclusion
  / confidence-indicator threshold strings, key points = top-3
  "i. content" joined "; " prefixed "Key points: ".
- ``clean_content``: strip surviving ``{placeholder}``s, collapse
  whitespace, trim, ensure terminal ``.!?``.
- Source attribution: top-3 "[i] source" joined ", " appended as
  "\\n\\nSources: …" (after cleanup, so the newlines survive).
- Final confidence = min(synthesis·0.7 + intent·0.3, 1.0) under
  confidence weighting; sources deduped in first-seen order.
- ``generate_streaming_chunks``: whitespace words in chunk_size
  groups, ``is_final`` when the NEXT boundary covers the total (an
  exact-multiple final chunk is still flagged, quirk-compatible).
- f32 → f64 arithmetic port (repo-wide documented deviation).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass


@dataclass
class StreamingConfig:
    """``streaming.rs:62-95`` defaults."""
    enable_streaming: bool = True
    chunk_size: int = 256
    max_response_length: int = 2048
    synthesis_strategy: str = "weighted"
    confidence_weighting: bool = True
    source_attribution: bool = True
    enable_citations: bool = True


TEMPLATES = {
    "factual": ("Based on the available information, {content}. "
                "{confidence_indicator}", 0.7),
    "definitional": ("{entity} is {definition}. {additional_context}",
                     0.6),
    "relational": ("{entity1} and {entity2} are related through "
                   "{relationship}. {details}", 0.5),
    "comparative": ("Comparing {entity1} and {entity2}: {comparison}. "
                    "{conclusion}", 0.6),
    "summary": ("Here's what I found about {topic}: {summary}. "
                "{key_points}", 0.5),
    "fallback": ("Based on the available information: {content}", 0.3),
}

_PLACEHOLDER_RE = re.compile(r"\{(\w+)\}")


def _unique(seq: list[str]) -> list[str]:
    seen, out = set(), []
    for s in seq:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


# ------------------------------------------------------- synthesis --

def synthesize_sequential(results: list[dict]) -> dict:
    content = ". ".join(r["content"] for r in results)
    avg = (sum(r["confidence"] for r in results) / len(results)
           if results else 0.0)
    return {"content": content, "confidence": avg,
            "sources": _unique([s for r in results
                                for s in r["sources"]]),
            "synthesis_method": "sequential"}


def synthesize_weighted(results: list[dict]) -> dict:
    total = sum(r["confidence"] for r in results)
    if total == 0.0:
        return synthesize_sequential(results)
    ordered = sorted(results, key=lambda r: -r["confidence"])  # stable
    content = ". ".join(r["content"] for r in ordered[:3])
    weighted = sum(r["confidence"] * r["confidence"]
                   for r in ordered) / len(ordered)
    return {"content": content, "confidence": math.sqrt(weighted),
            "sources": _unique([s for r in results
                                for s in r["sources"]]),
            "synthesis_method": "weighted"}


def synthesize_best_only(results: list[dict]) -> dict:
    if not results:
        raise ValueError("No best result found")
    best = results[0]
    for r in results:                  # max_by: LAST maximal wins
        if r["confidence"] >= best["confidence"]:
            best = r
    return {"content": best["content"],
            "confidence": best["confidence"],
            "sources": list(best["sources"]),
            "synthesis_method": "best_only"}


def synthesize_smart_merge(results: list[dict]) -> dict:
    logic = [r for r in results if r["result_type"] == "logic_form"]
    fuzzy = [r for r in results
             if r["result_type"] in ("fuzzy_match", "fallback")]
    primary = logic if logic else fuzzy
    if not primary:
        return synthesize_sequential(results)
    content = ". ".join(r["content"] for r in primary[:2])
    confidence = sum(r["confidence"] for r in primary) / len(primary)
    return {"content": content, "confidence": confidence,
            "sources": _unique([s for r in results
                                for s in r["sources"]]),
            "synthesis_method": "smart_merge"}


def synthesize_hierarchical(results: list[dict]) -> dict:
    ordered = sorted(results, key=lambda r: -r["confidence"])  # stable
    parts = []
    if ordered:
        parts.append(ordered[0]["content"])
    if len(ordered) > 1:
        supporting = [r["content"] for r in ordered[1:3]]
        if supporting:
            parts.append("Additionally: " + "; ".join(supporting))
    return {"content": ". ".join(parts),
            "confidence": ordered[0]["confidence"] if ordered else 0.0,
            "sources": _unique([s for r in results
                                for s in r["sources"]]),
            "synthesis_method": "hierarchical"}


_STRATEGIES = {"sequential": synthesize_sequential,
               "weighted": synthesize_weighted,
               "best_only": synthesize_best_only,
               "smart_merge": synthesize_smart_merge,
               "hierarchical": synthesize_hierarchical}


def synthesize(results: list[dict], strategy: str) -> dict:
    return _STRATEGIES[strategy](results)


# ------------------------------------------------- template assembly --

_INTENT_TEMPLATE = {"factual": "factual", "definitional": "definitional",
                    "relational": "relational",
                    "comparative": "comparative", "summary": "summary",
                    "exploratory": "summary", "causal": "causal",
                    "temporal": "temporal"}


def determine_template_type(primary_intent: str,
                            n_subqueries: int) -> str:
    t = _INTENT_TEMPLATE.get(primary_intent)
    if t is not None:
        return t
    return "summary" if n_subqueries > 1 else "fallback"


def select_template(template_type: str) -> tuple[str, str]:
    """Returns (effective_type, pattern) — Causal/Temporal have no
    registered templates and fall back (``:441-444``)."""
    if template_type in TEMPLATES:
        return template_type, TEMPLATES[template_type][0]
    return "fallback", TEMPLATES["fallback"][0]


def generate_confidence_indicator(confidence: float) -> str:
    if confidence >= 0.9:
        return "I'm very confident in this information."
    if confidence >= 0.7:
        return "This information appears to be reliable."
    if confidence >= 0.5:
        return "This information has moderate confidence."
    return "Please note that this information has limited confidence."


def extract_primary_entity(results: list[dict]) -> str:
    if not results:
        return "the subject"
    words = results[0]["content"].split()
    return words[0] if words else "the subject"


def extract_entity_by_index(results: list[dict], index: int) -> str:
    if index < len(results):
        words = results[index]["content"].split()
        return words[0] if words else "entity"
    return f"entity{index + 1}"


def extract_relationship(results: list[dict]) -> str:
    for r in results:
        if "related" in r["content"] or "relationship" in r["content"]:
            return r["content"]
    return "a connection"


def generate_additional_context(results: list[dict]) -> str:
    if len(results) > 1:
        additional = [r["content"] for r in results[1:]]
        if additional:
            return "Additionally, " + ". ".join(additional)
    return ""


def generate_details(results: list[dict]) -> str:
    details = [r["content"] for r in results if r["confidence"] > 0.6]
    if len(details) > 1:
        return ". ".join(details)
    return ""


def generate_conclusion(confidence: float) -> str:
    if confidence > 0.8:
        return ("This appears to be well-supported by the available "
                "information.")
    if confidence > 0.6:
        return "This conclusion is supported by the available evidence."
    return "This is based on limited information."


def generate_key_points(results: list[dict]) -> str:
    points = [f"{i + 1}. {r['content']}"
              for i, r in enumerate(results[:3])]
    if not points:
        return ""
    return "Key points: " + "; ".join(points)


def clean_content(content: str) -> str:
    content = _PLACEHOLDER_RE.sub("", content)
    content = re.sub(r"\s+", " ", content)
    content = content.strip()
    if content and content[-1] not in ".!?":
        content += "."
    return content


def generate_content(pattern: str, synthesis: dict,
                     results: list[dict]) -> str:
    content = pattern
    for placeholder in _PLACEHOLDER_RE.findall(pattern):
        if placeholder == "content":
            rep = synthesis["content"]
        elif placeholder == "confidence_indicator":
            rep = generate_confidence_indicator(synthesis["confidence"])
        elif placeholder == "entity":
            rep = extract_primary_entity(results)
        elif placeholder == "entity1":
            rep = extract_entity_by_index(results, 0)
        elif placeholder == "entity2":
            rep = extract_entity_by_index(results, 1)
        elif placeholder == "definition":
            rep = synthesis["content"]
        elif placeholder == "relationship":
            rep = extract_relationship(results)
        elif placeholder == "comparison":
            rep = synthesis["content"]
        elif placeholder == "topic":
            rep = extract_primary_entity(results)
        elif placeholder == "summary":
            rep = synthesis["content"]
        elif placeholder == "additional_context":
            rep = generate_additional_context(results)
        elif placeholder == "details":
            rep = generate_details(results)
        elif placeholder == "conclusion":
            rep = generate_conclusion(synthesis["confidence"])
        elif placeholder == "key_points":
            rep = generate_key_points(results)
        else:
            rep = f"[{placeholder}]"
        content = content.replace("{" + placeholder + "}", rep)
    return clean_content(content)


def add_source_attribution(content: str, sources: list[str],
                           cfg: StreamingConfig) -> str:
    if cfg.enable_citations and sources:
        listed = ", ".join(f"[{i + 1}] {s}"
                           for i, s in enumerate(sources[:3]))
        return f"{content}\n\nSources: {listed}"
    return content


def build_response(query: str, subquery_results: list[dict],
                   intent: dict,
                   cfg: StreamingConfig | None = None) -> dict:
    """``:256-403`` — the full response assembly."""
    cfg = cfg or StreamingConfig()
    synthesis = synthesize(subquery_results, cfg.synthesis_strategy)
    template_type = determine_template_type(intent["primary_intent"],
                                            len(subquery_results))
    effective_type, pattern = select_template(template_type)
    content = generate_content(pattern, synthesis, subquery_results)
    if cfg.source_attribution:
        content = add_source_attribution(content, synthesis["sources"],
                                         cfg)
    if cfg.confidence_weighting:
        confidence = min(synthesis["confidence"] * 0.7
                         + intent["confidence"] * 0.3, 1.0)
    else:
        confidence = synthesis["confidence"]
    sources = _unique([s for r in subquery_results
                       for s in r["sources"]])
    return {
        "query": query,
        "content": content,
        "confidence": confidence,
        "sources": sources,
        "template_type": template_type,
        "effective_template": effective_type,
        "synthesis_method": synthesis["synthesis_method"],
        "subqueries_processed": len(subquery_results),
        "fallback_used": any(r["result_type"] == "fallback"
                             for r in subquery_results),
    }


def generate_streaming_chunks(response: dict,
                              cfg: StreamingConfig | None = None
                              ) -> list[dict]:
    """``:700-730``."""
    cfg = cfg or StreamingConfig()
    words = response["content"].split()
    total = len(words)
    chunks = []
    for idx in range(0, max((total + cfg.chunk_size - 1)
                            // cfg.chunk_size, 0)):
        part = words[idx * cfg.chunk_size:(idx + 1) * cfg.chunk_size]
        chunks.append({
            "chunk_id": idx,
            "content": " ".join(part),
            "is_final": (idx + 1) * cfg.chunk_size >= total,
            "confidence": response["confidence"],
            "sources": list(response["sources"])})
    return chunks


__all__ = ["StreamingConfig", "TEMPLATES", "synthesize",
           "synthesize_sequential", "synthesize_weighted",
           "synthesize_best_only", "synthesize_smart_merge",
           "synthesize_hierarchical", "determine_template_type",
           "select_template", "generate_content", "clean_content",
           "add_source_attribution", "build_response",
           "generate_streaming_chunks", "generate_confidence_indicator",
           "extract_primary_entity", "extract_entity_by_index",
           "extract_relationship", "generate_additional_context",
           "generate_details", "generate_conclusion",
           "generate_key_points"]
