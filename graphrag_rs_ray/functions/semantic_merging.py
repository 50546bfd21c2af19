"""Semantic entity merging — port of
``graphrag-core/src/entity/semantic_merging.rs`` (similarity grouping,
heuristic merge decisions, merged-entity construction; the LLM path is
the reference's own placeholder heuristic, ``:113-131``).

Semantics pinned (pair similarities and the decision/merge arithmetic
are re-derived by the DuckDB oracle; the greedy grouping pass is
sequential-stateful → unit-gated, its assignments staged):

- string_similarity (``:209-236``): exact (case-insensitive) → 1.0;
  substring containment (either direction) → 0.9; else Jaccard over
  DISTINCT lowercase whitespace words.
- semantic similarity (``:519-541``): name_sim · 0.7 + type_match ·
  0.3; grouping keeps STRICTLY-greater-than-threshold pairs.  At
  threshold ≥ 0.7 cross-type pairs are unreachable (max 0.7 — not >),
  so per-type partitioning is exact (the sharded twin's key).
- group_similar_entities (``:57-88``): single greedy pass in input
  order — each unprocessed seed absorbs every later unprocessed
  similar entity (star groups, NOT transitive closure); only groups
  with > 1 member are returned.  Input is sorted by entity_id
  (documented determinism; the reference takes slice order).
- heuristic decision (``:133-185``): all-same-type gate; group mean of
  PAIRWISE name similarities > 0.8 → merge with confidence = mean sim,
  reasoning "High name similarity (X.XX) and matching types"; else
  no-merge with confidence 1 − mean sim; type mismatch → no-merge
  confidence 1.0.
- select_best_name (``:238-254``): longest name, confidence
  tie-break (max_by keeps the LAST maximal element on ties).
- combine_descriptions (``:256-273``): with mentions → "Entity 'X'
  mentioned in context", else "Entity 'X' of type T"; joined "; ".
- merge_entities (``:333-378``): first entity's id/type/embedding,
  decision name (or best-name fallback), all mentions concatenated,
  confidence = max(mean member confidence, decision confidence).
  f32 → f64 (repo-wide discipline), round-8 outputs.
"""

from __future__ import annotations


def string_similarity(s1: str, s2: str) -> float:
    a, b = s1.lower(), s2.lower()
    if a == b:
        return 1.0
    if b in a or a in b:
        return 0.9
    w1, w2 = set(a.split()), set(b.split())
    union = len(w1 | w2)
    return len(w1 & w2) / union if union else 0.0


def semantic_similarity(name1: str, type1: str, name2: str,
                        type2: str) -> float:
    name_sim = string_similarity(name1, name2)
    type_sim = 1.0 if type1 == type2 else 0.0
    return name_sim * 0.7 + type_sim * 0.3


def group_similar_entities(entities: list[dict],
                           threshold: float) -> list[list[dict]]:
    """``semantic_merging.rs:57-88``; ``entities`` rows carry
    entity_id/name/type/conf/mention_count."""
    groups = []
    processed: set[int] = set()
    for i, e1 in enumerate(entities):
        if i in processed:
            continue
        group = [e1]
        processed.add(i)
        for j, e2 in enumerate(entities):
            if i == j or j in processed:
                continue
            sim = semantic_similarity(e1["name"], e1["type"],
                                      e2["name"], e2["type"])
            if sim > threshold:
                group.append(e2)
                processed.add(j)
        if len(group) > 1:
            groups.append(group)
    return groups


def group_mean_name_similarity(group: list[dict]) -> float:
    if len(group) < 2:
        return 1.0
    total, n = 0.0, 0
    for i in range(len(group)):
        for j in range(i + 1, len(group)):
            total += string_similarity(group[i]["name"], group[j]["name"])
            n += 1
    return total / n if n else 0.0


def select_best_name(group: list[dict]) -> str:
    """Longest name; confidence tie-break; Rust ``max_by`` keeps the
    LAST maximal element on full ties."""
    best = group[0]
    for e in group[1:]:
        if (len(e["name"]), e["conf"]) >= (len(best["name"]),
                                           best["conf"]):
            best = e
    return best["name"]


def combine_descriptions(group: list[dict]) -> str:
    parts = []
    for e in group:
        if e.get("mention_count", 0) > 0:
            parts.append(f"Entity '{e['name']}' mentioned in context")
        else:
            parts.append(f"Entity '{e['name']}' of type {e['type']}")
    return "; ".join(parts) if parts else \
        "Merged entity from multiple sources"


def heuristic_merge_decision(group: list[dict]) -> dict:
    """``semantic_merging.rs:133-185``."""
    if len(group) < 2:
        return {"should_merge": False, "confidence": 1.0,
                "reasoning": "Only one entity in group",
                "merged_name": None, "merged_description": None}
    all_same_type = all(e["type"] == group[0]["type"] for e in group)
    if not all_same_type:
        return {"should_merge": False, "confidence": 1.0,
                "reasoning": "Different entity types",
                "merged_name": None, "merged_description": None}
    ns = group_mean_name_similarity(group)
    if ns > 0.8:
        return {"should_merge": True, "confidence": ns,
                "reasoning": f"High name similarity ({ns:.2f}) "
                             f"and matching types",
                "merged_name": select_best_name(group),
                "merged_description": combine_descriptions(group)}
    return {"should_merge": False, "confidence": 1.0 - ns,
            "reasoning": f"Low name similarity ({ns:.2f})",
            "merged_name": None, "merged_description": None}


def merge_entities(group: list[dict], decision: dict) -> dict:
    """``semantic_merging.rs:333-378``: first-id, combined mentions,
    max(avg confidence, decision confidence)."""
    if not decision["should_merge"]:
        return dict(group[0])
    name = decision["merged_name"] or select_best_name(group)
    avg_conf = sum(e["conf"] for e in group) / len(group)
    return {"entity_id": group[0]["entity_id"], "name": name,
            "type": group[0]["type"],
            "conf": max(avg_conf, decision["confidence"]),
            "mention_count": sum(e.get("mention_count", 0)
                                 for e in group)}
