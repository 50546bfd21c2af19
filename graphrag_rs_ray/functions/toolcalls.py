"""Function-calling tool kernels (pure Python, no Ray).

Port of the reference's agent tool surface: the five graph tools with
their argument validation (``function_calling/functions.rs:11-874``) and
the co-occurrence relationship-inference engine (``inference.rs:
29-402``).  The engine-side reframing is BATCH tool execution: a table
of (call_id, function, arguments) rows flows through a ``map_batches``
stage with the knowledge graph broadcast once — the shape an agent
fleet's tool traffic takes at scale.

Documented deviations (reference iteration orders are impl-defined):
- entity iteration order = name asc, then entity_id asc;
- relationship iteration order = (source, type, target) asc;
- chunk iteration order = chunk_id asc;
- graph_search tie-break = (relevance desc, name asc, id asc);
- inference result tie-break = (confidence desc, target id asc);
- mention rows carry (chunk_id, confidence) — per-mention character
  offsets are not tracked by this engine's mention aggregates.
The reference's path "BFS" is actually a stack-based DFS whose global
visited set admits at most ONE path per query (the first pop of the
target records it and blocks the rest) — preserved faithfully with the
pinned edge order.
"""

from __future__ import annotations

from dataclasses import dataclass

from .similarity import levenshtein_distance

# ------------------------------------------------------ entity resolve --


def fuzzy_name_match(entity_name: str, query_name: str) -> bool:
    """functions.rs:44-70 — single-word prefix match, last-name match,
    else edit distance ≤ max(min_byte_len // 4, 1)."""
    el = entity_name.lower()
    ql = query_name.lower()
    ep = el.split()
    qp = ql.split()
    if len(qp) == 1 and ep:
        return ep[0].startswith(qp[0]) or qp[0].startswith(ep[0])
    if ep and qp and ep[-1] == qp[-1]:
        return True
    dist = levenshtein_distance(el, ql)
    max_allowed = max(min(len(ql.encode()), len(el.encode())) // 4, 1)
    return dist <= max_allowed


def resolver_find(entities: list[dict], name: str) -> dict | None:
    """functions.rs:15-42 — exact lowercase/trim, then contains (either
    direction), then fuzzy; first hit in the pinned entity order."""
    nl = name.lower().strip()
    for e in entities:
        if e["name"].lower().strip() == nl:
            return e
    for e in entities:
        el = e["name"].lower()
        if nl in el or el in nl:
            return e
    for e in entities:
        if fuzzy_name_match(e["name"], name):
            return e
    return None


def find_by_name_or_id(entities: list[dict], name_or_id: str) -> dict | None:
    """functions.rs:562-595 — exact id, exact (case-sensitive) name,
    then case-insensitive contains."""
    for e in entities:
        if e["entity_id"] == name_or_id:
            return e
    for e in entities:
        if e["name"] == name_or_id:
            return e
    nl = name_or_id.lower()
    for e in entities:
        if nl in e["name"].lower():
            return e
    return None


# -------------------------------------------------------- validation --

_VALIDATORS = {
    "graph_search": [("entity_name", "str", "entity_name must be a string"),
                     ("limit", (1, 100), "limit must be between 1 and 100")],
    "entity_expand": [("entity_id", "str", "entity_id must be a string"),
                      ("depth", (1, 5), "depth must be between 1 and 5"),
                      ("limit", (1, 100), "limit must be between 1 and 100")],
    "get_entity_context": [
        ("entity_id", "str", "entity_id must be a string"),
        ("limit", (1, 50), "limit must be between 1 and 50")],
}


def validate_tool_args(function: str, args: dict) -> str:
    """Port of each tool's validate_arguments (functions.rs:222-241,
    348-376, 438-472, 693-711); '' when valid, else the error text."""
    if function == "relationship_traverse":
        if any(isinstance(args.get(k), str) for k in
               ("entity_id_1", "entity1_id", "entity_id_2", "entity2_id")):
            return ("PARAMETER ERROR: Use 'source_entity' and "
                    "'target_entity' (not 'entity_id_1', 'entity1_id', "
                    "etc.)")
        if not isinstance(args.get("source_entity"), str):
            return "REQUIRED PARAMETER: 'source_entity' must be a string"
        if not isinstance(args.get("target_entity"), str):
            return "REQUIRED PARAMETER: 'target_entity' must be a string"
        mh = args.get("max_hops")
        if isinstance(mh, int) and not 1 <= mh <= 10:
            return "PARAMETER ERROR: 'max_hops' must be between 1 and 10"
        return ""
    if function == "infer_relationships":
        if not isinstance(args.get("entity_name"), str):
            return "entity_name is required"
        return ""
    for key, rule, msg in _VALIDATORS.get(function, ()):
        v = args.get(key)
        if rule == "str":
            if not isinstance(v, str):
                return msg
        elif isinstance(v, int) and not rule[0] <= v <= rule[1]:
            return msg
    return ""


# ------------------------------------------------------------- tools --


def tool_graph_search(args: dict, graph: dict) -> list[dict]:
    """functions.rs:121-196 — exact (1.0) / contains (0.8) / fuzzy (0.6)
    phases; later phases run only while found < limit; sort + truncate."""
    name = args["entity_name"]
    limit = args.get("limit", 10)
    nl = name.lower().strip()
    seen: set[str] = set()
    matches: list[tuple[dict, float]] = []
    for e in graph["entities"]:
        if e["name"].lower().strip() == nl and e["entity_id"] not in seen:
            seen.add(e["entity_id"])
            matches.append((e, 1.0))
    if len(matches) < limit:
        for e in graph["entities"]:
            el = e["name"].lower()
            if ((name.lower() in el or el in name.lower())
                    and e["entity_id"] not in seen):
                seen.add(e["entity_id"])
                matches.append((e, 0.8))
    if len(matches) < limit:
        for e in graph["entities"]:
            if (fuzzy_name_match(e["name"], name)
                    and e["entity_id"] not in seen):
                seen.add(e["entity_id"])
                matches.append((e, 0.6))
    matches.sort(key=lambda t: (-t[1], t[0]["name"], t[0]["entity_id"]))
    return [{"id": e["entity_id"], "name": e["name"], "type": e["type"],
             "confidence": e["conf"], "relevance_score": s,
             "mentions_count": e["mention_count"]}
            for e, s in matches[:limit]]


def tool_entity_expand(args: dict, graph: dict) -> list[dict] | str:
    """functions.rs:246-318 — incident relationships (pinned order),
    take limit, with the related entity resolved; error string when the
    entity id is unknown."""
    eid = args["entity_id"]
    limit = args.get("limit", 20)
    if eid not in graph["by_id"]:
        return f"Entity with id '{eid}' not found"
    out = []
    for rel in graph["rels"]:
        if len(out) >= limit:
            break
        if rel["source"] == eid or rel["target"] == eid:
            is_source = rel["source"] == eid
            rid = rel["target"] if is_source else rel["source"]
            related = graph["by_id"].get(rid)
            out.append({
                "relationship_type": rel["type"],
                "direction": "outgoing" if is_source else "incoming",
                "related_id": related["entity_id"] if related else "",
                "related_name": related["name"] if related else "",
                "related_type": related["type"] if related else "",
                "confidence": rel["conf"]})
    return out


def tool_relationship_traverse(args: dict, graph: dict) -> list[dict] | str:
    """functions.rs:476-560 — the reference's stack-based 'BFS' with a
    global visited set (at most one non-trivial path; see module
    docstring), edges iterated in the pinned order."""
    src = find_by_name_or_id(graph["entities"], args["source_entity"])
    if src is None:
        return f"Entity '{args['source_entity']}' not found"
    dst = find_by_name_or_id(graph["entities"], args["target_entity"])
    if dst is None:
        return f"Entity '{args['target_entity']}' not found"
    max_hops = args.get("max_hops", 3)
    if src["entity_id"] == dst["entity_id"]:
        return [{"path": [src["entity_id"]], "length": 0, "rel_types": []}]

    stack = [(src["entity_id"], [], [])]
    visited: set[str] = set()
    paths = []
    while stack:
        current, path, rels = stack.pop()
        if len(path) >= max_hops:
            continue
        if current in visited:
            continue
        visited.add(current)
        if current == dst["entity_id"]:
            paths.append({"path": path + [current], "length": len(path),
                          "rel_types": rels})
            continue
        for rel in graph["rels"]:
            nxt = (rel["target"] if rel["source"] == current
                   else rel["source"] if rel["target"] == current else None)
            if nxt is not None and nxt not in visited:
                stack.append((nxt, path + [current],
                              rels + [rel["type"]]))
    paths.sort(key=lambda p: p["length"])
    return paths


def tool_get_entity_context(args: dict, graph: dict) -> dict | str:
    """functions.rs:600-666 — context chunks containing the entity
    (pinned chunk order, take limit) + the entity's mention rows."""
    eid = args["entity_id"]
    limit = args.get("limit", 5)
    ent = graph["by_id"].get(eid)
    if ent is None:
        return f"Entity with id '{eid}' not found"
    chunks = [{"chunk_id": c["chunk_id"], "doc_id": c["doc_id"],
               "n_entities": len(c["entity_ids"])}
              for c in graph["chunks"] if eid in c["entity_set"]][:limit]
    mentions = graph["mentions_by_entity"].get(eid, [])
    return {"entity": ent, "chunks": chunks, "mentions": mentions}


# ----------------------------------------------------------- inference --


@dataclass(frozen=True)
class InferenceConfig:
    """inference.rs:39-47 defaults."""
    min_confidence: float = 0.3
    max_candidates: int = 10


FRIENDSHIP_PATTERNS = [
    ("best friend", 0.8), ("close friend", 0.7), ("good friend", 0.6),
    ("friend", 0.4), ("friends", 0.4), ("friendship", 0.5),
    ("played together", 0.6), ("went together", 0.5), ("talked with", 0.4),
    ("helped each other", 0.7), ("shared", 0.3), ("together", 0.3),
    ("trusted", 0.6), ("loyal", 0.5), ("bond", 0.5), ("close", 0.4),
    ("cared for", 0.6), ("looked after", 0.5), ("protected", 0.6),
    ("adventure", 0.4), ("explore", 0.3), ("journey", 0.3),
    ("companion", 0.6), ("partner", 0.5), ("ally", 0.5),
]

NEGATIVE_PATTERNS = [
    ("enemy", -0.8), ("enemies", -0.8), ("rival", -0.6), ("rivals", -0.6),
    ("fought", -0.5), ("fight", -0.4), ("battle", -0.4), ("conflict", -0.5),
    ("angry at", -0.6), ("hate", -0.7), ("hated", -0.7), ("despise", -0.6),
    ("betrayed", -0.8), ("betrayal", -0.7), ("argued", -0.3),
    ("quarrel", -0.4), ("against", -0.2), ("opposed", -0.4),
    ("disagree", -0.2),
]

FAMILY_PATTERNS = ["brother", "sister", "cousin", "aunt", "uncle", "family"]


def extract_entity_name(entity_id: str) -> str:
    """inference.rs:287-299 — strip the TYPE_ prefix, underscores →
    spaces, lowercase."""
    pos = entity_id.find("_")
    if pos != -1:
        return entity_id[pos + 1:].replace("_", " ").lower()
    return entity_id.lower()


def proximity_score(content_lower: str, name_a: str, name_b: str) -> float:
    """inference.rs:318-365 — min word-distance between mentions
    (word CONTAINS the full entity-name string, faithfully — multi-word
    names therefore rarely hit)."""
    words = content_lower.split()
    pos_a = [i for i, w in enumerate(words) if name_a in w.lower()]
    pos_b = [i for i, w in enumerate(words) if name_b in w.lower()]
    if not pos_a or not pos_b:
        return 0.0
    d = min(abs(a - b) for a in pos_a for b in pos_b)
    if d <= 2:
        return 0.4
    if d <= 5:
        return 0.3
    if d <= 10:
        return 0.2
    if d <= 20:
        return 0.1
    return 0.05


def entities_near_pattern(content_lower: str, name_a: str, name_b: str,
                          pattern: str) -> bool:
    """inference.rs:373-390 — ±100-char window around the FIRST pattern
    occurrence contains both names."""
    p = content_lower.find(pattern)
    if p == -1:
        return False
    start = max(p - 100, 0)
    end = min(p + len(pattern) + 100, len(content_lower))
    ctx = content_lower[start:end]
    return name_a in ctx and name_b in ctx


def evidence_score(content: str, id_a: str, id_b: str) -> float:
    """inference.rs:155-270 — base 0.2 + proximity + weighted pattern
    bonuses/penalties (×0.5/×0.3 positive, ×1.2/×0.8 negative by
    entity-near-pattern context), ×0.8 family damper, clamp [0, 1]."""
    content_l = content.lower()
    name_a = extract_entity_name(id_a)
    name_b = extract_entity_name(id_b)
    score = 0.2 + proximity_score(content_l, name_a, name_b)
    for pattern, weight in FRIENDSHIP_PATTERNS:
        if pattern in content_l:
            near = entities_near_pattern(content_l, name_a, name_b, pattern)
            score += weight * (0.5 if near else 0.3)
    for pattern, weight in NEGATIVE_PATTERNS:
        if pattern in content_l:
            near = entities_near_pattern(content_l, name_a, name_b, pattern)
            score += weight * (1.2 if near else 0.8)
    if any(p in content_l for p in FAMILY_PATTERNS):
        score *= 0.8
    return min(max(score, 0.0), 1.0)


def infer_relationships(target_id: str, relation_type: str, graph: dict,
                        cfg: InferenceConfig = InferenceConfig()
                        ) -> list[dict]:
    """inference.rs:83-137 — sum per-chunk evidence over co-occurring
    entities, normalize by the target's chunk count (min 1.0 cap),
    threshold, sort (confidence desc, target id asc), truncate."""
    if target_id not in graph["by_id"]:
        return []
    target_chunks = [c for c in graph["chunks"]
                     if target_id in c["entity_set"]]
    scores: dict[str, float] = {}
    for chunk in target_chunks:
        for eid in chunk["entity_ids"]:
            if eid != target_id:
                scores[eid] = (scores.get(eid, 0.0)
                               + evidence_score(chunk["text"], target_id,
                                                eid))
    out = []
    for eid, s in scores.items():
        norm = min(s / len(target_chunks), 1.0)
        if norm >= cfg.min_confidence:
            out.append({"target": eid,
                        "target_name": graph["by_id"][eid]["name"]
                        if eid in graph["by_id"] else eid,
                        "relation_type": relation_type,
                        "confidence": round(norm, 8),
                        "evidence_count": len(target_chunks)})
    out.sort(key=lambda r: (-r["confidence"], r["target"]))
    return out[:cfg.max_candidates]
