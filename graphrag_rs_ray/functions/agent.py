"""Function-calling agent layer — port of
``graphrag-core/src/function_calling/{mod,agent,tools,
enhanced_registry}.rs`` (the tool kernels themselves live in
``functions/toolcalls.py`` = functions.rs).

Semantics pinned:

- ``FunctionCaller`` (``mod.rs:80-240``): validate-then-call, failed
  validation returns a FAILED result (not an error), unknown function
  raises; per-query call cap (default 10) raises; history + usage
  statistics.
- ``GraphRAGAgent`` (``agent.rs``): strategy detection by substring
  (relationship/connect/relation/between → RelationshipExploration;
  context/detail/about/information → ContextualAnalysis; else
  EntitySearch if entities were found, else Adaptive); entity
  extraction scans 1- then 2-word windows and takes the FIRST graph
  entity whose lowercased name contains the window — the reference
  iterates a HashMap (nondeterministic), this port iterates entities
  sorted by name (documented); first double-quoted span appended;
  sort+dedup.  Plans: graph_search limit 5 per entity (EntitySearch) /
  limit 3 (+ relationship_traverse over the first two sorted entities,
  max_hops 3) / limit 3 (Contextual) / Adaptive falls back to
  capitalized >3-byte terms, take 3, limit 5.  Plan confidence
  hardcoded 0.8, expected outcomes ["entities","relationships"].
- ``synthesize_answer`` (``agent.rs:300-383``): per-function formatted
  count lines, empty-plan and no-parts fallback strings, final
  ``Query: "…"\\n\\nResults:\\n…`` assembly.
- ``ToolRegistry`` / ``PromptBuilder`` (``tools.rs``): OpenAI
  definition wrappers, function_call + tool_calls parsing, result
  formatting (1-indexed, Status/Result/Error/Execution time lines),
  the system prompt verbatim, function-calling + synthesis prompts.
- ``QueryAnalyzer`` (``tools.rs:237-335``): focus flags by substring,
  requires_search = NOT list all/show all, complexity relationship >
  context > low; quote scanner treats ' and " as interchangeable
  toggles; capitalized terms = len > 2, first char upper, NOT all-caps,
  trimmed of non-alphanumerics.
- ``EnhancedToolRegistry`` (``enhanced_registry.rs``): category
  registration, usage stats, recommended-functions (category match or
  top-5 by usage), plus the five enhanced functions
  (enhanced_graph_search / enhanced_entity_expand — whose depth≤1 path
  returns an EMPTY expanded list (quirk) — enhanced_relationship
  analysis, context_analysis word-count buckets, summary_generation
  with the max_length-3 truncation).
"""

from __future__ import annotations

import json

from .toolcalls import (
    find_by_name_or_id,
    infer_relationships,
    tool_entity_expand,
    tool_get_entity_context,
    tool_graph_search,
    tool_relationship_traverse,
    validate_tool_args,
)

# ------------------------------------------------- default functions --

DEFAULT_FUNCTION_DEFINITIONS = {
    "graph_search": {
        "name": "graph_search",
        "description": "Search for entities in the knowledge graph by "
                       "name or partial name match",
        "parameters": {
            "type": "object",
            "properties": {
                "entity_name": {
                    "type": "string",
                    "description": "Name or partial name of the entity "
                                   "to search for"},
                "limit": {
                    "type": "integer",
                    "description": "Maximum number of results to return "
                                   "(default: 10)",
                    "default": 10}},
            "required": ["entity_name"]},
    },
    "entity_expand": {
        "name": "entity_expand",
        "description": "Expand an entity by finding all its "
                       "relationships and connected entities",
        "parameters": {
            "type": "object",
            "properties": {
                "entity_id": {"type": "string",
                              "description": "ID of the entity to expand"},
                "depth": {"type": "integer",
                          "description": "Depth of expansion (how many "
                                         "hops away from the entity, "
                                         "default: 1)",
                          "default": 1},
                "limit": {"type": "integer",
                          "description": "Maximum number of relationships "
                                         "to return (default: 20)",
                          "default": 20}},
            "required": ["entity_id"]},
    },
    "relationship_traverse": {
        "name": "relationship_traverse",
        "description": "Find relationship paths between two entities in "
                       "the knowledge graph",
        "parameters": {
            "type": "object",
            "properties": {
                "source_entity": {"type": "string",
                                  "description": "Name or ID of the "
                                                 "source entity"},
                "target_entity": {"type": "string",
                                  "description": "Name or ID of the "
                                                 "target entity"},
                "max_hops": {"type": "integer",
                             "description": "Maximum number of hops to "
                                            "traverse (default: 3)",
                             "default": 3}},
            "required": ["source_entity", "target_entity"]},
    },
    "get_entity_context": {
        "name": "get_entity_context",
        "description": "Get text chunks and mentions where an entity "
                       "appears for detailed context",
        "parameters": {
            "type": "object",
            "properties": {
                "entity_id": {"type": "string",
                              "description": "ID of the entity to get "
                                             "context for"},
                "limit": {"type": "integer",
                          "description": "Maximum number of context "
                                         "chunks to return (default: 5)",
                          "default": 5}},
            "required": ["entity_id"]},
    },
    "infer_relationships": {
        "name": "infer_relationships",
        "description": "Infer implicit relationships between entities "
                       "based on context patterns, co-occurrence, and "
                       "interaction indicators",
        "parameters": {
            "type": "object",
            "properties": {
                "entity_name": {"type": "string",
                                "description": "Name of the entity to "
                                               "find relationships for"},
                "relation_type": {"type": "string",
                                  "description": "Type of relationship "
                                                 "to infer (FRIEND, "
                                                 "ENEMY, ALLY, FAMILY, "
                                                 "etc.)",
                                  "default": "FRIEND"},
                "min_confidence": {"type": "number",
                                   "description": "Minimum confidence "
                                                  "threshold for "
                                                  "relationships "
                                                  "(0.0-1.0)",
                                   "default": 0.3}},
            "required": ["entity_name"]},
    },
}


def _call_default(function: str, args: dict, graph: dict):
    if function == "graph_search":
        return {"entities": tool_graph_search(args, graph)}
    if function == "entity_expand":
        out = tool_entity_expand(args, graph)
        if isinstance(out, str):
            raise ValueError(out)
        return {"relationships": out}
    if function == "relationship_traverse":
        out = tool_relationship_traverse(args, graph)
        if isinstance(out, str):
            raise ValueError(out)
        return {"paths": out}
    if function == "get_entity_context":
        out = tool_get_entity_context(args, graph)
        if isinstance(out, str):
            raise ValueError(out)
        # functions.rs:654-665 names the chunk list "context_chunks"
        return {"entity": out["entity"],
                "context_chunks": out["chunks"],
                "mentions": out["mentions"],
                "total_chunks": len(out["chunks"]),
                "total_mentions": len(out["mentions"])}
    if function == "infer_relationships":
        from .toolcalls import InferenceConfig
        return {"relationships": infer_relationships(
            _resolve_target(args, graph),
            args.get("relation_type", "FRIEND"), graph,
            InferenceConfig(
                min_confidence=args.get("min_confidence", 0.3)))}
    raise KeyError(function)


def _resolve_target(args: dict, graph: dict) -> str:
    e = find_by_name_or_id(graph["entities"], args.get("entity_name", ""))
    return e["entity_id"] if e else ""


class FunctionCaller:
    """``mod.rs:80-240``."""

    def __init__(self, clock=None):
        self._functions: dict[str, dict] = {}
        self.max_calls_per_query = 10
        self.call_history: list[dict] = []
        self._clock = clock if clock is not None else (lambda: 0.0)

    def register_function(self, name: str, definition: dict,
                          call_fn, validate_fn=None):
        self._functions[name] = {
            "definition": definition, "call": call_fn,
            "validate": validate_fn}

    def register_defaults(self, graph: dict):
        """``tools.rs:15-32`` ToolRegistry::register_default_functions."""
        for name, definition in DEFAULT_FUNCTION_DEFINITIONS.items():
            self.register_function(
                name, definition,
                (lambda nm: lambda args: _call_default(nm, args,
                                                       graph))(name),
                (lambda nm: lambda args: validate_tool_args(nm,
                                                            args))(name))

    def get_function_definitions(self) -> list[dict]:
        return [f["definition"] for _, f in sorted(
            self._functions.items())]

    def call_function(self, call: dict) -> dict:
        name = call["name"]
        start = self._clock()
        fn = self._functions.get(name)
        if fn is None:
            raise KeyError(f"Function '{name}' not found")
        if fn["validate"] is not None:
            err = fn["validate"](call["arguments"])
            if err:
                result = {"function_name": name,
                          "arguments": call["arguments"], "result": None,
                          "success": False, "error": err,
                          "execution_time_ms": int(
                              (self._clock() - start) * 1000)}
                self.call_history.append(result)
                return result
        try:
            value = fn["call"](call["arguments"])
            result = {"function_name": name,
                      "arguments": call["arguments"], "result": value,
                      "success": True, "error": None,
                      "execution_time_ms": int(
                          (self._clock() - start) * 1000)}
        except Exception as e:                       # noqa: BLE001
            result = {"function_name": name,
                      "arguments": call["arguments"], "result": None,
                      "success": False, "error": str(e),
                      "execution_time_ms": int(
                          (self._clock() - start) * 1000)}
        self.call_history.append(result)
        return result

    def call_functions(self, calls: list[dict]) -> list[dict]:
        if len(calls) > self.max_calls_per_query:
            raise ValueError(
                f"Too many function calls requested: {len(calls)} "
                f"(max: {self.max_calls_per_query})")
        return [self.call_function(c) for c in calls]

    def clear_history(self):
        self.call_history.clear()

    def get_statistics(self) -> dict:
        total = len(self.call_history)
        ok = sum(1 for r in self.call_history if r["success"])
        total_ms = sum(r["execution_time_ms"] for r in self.call_history)
        usage: dict[str, int] = {}
        for r in self.call_history:
            usage[r["function_name"]] = usage.get(
                r["function_name"], 0) + 1
        return {"total_calls": total, "successful_calls": ok,
                "failed_calls": total - ok,
                "total_execution_time_ms": total_ms,
                "average_execution_time_ms": (total_ms // total
                                              if total else 0),
                "function_usage": usage}


# ------------------------------------------------------------- agent --

def extract_entity_names_from_query(query: str,
                                    entities: list[dict]) -> list[str]:
    """``agent.rs:167-203`` — 1- then 2-word windows, first containing
    entity (sorted-name iteration, pinned), first quoted span, sorted +
    deduped."""
    words = query.split()
    ordered = sorted(entities, key=lambda e: e["name"])
    found: list[str] = []
    windows = [[w] for w in words] + \
              [words[i:i + 2] for i in range(len(words) - 1)]
    for window in windows:
        potential = " ".join(window).lower()
        for entity in ordered:
            if potential in entity["name"].lower():
                found.append(entity["name"])
                break
    start = query.find('"')
    if start != -1:
        end = query[start + 1:].find('"')
        if end != -1:
            found.append(query[start + 1:start + 1 + end])
    return sorted(set(found))


def generate_query_plan(query: str, entities: list[dict]) -> dict:
    """``agent.rs:115-163`` + the four planners (``:206-298``)."""
    ql = query.lower()
    potential = extract_entity_names_from_query(query, entities)
    if ("relationship" in ql or "connect" in ql or "relation" in ql
            or "between" in ql):
        strategy = "relationship_exploration"
    elif ("context" in ql or "detail" in ql or "about" in ql
          or "information" in ql):
        strategy = "contextual_analysis"
    elif potential:
        strategy = "entity_search"
    else:
        strategy = "adaptive"

    calls: list[dict] = []
    if strategy == "entity_search":
        calls = [{"name": "graph_search",
                  "arguments": {"entity_name": e, "limit": 5}}
                 for e in potential]
    elif strategy == "relationship_exploration":
        calls = [{"name": "graph_search",
                  "arguments": {"entity_name": e, "limit": 3}}
                 for e in potential]
        if len(potential) >= 2:
            calls.append({"name": "relationship_traverse",
                          "arguments": {"source_entity": potential[0],
                                        "target_entity": potential[1],
                                        "max_hops": 3}})
    elif strategy == "contextual_analysis":
        calls = [{"name": "graph_search",
                  "arguments": {"entity_name": e, "limit": 3}}
                 for e in potential]
    else:
        if not potential:
            key_terms = [w for w in query.split()
                         if len(w) > 3 and w[:1].isupper()]
            calls = [{"name": "graph_search",
                      "arguments": {"entity_name": t, "limit": 5}}
                     for t in key_terms[:3]]
        else:
            calls = [{"name": "graph_search",
                      "arguments": {"entity_name": e, "limit": 5}}
                     for e in potential]
    return {"strategy": strategy, "function_calls": calls,
            "expected_outcomes": ["entities", "relationships"],
            "confidence": 0.8}


def synthesize_answer(query: str, function_results: list[dict]) -> str:
    """``agent.rs:300-383``."""
    if not function_results:
        return "No relevant information found in the knowledge graph."
    parts: list[str] = []
    for result in function_results:
        if not result["success"]:
            continue
        name = result["function_name"]
        value = result["result"] or {}
        if name == "graph_search":
            entities = value.get("entities")
            if isinstance(entities, list) and entities:
                parts.append(
                    f"Found {len(entities)} relevant entities: "
                    + ", ".join(e.get("name", "Unknown")
                                for e in entities))
        elif name == "entity_expand":
            rels = value.get("relationships")
            if isinstance(rels, list) and rels:
                parts.append(
                    f"Found {len(rels)} relationships for the entity")
        elif name == "relationship_traverse":
            paths = value.get("paths")
            if isinstance(paths, list):
                if paths:
                    parts.append(f"Found {len(paths)} connection paths "
                                 "between the entities")
                else:
                    parts.append("No direct connection found between "
                                 "the entities")
        elif name == "get_entity_context":
            chunks = value.get("context_chunks")
            if isinstance(chunks, list) and chunks:
                parts.append(f"Found {len(chunks)} text contexts "
                             "mentioning the entity")
    if not parts:
        return ("The query was processed but no specific information "
                "was found.")
    return f'Query: "{query}"\n\nResults:\n' + "\n".join(parts)


class GraphRAGAgent:
    """``agent.rs:34-414``."""

    def __init__(self, function_caller: FunctionCaller | None = None):
        self.function_caller = (function_caller if function_caller
                                is not None else FunctionCaller())
        self.query_history: list[dict] = []
        self.max_iterations = 5

    def process_query(self, query: str, graph: dict) -> dict:
        plan = generate_query_plan(query, graph["entities"])
        results = self.function_caller.call_functions(
            plan["function_calls"])
        answer = synthesize_answer(query, results)
        session = {"query": query, "plan": plan,
                   "function_results": results, "answer": answer,
                   "success": True}
        self.query_history.append(session)
        return session

    def get_statistics(self) -> dict:
        return self.function_caller.get_statistics()


# ---------------------------------------------------- tool registry --

SYSTEM_PROMPT = """You are a GraphRAG assistant that can interact with a knowledge graph database through function calls.

Available functions:
1. graph_search: Search for entities by name or partial name match
2. entity_expand: Get all relationships and connected entities for a specific entity
3. relationship_traverse: Find paths between two entities in the graph
4. get_entity_context: Get text chunks where an entity appears for detailed context
5. infer_relationships: Infer implicit relationships based on context patterns and co-occurrence

Guidelines:
- Use function calls to gather information from the knowledge graph before answering
- Start with graph_search to find relevant entities
- Use entity_expand to understand explicit relationships around key entities
- Use infer_relationships to find implicit relationships (friends, enemies, etc.)
- Use relationship_traverse to find connections between entities
- Use get_entity_context to get detailed textual information
- Synthesize information from multiple function calls for comprehensive answers
- Distinguish between explicit (directly stated) and implicit (inferred) relationships
- If no relevant information is found, state that clearly

Remember to make strategic function calls based on the user's question type:
- For entity information: graph_search → entity_expand → get_entity_context
- For explicit relationships: graph_search → relationship_traverse
- For implicit relationships: graph_search → infer_relationships → get_entity_context
- For friendship queries: graph_search → infer_relationships (relation_type: "FRIEND")
- For detailed analysis: graph_search → entity_expand → infer_relationships → get_entity_context

Always explain your reasoning and cite the function call results in your answers."""


def get_openai_function_definitions(caller: FunctionCaller) -> list[dict]:
    return [{"type": "function",
             "function": {"name": d["name"],
                          "description": d["description"],
                          "parameters": d["parameters"]}}
            for d in caller.get_function_definitions()]


def parse_openai_function_call(response: dict) -> list[dict]:
    """``tools.rs:56-98`` — legacy function_call + tool_calls array."""
    calls = []
    fc = response.get("function_call")
    if isinstance(fc, dict):
        name, args = fc.get("name"), fc.get("arguments")
        if isinstance(name, str) and isinstance(args, str):
            calls.append({"name": name, "arguments": json.loads(args)})
    tcs = response.get("tool_calls")
    if isinstance(tcs, list):
        for tc in tcs:
            fn = tc.get("function")
            if isinstance(fn, dict):
                name, args = fn.get("name"), fn.get("arguments")
                if isinstance(name, str) and isinstance(args, str):
                    calls.append({"name": name,
                                  "arguments": json.loads(args)})
    return calls


def format_function_results_for_llm(results: list[dict]) -> str:
    """``tools.rs:101-135``."""
    if not results:
        return "No function calls were made."
    out = "Function call results:\n\n"
    for i, r in enumerate(results):
        out += f"{i + 1}. Function: {r['function_name']}\n"
        if r["success"]:
            out += "   Status: Success\n"
            out += "   Result: " + json.dumps(r["result"], indent=2) \
                + "\n"
        else:
            out += "   Status: Failed\n"
            if r["error"]:
                out += f"   Error: {r['error']}\n"
        out += f"   Execution time: {r['execution_time_ms']}ms\n\n"
    return out


def build_function_calling_prompt(user_query: str,
                                  caller: FunctionCaller,
                                  previous_results: list[dict]) -> str:
    """``tools.rs:175-211``."""
    prompt = SYSTEM_PROMPT + "\n\n"
    defs = caller.get_function_definitions()
    if defs:
        prompt += "Available functions:\n"
        for d in defs:
            prompt += f"- {d['name']}: {d['description']}\n"
        prompt += "\n"
    if previous_results:
        prompt += "Previous function call results:\n"
        prompt += format_function_results_for_llm(previous_results)
        prompt += "\n"
    prompt += f"User query: {user_query}\n\n"
    prompt += ("Please analyze the query and make appropriate function "
               "calls to gather information from the knowledge graph, "
               "then provide a comprehensive answer based on the "
               "results.")
    return prompt


def build_synthesis_prompt(user_query: str, results: list[dict]) -> str:
    """``tools.rs:214-233``."""
    prompt = ("Based on the following function call results, provide a "
              "comprehensive answer to the user's query.\n\n")
    prompt += f"User query: {user_query}\n\n"
    prompt += format_function_results_for_llm(results)
    prompt += ("\nPlease synthesize this information into a clear, "
               "comprehensive answer that directly addresses the "
               "user's question. ")
    prompt += ("Include specific details from the function results and "
               "explain any relationships or connections found. ")
    prompt += ("If insufficient information was found, state that "
               "clearly and suggest what additional information might "
               "be helpful.")
    return prompt


# --------------------------------------------------- query analyzer --

def analyze_query(query: str) -> dict:
    """``tools.rs:241-278``."""
    ql = query.lower()
    is_entity = ("what is" in ql or "who is" in ql
                 or "tell me about" in ql)
    is_relationship = ("relationship" in ql or "connect" in ql
                       or "relation" in ql or "between" in ql
                       or "how are" in ql or "associated" in ql)
    is_context = ("context" in ql or "detail" in ql
                  or "information" in ql or "describe" in ql
                  or "explain" in ql)
    requires_search = "list all" not in ql and "show all" not in ql
    complexity = ("high" if is_relationship
                  else ("medium" if is_context else "low"))
    return {"is_entity_focused": is_entity,
            "is_relationship_focused": is_relationship,
            "is_context_focused": is_context,
            "requires_search": requires_search,
            "complexity": complexity}


def extract_quoted_entities(query: str) -> list[str]:
    """``tools.rs:280-303`` — ' and " are interchangeable toggles."""
    entities = []
    in_quotes = False
    current = ""
    for ch in query:
        if ch in "\"'":
            if in_quotes and current:
                entities.append(current.strip())
                current = ""
            in_quotes = not in_quotes
        elif in_quotes:
            current += ch
    return entities


def extract_capitalized_terms(query: str) -> list[str]:
    """``tools.rs:305-321``."""
    out = []
    for word in query.split():
        if (len(word) > 2 and word[:1].isupper()
                and not all(c.isupper() for c in word)):
            trimmed = word.strip(
                "".join(c for c in word if not c.isalnum()))
            if trimmed:
                out.append(trimmed)
    return out


# ----------------------------------------------- enhanced registry --

def enhanced_graph_search(args: dict, graph: dict) -> dict:
    """``enhanced_registry.rs:175-218`` — substring entity search."""
    query = args["query"]
    limit = args.get("limit", 10)
    results = []
    for e in graph["entities"]:
        if query.lower() in e["name"].lower():
            results.append({"entity_id": e["entity_id"],
                            "entity_name": e["name"],
                            "entity_type": e.get("type", ""),
                            "confidence": e.get("confidence", 0.0),
                            "mentions": e.get("mention_count", 0)})
            if len(results) == limit:
                break
    return {"results": results, "total_found": len(results),
            "query": query}


def enhanced_entity_expand(args: dict, graph: dict) -> dict:
    """``:244-316`` — NOTE the depth ≤ 1 path returns an EMPTY
    expanded_entities list (the loop only fills it when depth > 1 —
    quirk, pinned)."""
    entity_id = args["entity_id"]
    depth = args.get("depth", 1)
    by_id = {e["entity_id"]: e for e in graph["entities"]}
    entity = by_id.get(entity_id)
    if entity is None:
        raise ValueError(f"Entity not found: {entity_id}")
    rels = [r for r in graph["relationships"]
            if r["source"] == entity_id or r["target"] == entity_id][:20]
    expanded = []
    for r in rels:
        if depth > 1:
            other = r["target"] if r["source"] == entity_id \
                else r["source"]
            oe = by_id.get(other)
            if oe is not None:
                expanded.append({"entity_id": oe["entity_id"],
                                 "entity_name": oe["name"],
                                 "relationship": r.get("relation_type",
                                                       ""),
                                 "confidence": oe.get("confidence",
                                                      0.0)})
    return {"entity": {"id": entity_id, "name": entity["name"],
                       "type": entity.get("type", "")},
            "relationships": len(rels),
            "expanded_entities": expanded,
            "expansion_depth": depth}


def context_analysis(args: dict) -> dict:
    """``:408-443``."""
    query = args["query"]
    wc = len(query.split())
    ql = query.lower()
    has_q = ("who" in ql or "what" in ql or "where" in ql
             or "when" in ql or "how" in ql)
    complexity = "high" if wc > 10 else ("medium" if wc > 5 else "low")
    return {"query": query, "word_count": wc, "complexity": complexity,
            "has_question_words": has_q,
            "recommended_strategy": ("entity_search" if has_q
                                     else "vector_search")}


def summary_generation(args: dict, graph: dict) -> dict:
    """``:472-512`` — name (type) join, max_length−3 truncation."""
    ids = args["entity_ids"]
    max_length = args.get("max_length", 200)
    by_id = {e["entity_id"]: e for e in graph["entities"]}
    parts = []
    for eid in ids:
        e = by_id.get(eid)
        if e is not None:
            parts.append(f"{e['name']} ({e.get('type', '')})")
    summary = ", ".join(parts)
    if len(summary) > max_length:
        summary = summary[:max_length - 3] + "..."
    return {"summary": summary, "entity_count": len(ids),
            "length": len(summary)}


class EnhancedToolRegistry:
    """``enhanced_registry.rs:10-172``."""

    def __init__(self):
        self.function_caller = FunctionCaller()
        self.function_categories: dict[str, list[str]] = {}
        self.usage_statistics: dict[str, int] = {}

    def register_function_in_category(self, name: str, definition: dict,
                                      call_fn, category: str):
        self.function_caller.register_function(name, definition, call_fn)
        self.function_categories.setdefault(category, []).append(name)
        self.usage_statistics[name] = 0

    def register_default_functions(self, graph: dict):
        self.register_function_in_category(
            "enhanced_graph_search",
            {"name": "enhanced_graph_search",
             "description": "Search the knowledge graph for entities "
                            "with enhanced context"},
            lambda a: enhanced_graph_search(a, graph), "search")
        self.register_function_in_category(
            "enhanced_entity_expand",
            {"name": "enhanced_entity_expand",
             "description": "Expand an entity with its relationships "
                            "and connected entities"},
            lambda a: enhanced_entity_expand(a, graph), "entity")
        self.register_function_in_category(
            "enhanced_relationship_analysis",
            {"name": "enhanced_relationship_analysis",
             "description": "Analyze relationships between two "
                            "entities"},
            lambda a: a, "relationship")
        self.register_function_in_category(
            "context_analysis",
            {"name": "context_analysis",
             "description": "Analyze query context and recommend "
                            "search strategy"},
            context_analysis, "analysis")
        self.register_function_in_category(
            "summary_generation",
            {"name": "summary_generation",
             "description": "Generate a summary from a list of "
                            "entities"},
            lambda a: summary_generation(a, graph), "generation")

    def get_functions_by_category(self, category: str) -> list[str]:
        return list(self.function_categories.get(category, []))

    def get_categories(self) -> list[str]:
        return sorted(self.function_categories)

    def record_function_usage(self, name: str):
        self.usage_statistics[name] = \
            self.usage_statistics.get(name, 0) + 1

    def get_recommended_functions(self, query_type: str) -> list[str]:
        qt = query_type.lower()
        if qt in ("entity", "search", "relationship", "analysis"):
            return self.get_functions_by_category(qt)
        ranked = sorted(self.usage_statistics.items(),
                        key=lambda kv: (-kv[1], kv[0]))
        return [name for name, _ in ranked[:5]]


__all__ = ["DEFAULT_FUNCTION_DEFINITIONS", "FunctionCaller",
           "extract_entity_names_from_query", "generate_query_plan",
           "synthesize_answer", "GraphRAGAgent", "SYSTEM_PROMPT",
           "get_openai_function_definitions",
           "parse_openai_function_call",
           "format_function_results_for_llm",
           "build_function_calling_prompt", "build_synthesis_prompt",
           "analyze_query", "extract_quoted_entities",
           "extract_capitalized_terms", "enhanced_graph_search",
           "enhanced_entity_expand", "context_analysis",
           "summary_generation", "EnhancedToolRegistry"]
