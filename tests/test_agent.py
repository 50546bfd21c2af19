"""Function-calling agent layer vs the reference's own tests
(``function_calling/{agent,tools,enhanced_registry}.rs`` test mods)."""

import pytest

from graphrag_rs_ray.functions.agent import (
    EnhancedToolRegistry,
    FunctionCaller,
    GraphRAGAgent,
    analyze_query,
    build_synthesis_prompt,
    context_analysis,
    enhanced_entity_expand,
    enhanced_graph_search,
    extract_capitalized_terms,
    extract_entity_names_from_query,
    extract_quoted_entities,
    format_function_results_for_llm,
    generate_query_plan,
    parse_openai_function_call,
    summary_generation,
    synthesize_answer,
    SYSTEM_PROMPT,
)


def _graph():
    entities = [
        {"entity_id": "e1", "name": "Entity Name", "type": "person",
         "conf": 0.9, "confidence": 0.9, "mention_count": 3},
        {"entity_id": "e2", "name": "Second Entity", "type": "person",
         "conf": 0.8, "confidence": 0.8, "mention_count": 2},
        {"entity_id": "e3", "name": "Acme Corp", "type": "organization",
         "conf": 0.7, "confidence": 0.7, "mention_count": 1},
    ]
    rels = [{"source": "e1", "target": "e2", "type": "knows",
             "relation_type": "knows", "conf": 0.9}]
    chunks = [{"chunk_id": "c1", "doc_id": "d1",
               "entity_ids": ["e1", "e2"], "entity_set": {"e1", "e2"},
               "text": "Entity Name met Second Entity."}]
    return {"entities": entities, "rels": rels,
            "relationships": rels,
            "by_id": {e["entity_id"]: e for e in entities},
            "chunks": chunks,
            "mentions_by_entity": {}}


# ---------------------------------------------------------- agent --

def test_entity_extraction_from_query():
    # agent.rs:436-453 — windowed containment against graph entities
    g = _graph()
    found = extract_entity_names_from_query(
        "tell me about Entity Name", g["entities"])
    assert "Entity Name" in found
    # quoted span is appended
    found2 = extract_entity_names_from_query(
        'find "Zorblatt" now', g["entities"])
    assert "Zorblatt" in found2


def test_query_plan_strategies():
    # agent.rs:455-469
    g = _graph()
    rel = generate_query_plan(
        "How is Entity connected to Second", g["entities"])
    assert rel["strategy"] == "relationship_exploration"
    assert rel["function_calls"][-1]["name"] == "relationship_traverse"
    assert rel["function_calls"][0]["arguments"]["limit"] == 3
    ctx = generate_query_plan("details about Entity", g["entities"])
    assert ctx["strategy"] == "contextual_analysis"
    ent = generate_query_plan("Entity Name timeline", g["entities"])
    assert ent["strategy"] == "entity_search"
    assert ent["function_calls"][0]["arguments"]["limit"] == 5
    ad = generate_query_plan("Zzyzx Qwfp whatever", g["entities"])
    assert ad["strategy"] == "adaptive"
    assert [c["arguments"]["entity_name"]
            for c in ad["function_calls"]] == ["Zzyzx", "Qwfp"]
    assert ad["confidence"] == 0.8
    assert ad["expected_outcomes"] == ["entities", "relationships"]


def test_agent_process_query_and_stats():
    g = _graph()
    caller = FunctionCaller()
    caller.register_defaults(g)
    agent = GraphRAGAgent(caller)
    session = agent.process_query("Entity Name timeline", g)
    assert session["success"]
    assert session["answer"].startswith('Query: "Entity Name timeline"')
    assert "relevant entities" in session["answer"]
    stats = agent.get_statistics()
    assert stats["total_calls"] == len(session["function_results"])
    assert stats["failed_calls"] == 0


def test_function_caller_validation_failure_row():
    g = _graph()
    caller = FunctionCaller()
    caller.register_defaults(g)
    r = caller.call_function({"name": "graph_search",
                              "arguments": {"limit": 5}})
    assert not r["success"]
    assert "entity_name" in r["error"]
    with pytest.raises(KeyError):
        caller.call_function({"name": "nope", "arguments": {}})
    caller.max_calls_per_query = 1
    with pytest.raises(ValueError, match="Too many function calls"):
        caller.call_functions([{"name": "graph_search",
                                "arguments": {"entity_name": "x"}}] * 2)


def test_synthesize_answer_branches():
    empty = synthesize_answer("q", [])
    assert empty == ("No relevant information found in the knowledge "
                     "graph.")
    results = [
        {"function_name": "graph_search", "success": True,
         "result": {"entities": [{"name": "A"}, {"name": "B"}]}},
        {"function_name": "relationship_traverse", "success": True,
         "result": {"paths": []}},
        {"function_name": "entity_expand", "success": False,
         "result": None},
    ]
    out = synthesize_answer("my q", results)
    assert "Found 2 relevant entities: A, B" in out
    assert "No direct connection found" in out
    no_parts = synthesize_answer("q", [{"function_name": "graph_search",
                                        "success": True,
                                        "result": {"entities": []}}])
    assert no_parts == ("The query was processed but no specific "
                        "information was found.")


# ----------------------------------------------------------- tools --

def test_query_analysis():
    # tools.rs:345-351
    a = analyze_query("What is the relationship between X and Y?")
    assert a["is_relationship_focused"]
    assert a["complexity"] == "high"
    b = analyze_query("tell me about X")
    assert b["is_entity_focused"] and b["complexity"] == "low"
    c = analyze_query("list all entities")
    assert not c["requires_search"]


def test_extract_quoted_entities():
    # tools.rs:353-360
    out = extract_quoted_entities('find "John Smith" and \'Acme\' now')
    assert out == ["John Smith", "Acme"]


def test_extract_capitalized_terms():
    # tools.rs:362-369 — len > 2, first upper, not ALL-caps, trimmed
    out = extract_capitalized_terms("Find John and NASA with Smith's.")
    assert "John" in out
    assert "NASA" not in out
    assert any(t.startswith("Smith") for t in out)


def test_system_prompt_and_formatting():
    # tools.rs:371-376
    assert "graph_search" in SYSTEM_PROMPT
    assert SYSTEM_PROMPT.startswith("You are a GraphRAG assistant")
    assert format_function_results_for_llm([]) == \
        "No function calls were made."
    fmt = format_function_results_for_llm([
        {"function_name": "graph_search", "success": True,
         "result": {"n": 1}, "error": None, "execution_time_ms": 3}])
    assert "1. Function: graph_search" in fmt
    assert "Status: Success" in fmt and "Execution time: 3ms" in fmt
    syn = build_synthesis_prompt("q?", [])
    assert syn.startswith("Based on the following function call")


def test_parse_openai_function_call():
    calls = parse_openai_function_call({
        "function_call": {"name": "graph_search",
                          "arguments": '{"entity_name": "X"}'},
        "tool_calls": [{"function": {
            "name": "entity_expand",
            "arguments": '{"entity_id": "e1"}'}}]})
    assert [c["name"] for c in calls] == ["graph_search",
                                          "entity_expand"]
    assert calls[0]["arguments"] == {"entity_name": "X"}


# ------------------------------------------------ enhanced registry --

def test_enhanced_registry_categories_and_usage():
    # enhanced_registry.rs:550-578
    g = _graph()
    reg = EnhancedToolRegistry()
    reg.register_default_functions(g)
    assert set(reg.get_categories()) == {
        "search", "entity", "relationship", "analysis", "generation"}
    assert reg.get_functions_by_category("search") == [
        "enhanced_graph_search"]
    reg.record_function_usage("enhanced_graph_search")
    reg.record_function_usage("enhanced_graph_search")
    reg.record_function_usage("context_analysis")
    assert reg.usage_statistics["enhanced_graph_search"] == 2
    rec = reg.get_recommended_functions("unknown")
    assert rec[0] == "enhanced_graph_search"
    assert reg.get_recommended_functions("entity") == [
        "enhanced_entity_expand"]


def test_enhanced_functions():
    g = _graph()
    s = enhanced_graph_search({"query": "entity", "limit": 10}, g)
    assert s["total_found"] == 2            # Entity Name, Second Entity
    e1 = enhanced_entity_expand({"entity_id": "e1", "depth": 1}, g)
    assert e1["relationships"] == 1
    assert e1["expanded_entities"] == []    # depth ≤ 1 quirk
    e2 = enhanced_entity_expand({"entity_id": "e1", "depth": 2}, g)
    assert e2["expanded_entities"][0]["entity_name"] == "Second Entity"
    with pytest.raises(ValueError, match="Entity not found"):
        enhanced_entity_expand({"entity_id": "zz"}, g)
    c = context_analysis({"query": "what is this thing called here "
                                   "today my friend and neighbor"})
    assert c["complexity"] == "high" and c["has_question_words"]
    summ = summary_generation({"entity_ids": ["e1", "e3"],
                               "max_length": 200}, g)
    assert summ["summary"] == "Entity Name (person), Acme Corp " \
                              "(organization)"
    tr = summary_generation({"entity_ids": ["e1", "e3"],
                             "max_length": 10}, g)
    assert tr["summary"].endswith("...") and len(tr["summary"]) == 10
