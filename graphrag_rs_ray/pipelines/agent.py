"""Function-calling agent dataflows (``function_calling/agent.rs`` +
``tools.rs``): a table of user queries flows through stateless
plan-generation / query-analysis stages, and through the full agent
loop (plan → tool execution → answer synthesis) with the knowledge
graph broadcast once (``ray.put`` — the post-canonicalization SMALL
side, same shape as ``pipelines/tools.py``)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.agent import (
    FunctionCaller,
    GraphRAGAgent,
    analyze_query,
    generate_query_plan,
)


def synthesize_agent_queries(names: list[str]) -> pa.Table:
    """Deterministic query corpus exercising every strategy branch:
    relationship (connected/between), contextual (details/about),
    entity search (bare name + quoted), adaptive with capitalized
    fallback terms, and the zero-call adaptive plan."""
    if not names:
        names = ["Placeholder"]

    def nm(i):
        return names[i % len(names)]

    queries = []
    for i in range(4):
        a, b = nm(2 * i), nm(2 * i + 1)
        queries.extend([
            f"How is {a} connected to {b}",
            f"What is the relationship between {a} and {b}",
            f"Give me more details regarding {a}",
            f"Tell me about {a}",
            f"{a} timeline and milestones",
            f'Find "{b}" mentions please',
            "Zzyzx Qwxyvern Flibbertigib plan",
            "why though",
        ])
    return pa.table({
        "query_id": pa.array([f"aq{i:02d}" for i in range(len(queries))],
                             pa.string()),
        "query": pa.array(queries, pa.string())})


def agent_plan_stage(queries_ds, graph: dict):
    """Per-query plan rows: one 'plan' header row (call_idx −1) plus a
    row per planned call (``agent.rs:115-298``)."""
    import ray
    ents_ref = ray.put(graph["entities"])

    def run(t: pa.Table) -> pa.Table:
        entities = ray.get(ents_ref)
        cols = {k: [] for k in (
            "query_id", "strategy", "call_idx", "function",
            "entity_name", "source_entity", "target_entity", "arg_limit",
            "max_hops", "n_entities", "confidence")}
        for qid, query in zip(t.column("query_id").to_pylist(),
                              t.column("query").to_pylist()):
            plan = generate_query_plan(query, entities)
            n_ent = sum(1 for c in plan["function_calls"]
                        if c["name"] == "graph_search")
            # -1 sentinels instead of NULLs (driver hashes exact values;
            # NaN-vs-NaN comparisons are unreliable across engines)
            rows = [(-1, "plan", "", "", "", -1, -1)]
            for idx, call in enumerate(plan["function_calls"]):
                a = call["arguments"]
                if call["name"] == "graph_search":
                    rows.append((idx, "graph_search",
                                 a["entity_name"], "", "", a["limit"],
                                 -1))
                else:
                    rows.append((idx, "relationship_traverse", "",
                                 a["source_entity"], a["target_entity"],
                                 -1, a["max_hops"]))
            for (idx, fn, en, se, te, lim, mh) in rows:
                cols["query_id"].append(qid)
                cols["strategy"].append(plan["strategy"])
                cols["call_idx"].append(idx)
                cols["function"].append(fn)
                cols["entity_name"].append(en)
                cols["source_entity"].append(se)
                cols["target_entity"].append(te)
                cols["arg_limit"].append(lim)
                cols["max_hops"].append(mh)
                cols["n_entities"].append(n_ent)
                cols["confidence"].append(plan["confidence"])
        return pa.table({
            "query_id": pa.array(cols["query_id"], pa.string()),
            "strategy": pa.array(cols["strategy"], pa.string()),
            "call_idx": pa.array(cols["call_idx"], pa.int64()),
            "function": pa.array(cols["function"], pa.string()),
            "entity_name": pa.array(cols["entity_name"], pa.string()),
            "source_entity": pa.array(cols["source_entity"],
                                      pa.string()),
            "target_entity": pa.array(cols["target_entity"],
                                      pa.string()),
            "arg_limit": pa.array(cols["arg_limit"], pa.int64()),
            "max_hops": pa.array(cols["max_hops"], pa.int64()),
            "n_entities": pa.array(cols["n_entities"], pa.int64()),
            "confidence": pa.array(cols["confidence"], pa.float64())})

    return queries_ds.map_batches(run, batch_format="pyarrow")


def query_analysis_stage(queries_ds):
    """QueryAnalyzer flags per query (``tools.rs:241-278``)."""

    def run(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in (
            "query_id", "is_entity_focused", "is_relationship_focused",
            "is_context_focused", "requires_search", "complexity")}
        for qid, query in zip(t.column("query_id").to_pylist(),
                              t.column("query").to_pylist()):
            a = analyze_query(query)
            cols["query_id"].append(qid)
            cols["is_entity_focused"].append(int(a["is_entity_focused"]))
            cols["is_relationship_focused"].append(
                int(a["is_relationship_focused"]))
            cols["is_context_focused"].append(
                int(a["is_context_focused"]))
            cols["requires_search"].append(int(a["requires_search"]))
            cols["complexity"].append(a["complexity"])
        return pa.table({
            "query_id": pa.array(cols["query_id"], pa.string()),
            "is_entity_focused": pa.array(cols["is_entity_focused"],
                                          pa.int64()),
            "is_relationship_focused": pa.array(
                cols["is_relationship_focused"], pa.int64()),
            "is_context_focused": pa.array(cols["is_context_focused"],
                                           pa.int64()),
            "requires_search": pa.array(cols["requires_search"],
                                        pa.int64()),
            "complexity": pa.array(cols["complexity"], pa.string())})

    return queries_ds.map_batches(run, batch_format="pyarrow")


def agent_session_stage(queries_ds, graph: dict):
    """Full agent loop per query (plan → tool execution → synthesized
    answer), graph broadcast once."""
    import ray
    graph_ref = ray.put(graph)

    def run(t: pa.Table) -> pa.Table:
        g = ray.get(graph_ref)
        cols = {k: [] for k in ("query_id", "strategy", "n_calls",
                                "n_success", "n_failed", "answer")}
        for qid, query in zip(t.column("query_id").to_pylist(),
                              t.column("query").to_pylist()):
            caller = FunctionCaller()
            caller.register_defaults(g)
            agent = GraphRAGAgent(caller)
            session = agent.process_query(query, g)
            results = session["function_results"]
            cols["query_id"].append(qid)
            cols["strategy"].append(session["plan"]["strategy"])
            cols["n_calls"].append(len(results))
            cols["n_success"].append(
                sum(1 for r in results if r["success"]))
            cols["n_failed"].append(
                sum(1 for r in results if not r["success"]))
            cols["answer"].append(session["answer"])
        return pa.table({
            "query_id": pa.array(cols["query_id"], pa.string()),
            "strategy": pa.array(cols["strategy"], pa.string()),
            "n_calls": pa.array(cols["n_calls"], pa.int64()),
            "n_success": pa.array(cols["n_success"], pa.int64()),
            "n_failed": pa.array(cols["n_failed"], pa.int64()),
            "answer": pa.array(cols["answer"], pa.string())})

    return queries_ds.map_batches(run, batch_format="pyarrow")


__all__ = ["synthesize_agent_queries", "agent_plan_stage",
           "query_analysis_stage", "agent_session_stage"]
