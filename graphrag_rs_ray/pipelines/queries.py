"""ROGRAG batch query processing as Ray Data dataflows.

The reference processes one query at a time (``rograg/processor.rs``);
the engine-side reframing is a *table of queries* flowing through
stateless analysis stages — intent classification, hybrid decomposition,
logic-form parsing, validation — plus a fuzzy-matching stage that scores
queries against the (small, broadcast) canonical entity table.

Scale shape: every analysis stage is a stateless ``map_batches`` over
the query table (compiled regexes are module-level, built once per
worker process at import).  Fuzzy matching broadcasts the canonical
entity list + its token inverted index via ``ray.put`` (entities are the
post-canonicalization SMALL side — millions of rows at web scale, not
the corpus); the prune (edit distance only when the word-overlap terms
can reach the threshold) keeps per-query work proportional to the
token-index hit list, and the documented scale path beyond broadcast is
a token-bucketed join of queries × entities on shared tokens.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.query_intel import analyze_routing, rewrite_query
from ..functions.rograg import (
    FuzzyMatchConfig,
    classify_intent,
    decompose_hybrid,
    fuzzy_match_one,
    parse_logic_form,
    validate_query,
)

# ------------------------------------------------------------ synthesis --


def synthesize_query_table(names: list[str], n_tuples: int = 12) -> pa.Table:
    """Deterministic query corpus over entity names drawn from the KG
    (no external data): templates chosen to exercise every rule path —
    each intent class, both semantic decomposition patterns (plus their
    case-sensitivity contrast), syntactic clause splits, every logic-form
    pattern, exact/partial/type fuzzy matches, safety/format/length
    validation issues."""
    if not names:
        names = ["Placeholder Entity"]

    def nm(i: int) -> str:
        return names[i % len(names)]

    queries: list[str] = []
    for i in range(n_tuples):
        a, b, c, d = nm(i), nm(i + 1), nm(i + 2), nm(i + 3)
        queries.extend([
            f"what is {a}?",
            f"who is {a} and {b}?",
            f"Who is {a} and {b}?",
            f"how is {a} related to {b}?",
            f"How is {a} connected to {b}?",
            f"when did {a} happen?",
            f"why did {a} cause {b}?",
            f"Compare {a} and {b}",
            f"tell me about {a}",
            f"summarize {a} and {b}",
            f"define the concept of {a}",
            f"{a}",
            f"the {a}",
            f"which person is {a}?",
            f"what is {a}, and how is {b} connected to {c}; also describe {d}",
            f"describe {a}; furthermore explain the meaning of {b}",
            f"is there a connection between {a} and {b}?",
            f"what is the secret of {a}?",
            f"how much harm did {a} cause?",
            f'"{a}" versus "{b}"',
            f"find the important person and company near {a}",
        ])
    # validation edge cases (once each) + an over-long query (>1000 bytes)
    queries.append("???")
    queries.append("   ")
    long_q = "tell me about " + " and ".join(nm(j) for j in range(80))
    queries.append(long_q)
    return pa.table({
        "query_id": pa.array(range(len(queries)), pa.int64()),
        "query": pa.array(queries, pa.string()),
    })


# -------------------------------------------------------- analysis stages --


def intent_stage(t: pa.Table) -> pa.Table:
    qids = t.column("query_id")
    rows = [classify_intent(q) for q in t.column("query").to_pylist()]
    return pa.table({
        "query_id": qids,
        "primary_intent": pa.array([r["primary_intent"] for r in rows]),
        "confidence": pa.array([r["confidence"] for r in rows], pa.float64()),
        "should_refuse": pa.array([r["should_refuse"] for r in rows],
                                  pa.bool_()),
        "refusal_reason": pa.array([r["refusal_reason"] for r in rows]),
        "suggested_reformulation": pa.array(
            [r["suggested_reformulation"] for r in rows]),
        "complexity_score": pa.array([r["complexity_score"] for r in rows],
                                     pa.float64()),
        "secondary_intent_1": pa.array([r["secondary_intent_1"] for r in rows]),
        "secondary_score_1": pa.array([r["secondary_score_1"] for r in rows],
                                      pa.float64()),
        "secondary_intent_2": pa.array([r["secondary_intent_2"] for r in rows]),
        "secondary_score_2": pa.array([r["secondary_score_2"] for r in rows],
                                      pa.float64()),
    })


def decomposition_stage(t: pa.Table) -> pa.Table:
    out = {k: [] for k in ("query_id", "sub_idx", "sub_id", "text",
                           "query_type", "priority", "deps", "strategy",
                           "confidence", "n_subqueries")}
    for qid, q in zip(t.column("query_id").to_pylist(),
                      t.column("query").to_pylist()):
        res = decompose_hybrid(q)
        n = len(res["subqueries"])
        for idx, sub in enumerate(res["subqueries"]):
            out["query_id"].append(qid)
            out["sub_idx"].append(idx)
            out["sub_id"].append(sub["sub_id"])
            out["text"].append(sub["text"])
            out["query_type"].append(sub["query_type"])
            out["priority"].append(round(sub["priority"], 8))
            out["deps"].append(sub["deps"])
            out["strategy"].append(res["strategy"])
            out["confidence"].append(res["confidence"])
            out["n_subqueries"].append(n)
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "sub_idx": pa.array(out["sub_idx"], pa.int64()),
        "sub_id": pa.array(out["sub_id"], pa.string()),
        "text": pa.array(out["text"], pa.string()),
        "query_type": pa.array(out["query_type"], pa.string()),
        "priority": pa.array(out["priority"], pa.float64()),
        "deps": pa.array(out["deps"], pa.string()),
        "strategy": pa.array(out["strategy"], pa.string()),
        "confidence": pa.array(out["confidence"], pa.float64()),
        "n_subqueries": pa.array(out["n_subqueries"], pa.int64()),
    })


def logic_form_stage(t: pa.Table) -> pa.Table:
    out = {k: [] for k in ("query_id", "predicate", "query_type",
                           "confidence", "arg_idx", "value", "variable",
                           "arg_type")}
    for qid, q in zip(t.column("query_id").to_pylist(),
                      t.column("query").to_pylist()):
        res = parse_logic_form(q)
        if res is None:
            continue
        for idx, arg in enumerate(res["args"]):
            out["query_id"].append(qid)
            out["predicate"].append(res["predicate"])
            out["query_type"].append(res["query_type"])
            out["confidence"].append(res["confidence"])
            out["arg_idx"].append(idx)
            out["value"].append(arg["value"])
            out["variable"].append(arg["variable"])
            out["arg_type"].append(arg["arg_type"])
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "predicate": pa.array(out["predicate"], pa.string()),
        "query_type": pa.array(out["query_type"], pa.string()),
        "confidence": pa.array(out["confidence"], pa.float64()),
        "arg_idx": pa.array(out["arg_idx"], pa.int64()),
        "value": pa.array(out["value"], pa.string()),
        "variable": pa.array(out["variable"], pa.string()),
        "arg_type": pa.array(out["arg_type"], pa.string()),
    })


def validation_stage(t: pa.Table) -> pa.Table:
    rows = [validate_query(q) for q in t.column("query").to_pylist()]
    return pa.table({
        "query_id": t.column("query_id"),
        "is_valid": pa.array([r["is_valid"] for r in rows], pa.bool_()),
        "validation_score": pa.array([r["validation_score"] for r in rows],
                                     pa.float64()),
        "n_issues": pa.array([r["n_issues"] for r in rows], pa.int64()),
        "has_length_issue": pa.array([r["has_length_issue"] for r in rows],
                                     pa.bool_()),
        "has_safety_issue": pa.array([r["has_safety_issue"] for r in rows],
                                     pa.bool_()),
        "has_format_issue": pa.array([r["has_format_issue"] for r in rows],
                                     pa.bool_()),
    })


def routing_stage(t: pa.Table) -> pa.Table:
    rows = [analyze_routing(q) for q in t.column("query").to_pylist()]
    return pa.table({
        "query_id": t.column("query_id"),
        "complexity": pa.array([r["complexity"] for r in rows]),
        "suggested_level": pa.array([r["suggested_level"] for r in rows],
                                    pa.int64()),
        "keyword_score": pa.array([r["keyword_score"] for r in rows],
                                  pa.float64()),
        "length_score": pa.array([r["length_score"] for r in rows],
                                 pa.float64()),
        "entity_score": pa.array([r["entity_score"] for r in rows],
                                 pa.float64()),
        "total_score": pa.array([r["total_score"] for r in rows],
                                pa.float64()),
        "explanation": pa.array([r["explanation"] for r in rows]),
    })


def rewrite_stage(t: pa.Table) -> pa.Table:
    rows = [rewrite_query(q) for q in t.column("query").to_pylist()]
    return pa.table({
        "query_id": t.column("query_id"),
        "query_type": pa.array([r["query_type"] for r in rows]),
        "rewritten": pa.array([r["rewritten"] for r in rows]),
        "expanded_terms": pa.array([r["expanded_terms"] for r in rows]),
        "n_terms": pa.array([r["n_terms"] for r in rows], pa.int64()),
        "confidence": pa.array([r["confidence"] for r in rows],
                               pa.float64()),
    })


# ------------------------------------------- logic execution / processor --


def build_rograg_graph(entities_tbl: pa.Table,
                       triples_tbl: pa.Table) -> dict:
    """Combined broadcast side for the logic-form executor and the
    processor: entities sorted (name, id) asc with lowered fields,
    relationships pinned (source, type, target) asc (endpoints are
    entity IDs), plus the fuzzy-match adjacency."""
    ents = sorted(
        ({"entity_id": eid, "name": name, "type": typ,
          "name_lower": name.lower(), "type_lower": (typ or "").lower()}
         for eid, name, typ in zip(
             entities_tbl.column("entity_id").to_pylist(),
             entities_tbl.column("name").to_pylist(),
             entities_tbl.column("type").to_pylist())),
        key=lambda e: (e["name"], e["entity_id"]))
    by_id = {e["entity_id"]: e for e in ents}
    rels = sorted(
        ({"source": s, "target": o, "type": p, "conf": float(c)}
         for s, p, o, c in zip(triples_tbl.column("subj").to_pylist(),
                               triples_tbl.column("pred").to_pylist(),
                               triples_tbl.column("obj").to_pylist(),
                               triples_tbl.column("conf").to_pylist())
         if s in by_id and o in by_id),
        key=lambda r: (r["source"], r["type"], r["target"]))
    _, adjacency = build_entity_side(entities_tbl, triples_tbl)
    return {"entities": ents, "rels": rels, "by_id": by_id,
            "adjacency": adjacency}


def logic_bindings_stage(queries_ds, graph: dict):
    """Logic-form retrieval per query (``logic_form.rs:834-930``): one
    row per binding with the per-query answer and mean confidence;
    queries that fail to parse or bind produce no rows."""
    import ray

    from ..functions.rograg import retrieve_logic_form

    ref = ray.put(graph)

    def run(t: pa.Table) -> pa.Table:
        g = ray.get(ref)
        out = {k: [] for k in ("query_id", "predicate", "bind_idx",
                               "variable", "value", "entity_id",
                               "confidence", "answer",
                               "overall_confidence")}
        for qid, q in zip(t.column("query_id").to_pylist(),
                          t.column("query").to_pylist()):
            lr = retrieve_logic_form(q, g["entities"], g["rels"],
                                     g["by_id"])
            if lr is None:
                continue
            for i, b in enumerate(lr["bindings"]):
                out["query_id"].append(qid)
                out["predicate"].append(lr["predicate"])
                out["bind_idx"].append(i)
                out["variable"].append(b["variable"])
                out["value"].append(b["value"])
                out["entity_id"].append(b["entity_id"])
                out["confidence"].append(round(b["confidence"], 8))
                out["answer"].append(lr["answer"])
                out["overall_confidence"].append(lr["confidence"])
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "predicate": pa.array(out["predicate"], pa.string()),
            "bind_idx": pa.array(out["bind_idx"], pa.int64()),
            "variable": pa.array(out["variable"], pa.string()),
            "value": pa.array(out["value"], pa.string()),
            "entity_id": pa.array(out["entity_id"], pa.string()),
            "confidence": pa.array(out["confidence"], pa.float64()),
            "answer": pa.array(out["answer"], pa.string()),
            "overall_confidence": pa.array(out["overall_confidence"],
                                           pa.float64()),
        })

    return queries_ds.map_batches(run, batch_format="pyarrow")


def rograg_process_stage(queries_ds, graph: dict):
    """Full processor pipeline per query (``processor.rs:353-560``),
    run under TWO intent configs: the reference default (refusal
    threshold 0.8 — which its low-topping intent formula causes to
    refuse nearly everything, faithfully) and a permissive 0.2 variant
    that exercises the retrieval path."""
    import ray

    from ..functions.rograg import IntentConfig, process_query

    ref = ray.put(graph)
    cfgs = [("default", IntentConfig()),
            ("permissive", IntentConfig(refusal_threshold=0.2))]

    def run(t: pa.Table) -> pa.Table:
        g = ray.get(ref)
        qids, cfg_col, rows = [], [], []
        for qid, q in zip(t.column("query_id").to_pylist(),
                          t.column("query").to_pylist()):
            for tag, icfg in cfgs:
                qids.append(qid)
                cfg_col.append(tag)
                rows.append(process_query(q, g["entities"], g["rels"],
                                          g["by_id"], g["adjacency"],
                                          intent_cfg=icfg))
        return pa.table({
            "query_id": pa.array(qids, pa.int64()),
            "config": pa.array(cfg_col, pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
            "refusal_reason": pa.array([r["refusal_reason"] for r in rows],
                                       pa.string()),
            "refusal_kind": pa.array([r["refusal_kind"] for r in rows],
                                     pa.string()),
            "n_subqueries": pa.array([r["n_subqueries"] for r in rows],
                                     pa.int64()),
            "n_logic": pa.array([r["n_logic"] for r in rows], pa.int64()),
            "n_fuzzy": pa.array([r["n_fuzzy"] for r in rows], pa.int64()),
            "n_fallback": pa.array([r["n_fallback"] for r in rows],
                                   pa.int64()),
            "fallback_count": pa.array([r["fallback_count"] for r in rows],
                                       pa.int64()),
            "answer": pa.array([r["answer"] for r in rows], pa.string()),
            "mean_confidence": pa.array([r["mean_confidence"]
                                         for r in rows], pa.float64()),
            "n_sources": pa.array([r["n_sources"] for r in rows],
                                  pa.int64()),
        })

    return queries_ds.map_batches(run, batch_format="pyarrow")


# ---------------------------------------------------- quality metrics --


def synthesize_response_log(queries_tbl: pa.Table,
                            names: list[str]) -> pa.Table:
    """Deterministic ROGRAG response log derived from the query corpus
    and the engine's own analysis kernels (decomposition success /
    subquery counts / logic-form hits / intent confidence are real;
    answer text, sources, timings are arithmetic in the row index) —
    the INPUT side of the quality-metrics stack, staged for the oracle."""
    from ..functions.rograg import (classify_intent, decompose_hybrid,
                                    parse_logic_form)
    if not names:
        names = ["Placeholder Entity"]
    out = {k: [] for k in (
        "log_id", "query", "content", "sources", "n_sources",
        "n_subqueries", "n_logic", "n_fuzzy", "n_fallback",
        "decomposition_success", "confidence", "processing_time_ms",
        "timestamp", "cohort")}
    qs = queries_tbl.column("query").to_pylist()
    half = len(qs) // 2
    for i, q in enumerate(qs):
        dec = decompose_hybrid(q)
        nsub = len(dec["subqueries"])
        n_logic = sum(1 for s in dec["subqueries"]
                      if parse_logic_form(s["text"]) is not None)
        a = names[i % len(names)]
        b = names[(i + 1) % len(names)]
        if i % 5 == 0:
            content = ""
        else:
            content = f"{q} answer: {a} relates to {b}."
            if i % 2 == 0:
                content += (" therefore the connection holds. moreover"
                            " supporting evidence exists.")
        sources = [names[(i + j) % len(names)] for j in range(i % 6)]
        out["log_id"].append(i)
        out["query"].append(q)
        out["content"].append(content)
        out["sources"].append(";".join(sources))
        out["n_sources"].append(len(sources))
        out["n_subqueries"].append(nsub)
        out["n_logic"].append(n_logic)
        out["n_fuzzy"].append(max(nsub - n_logic, 0))
        out["n_fallback"].append(1 if i % 7 == 0 else 0)
        out["decomposition_success"].append(nsub > 1)
        # 4-decimal quantization: the 8-decimal intent confidence halved
        # in accuracy_score lands exactly on round-8 midpoints where
        # Python and DuckDB tie-break differently (oracle-parity rule:
        # never synthesize values near rounding midpoints)
        out["confidence"].append(round(classify_intent(q)["confidence"], 4))
        out["processing_time_ms"].append(50 + (i * 137) % 12000)
        out["timestamp"].append(1700000000 + i * 3)
        out["cohort"].append("baseline" if i < half else "rograg")
    return pa.table({
        "log_id": pa.array(out["log_id"], pa.int64()),
        "query": pa.array(out["query"], pa.string()),
        "content": pa.array(out["content"], pa.string()),
        "sources": pa.array(out["sources"], pa.string()),
        "n_sources": pa.array(out["n_sources"], pa.int64()),
        "n_subqueries": pa.array(out["n_subqueries"], pa.int64()),
        "n_logic": pa.array(out["n_logic"], pa.int64()),
        "n_fuzzy": pa.array(out["n_fuzzy"], pa.int64()),
        "n_fallback": pa.array(out["n_fallback"], pa.int64()),
        "decomposition_success": pa.array(out["decomposition_success"],
                                          pa.bool_()),
        "confidence": pa.array(out["confidence"], pa.float64()),
        "processing_time_ms": pa.array(out["processing_time_ms"],
                                       pa.int64()),
        "timestamp": pa.array(out["timestamp"], pa.int64()),
        "cohort": pa.array(out["cohort"], pa.string()),
    })


def _score_log_rows(t: pa.Table) -> list[dict]:
    from ..functions.quality_metrics import (quality_alerts,
                                             response_quality,
                                             retrieval_strategy)
    rows = []
    for r in t.to_pylist():
        sources = r["sources"].split(";") if r["sources"] else []
        q = response_quality(r["query"], r["content"], sources,
                             r["n_subqueries"], r["confidence"])
        q.update({
            "log_id": r["log_id"],
            "strategy": retrieval_strategy(r["n_logic"], r["n_fuzzy"],
                                           r["n_fallback"]),
            "alerts": ";".join(quality_alerts(q["overall_quality"],
                                              r["processing_time_ms"])),
            "processing_time_ms": r["processing_time_ms"],
            "decomposition_success": r["decomposition_success"],
            "cohort": r["cohort"], "timestamp": r["timestamp"],
        })
        rows.append(q)
    return rows


def response_quality_stage(log_ds):
    def run(t: pa.Table) -> pa.Table:
        rows = _score_log_rows(t)
        return pa.table({
            "log_id": pa.array([r["log_id"] for r in rows], pa.int64()),
            "accuracy_score": pa.array(
                [r["accuracy_score"] for r in rows], pa.float64()),
            "completeness_score": pa.array(
                [r["completeness_score"] for r in rows], pa.float64()),
            "coherence_score": pa.array(
                [r["coherence_score"] for r in rows], pa.float64()),
            "relevance_score": pa.array(
                [r["relevance_score"] for r in rows], pa.float64()),
            "source_credibility": pa.array(
                [r["source_credibility"] for r in rows], pa.float64()),
            "overall_quality": pa.array(
                [r["overall_quality"] for r in rows], pa.float64()),
            "strategy": pa.array([r["strategy"] for r in rows],
                                 pa.string()),
            "alerts": pa.array([r["alerts"] for r in rows], pa.string()),
        })

    return log_ds.map_batches(run, batch_format="pyarrow")


def quality_report_table(log_tbl: pa.Table) -> pa.Table:
    """Corpus-level quality report (performance statistics + alerts +
    cohort comparative analysis) as (section, name, value) rows —
    quality_metrics.rs:1131-1337 over the full staged log."""
    from ..functions.quality_metrics import (aggregated_metrics,
                                             improvement_percentage,
                                             statistical_significance,
                                             throughput_qps)
    rows = _score_log_rows(log_tbl)
    n = len(rows)
    out: list[tuple[str, str, float]] = []

    def emit(section: str, name: str, value: float):
        out.append((section, name, round(float(value), 8)))

    emit("performance", "total_queries", n)
    emit("performance", "successful_decompositions",
         sum(1 for r in rows if r["decomposition_success"]))
    emit("performance", "avg_processing_time_ms",
         sum(r["processing_time_ms"] for r in rows) / n)
    emit("performance", "avg_quality_score",
         sum(r["overall_quality"] for r in rows) / n)
    emit("performance", "fallback_rate",
         sum(1 for r in rows if r["strategy"] == "Fallback") / n)
    emit("performance", "throughput_qps",
         throughput_qps([r["timestamp"] for r in rows]))
    emit("alerts", "quality_degradation",
         sum(1 for r in rows if "QualityDegradation" in r["alerts"]))
    emit("alerts", "performance_degradation",
         sum(1 for r in rows if "PerformanceDegradation" in r["alerts"]))

    base = [r for r in rows if r["cohort"] == "baseline"]
    rog = [r for r in rows if r["cohort"] == "rograg"]
    agg_b = aggregated_metrics(base)
    agg_r = aggregated_metrics(rog)
    for tag, agg in (("baseline", agg_b), ("rograg", agg_r)):
        for k, v in agg.items():
            emit(tag, k, v)
    for k in ("accuracy", "completeness", "coherence", "relevance"):
        emit("improvement", k, improvement_percentage(
            agg_r[f"mean_{k}"], agg_b[f"mean_{k}"]))
    emit("improvement", "overall", improvement_percentage(
        (agg_r["mean_accuracy"] + agg_r["mean_completeness"]
         + agg_r["mean_coherence"] + agg_r["mean_relevance"]) / 4.0,
        (agg_b["mean_accuracy"] + agg_b["mean_completeness"]
         + agg_b["mean_coherence"] + agg_b["mean_relevance"]) / 4.0))
    sig = statistical_significance(agg_r, agg_b)
    for k in ("p_value_accuracy", "p_value_completeness",
              "p_value_coherence", "p_value_overall", "effect_size"):
        emit("significance", k, sig[k])
    emit("significance", "is_significant_95",
         1.0 if sig["is_significant_95"] else 0.0)
    emit("significance", "sample_size", min(len(base), len(rog)))

    return pa.table({
        "section": pa.array([r[0] for r in out], pa.string()),
        "name": pa.array([r[1] for r in out], pa.string()),
        "value": pa.array([r[2] for r in out], pa.float64()),
    })


# --------------------------------------------------------- fuzzy matching --


def build_entity_side(entities_tbl: pa.Table,
                      triples_tbl: pa.Table) -> tuple[list[dict], dict]:
    """Prepare the broadcast side for ``fuzzy_match_stage``: the entity
    list sorted by name asc (pinned iteration order) and the per-entity
    top-5 neighbour adjacency keyed by ENTITY ID — triple endpoints are
    the content-derived TYPE_name ids (stages/kg_extract.py) — ordered
    (conf desc, neighbour name asc, pred asc), the deterministic
    stand-in for ``fuzzy_matcher.rs:506`` take(5)."""
    ents = sorted(
        ({"entity_id": eid, "name": name, "name_lower": name.lower(),
          "type_lower": (typ or "").lower()}
         for eid, name, typ in zip(entities_tbl.column("entity_id").to_pylist(),
                                   entities_tbl.column("name").to_pylist(),
                                   entities_tbl.column("type").to_pylist())),
        key=lambda e: e["name"])
    name_by_id = {e["entity_id"]: e["name"] for e in ents}

    nbrs: dict[str, list[dict]] = {}
    for s, p, o, c in zip(triples_tbl.column("subj").to_pylist(),
                          triples_tbl.column("pred").to_pylist(),
                          triples_tbl.column("obj").to_pylist(),
                          triples_tbl.column("conf").to_pylist()):
        for src, dst in ((s, o), (o, s)):
            if src in name_by_id and dst in name_by_id:
                nbrs.setdefault(src, []).append(
                    {"conf": float(c), "neighbor": name_by_id[dst],
                     "pred": p, "neighbor_id": dst})
    adjacency = {
        eid: sorted(lst, key=lambda n: (-n["conf"], n["neighbor"],
                                        n["pred"]))[:5]
        for eid, lst in nbrs.items()}
    return ents, adjacency


def fuzzy_match_stage(queries_ds, entities_tbl: pa.Table,
                      triples_tbl: pa.Table,
                      cfg: FuzzyMatchConfig | None = None):
    """Distributed fuzzy matching: queries stream through ``map_batches``
    while the canonical entity list + adjacency ride the object store
    once (``ray.put``) — read zero-copy by every task, never re-shipped
    per batch."""
    import ray

    cfg = cfg or FuzzyMatchConfig()
    side_ref = ray.put(build_entity_side(entities_tbl, triples_tbl))

    def run(t: pa.Table) -> pa.Table:
        ents, adjacency = ray.get(side_ref)
        out = {k: [] for k in ("query_id", "rank", "match_id", "match_type",
                               "similarity", "overall_confidence")}
        for qid, q in zip(t.column("query_id").to_pylist(),
                          t.column("query").to_pylist()):
            for m in fuzzy_match_one(q, ents, adjacency, cfg):
                out["query_id"].append(qid)
                out["rank"].append(m["rank"])
                out["match_id"].append(m["match_id"])
                out["match_type"].append(m["match_type"])
                out["similarity"].append(m["similarity"])
                out["overall_confidence"].append(m["overall_confidence"])
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "match_id": pa.array(out["match_id"], pa.string()),
            "match_type": pa.array(out["match_type"], pa.string()),
            "similarity": pa.array(out["similarity"], pa.float64()),
            "overall_confidence": pa.array(out["overall_confidence"],
                                           pa.float64()),
        })

    return queries_ds.map_batches(run, batch_format="pyarrow")
