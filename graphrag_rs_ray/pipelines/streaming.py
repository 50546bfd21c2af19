"""ROGRAG response-building dataflow (``rograg/streaming.rs``): a table
of (query, intent, strategy) rows and their subquery results flows
through a stateless per-query response-assembly stage — synthesis,
template selection, placeholder generation, cleanup, attribution,
chunking.  Inputs are synthesized deterministically from the documents
table and staged so the DuckDB oracle replays every string."""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..functions.rograg import classify_intent
from ..functions.rograg_streaming import (
    StreamingConfig,
    build_response,
    generate_streaming_chunks,
)
from ..stages.hashagg import hash_grouped_aggregate

STRATEGIES = ["sequential", "weighted", "best_only", "smart_merge",
              "hierarchical"]

# phrases chosen to hit every template branch through the (oracle-
# checked) intent classifier: factual / definitional / relational /
# comparative / temporal→fallback / causal→fallback / summary /
# ambiguous (summary via >1 subqueries)
_QUERY_PHRASES = [
    "what is {a}?",
    "define {a}",
    "how is {a} related to {b}?",
    "compare {a} versus {b}",
    "when did {a} happen?",
    "why did {a} cause {b}?",
    "summarize the story of {a}",
    "zxq blorp {a}",
]


def _conf(key: str) -> float:
    h = int.from_bytes(hashlib.blake2b(key.encode(),
                                       digest_size=8).digest(), "big")
    return round(0.05 + (h % 900) / 1000.0, 3)


def synthesize_streaming_inputs(names: list[str], texts: list[str]):
    """(queries, results) tables: each phrase × strategy cohort with 4
    subquery-result rows whose contents are word-slices of documents
    ('related' injected into one row per query so the relational
    placeholder has a hit)."""
    if not names:
        names = ["Alpha", "Beta"]
    q_cols = {"query_id": [], "query": [], "strategy": [],
              "primary_intent": [], "intent_confidence": []}
    r_cols = {"query_id": [], "seq": [], "content": [],
              "confidence": [], "result_type": [], "sources_csv": []}
    qn = 0
    for si, strategy in enumerate(STRATEGIES):
        for pi, phrase in enumerate(_QUERY_PHRASES):
            a = names[(si + pi) % len(names)]
            b = names[(si + pi + 1) % len(names)]
            query = phrase.replace("{a}", a).replace("{b}", b)
            intent = classify_intent(query)
            qid = f"sq{qn:02d}"
            qn += 1
            q_cols["query_id"].append(qid)
            q_cols["query"].append(query)
            q_cols["strategy"].append(strategy)
            q_cols["primary_intent"].append(intent["primary_intent"])
            q_cols["intent_confidence"].append(
                round(intent["confidence"], 6))
            for j in range(4):
                d = (si * 31 + pi * 7 + j * 3) % len(texts)
                words = re.sub(r"\s+", " ", texts[d] or "").split()[
                    j * 4:j * 4 + 8]
                content = " ".join(words) or f"item {j}"
                if j == 2:
                    content = content + " related to " + b
                r_cols["query_id"].append(qid)
                r_cols["seq"].append(j)
                r_cols["content"].append(content)
                r_cols["confidence"].append(_conf(f"{qid}|{j}"))
                r_cols["result_type"].append(
                    ("logic_form", "fuzzy_match", "fallback")[j % 3])
                r_cols["sources_csv"].append(",".join(
                    f"src{(j + k) % 5}" for k in range(2)))
    queries = pa.table({
        "query_id": pa.array(q_cols["query_id"], pa.string()),
        "query": pa.array(q_cols["query"], pa.string()),
        "strategy": pa.array(q_cols["strategy"], pa.string()),
        "primary_intent": pa.array(q_cols["primary_intent"],
                                   pa.string()),
        "intent_confidence": pa.array(q_cols["intent_confidence"],
                                      pa.float64())})
    results = pa.table({
        "query_id": pa.array(r_cols["query_id"], pa.string()),
        "seq": pa.array(r_cols["seq"], pa.int64()),
        "content": pa.array(r_cols["content"], pa.string()),
        "confidence": pa.array(r_cols["confidence"], pa.float64()),
        "result_type": pa.array(r_cols["result_type"], pa.string()),
        "sources_csv": pa.array(r_cols["sources_csv"], pa.string())})
    return queries, results


def responses_stage(results_ds, queries_tbl: pa.Table):
    """Hash-bucketed per-query response assembly; query metadata
    broadcast via closure (the SMALL side)."""
    import ray
    meta_ref = ray.put({qid: (query, strategy, intent.lower(), iconf)
                        for qid, query, strategy, intent, iconf in zip(
        queries_tbl.column("query_id").to_pylist(),
        queries_tbl.column("query").to_pylist(),
        queries_tbl.column("strategy").to_pylist(),
        queries_tbl.column("primary_intent").to_pylist(),
        queries_tbl.column("intent_confidence").to_pylist())})

    def per_bucket(t: pa.Table) -> pa.Table:
        import ray as _ray
        meta = _ray.get(meta_ref)     # query metadata broadcast once
        rows = t.to_pylist()
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        cols = {k: [] for k in (
            "query_id", "strategy", "template_type",
            "effective_template", "content", "confidence",
            "sources_csv", "n_subqueries", "fallback_used", "n_chunks")}
        for qid in sorted(by_q):
            query, strategy, intent, iconf = meta[qid]
            subq = [{"content": r["content"],
                     "confidence": r["confidence"],
                     "result_type": r["result_type"],
                     "sources": r["sources_csv"].split(",")}
                    for r in sorted(by_q[qid], key=lambda r: r["seq"])]
            cfg = StreamingConfig(synthesis_strategy=strategy)
            resp = build_response(
                query, subq,
                {"primary_intent": intent, "confidence": iconf}, cfg)
            chunks = generate_streaming_chunks(resp, cfg)
            cols["query_id"].append(qid)
            cols["strategy"].append(strategy)
            cols["template_type"].append(resp["template_type"])
            cols["effective_template"].append(
                resp["effective_template"])
            cols["content"].append(resp["content"])
            cols["confidence"].append(round(resp["confidence"], 12))
            cols["sources_csv"].append(",".join(resp["sources"]))
            cols["n_subqueries"].append(resp["subqueries_processed"])
            cols["fallback_used"].append(
                1 if resp["fallback_used"] else 0)
            cols["n_chunks"].append(len(chunks))
        return pa.table({
            "query_id": pa.array(cols["query_id"], pa.string()),
            "strategy": pa.array(cols["strategy"], pa.string()),
            "template_type": pa.array(cols["template_type"],
                                      pa.string()),
            "effective_template": pa.array(cols["effective_template"],
                                           pa.string()),
            "content": pa.array(cols["content"], pa.string()),
            "confidence": pa.array(cols["confidence"], pa.float64()),
            "sources_csv": pa.array(cols["sources_csv"], pa.string()),
            "n_subqueries": pa.array(cols["n_subqueries"], pa.int64()),
            "fallback_used": pa.array(cols["fallback_used"],
                                      pa.int64()),
            "n_chunks": pa.array(cols["n_chunks"], pa.int64())})

    return hash_grouped_aggregate(results_ds, ["query_id"], per_bucket,
                                  num_buckets=8)


__all__ = ["STRATEGIES", "synthesize_streaming_inputs",
           "responses_stage"]
