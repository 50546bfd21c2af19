"""Answer-generation dataflow (``generation/mod.rs``): a table of
queries, each with its retrieval shortlist (search results + RAPTOR-ish
hierarchical summaries), flows through a stateless per-query generation
stage — context assembly, MockLLM extractive/abstractive/hybrid
answering, confidence calculation, citation formatting.

Scale shape: the generation kernel is per-query local (no cross-query
state), so the stage is a hash-bucketed group pass over the flattened
(query × result) rows — at web scale each bucket holds complete
queries, results arrive pre-joined from the retrieval stages, and no
broadcast is needed.  Inputs are synthesized deterministically from the
documents table (no external data) and staged so the DuckDB oracle
replays every derivation.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..functions.generation import (
    AnswerGenerator,
    GenerationConfig,
    format_with_citations,
    get_quality_assessment,
)
from ..stages.hashagg import hash_grouped_aggregate

GEN_QUERIES = [
    ("g00", "What did the villagers discover near the river bend?",
     "hybrid", 1.0),
    ("g01", "who is the guardian and who are the main friend companions?",
     "hybrid", 1.0),
    ("g02", "where does the expedition camp?", "extractive", 1.0),
    ("g03", "What will happen during the main activity season?",
     "abstractive", 1.0),
    ("g04", "ok", "hybrid", 1.0),
    ("g05", "Which records mention shipments and orders?", "hybrid", 0.25),
    ("g06", "How is the settlement organized around the waterway?",
     "extractive", 1.0),
    ("g07", "Summarize the discovery of the ancient structure.",
     "abstractive", 1.0),
    ("g08", "What happened at the institution by the town?", "hybrid", 1.0),
    ("g09", "why did the second expedition return?", "extractive", 1.0),
]

_N_RESULTS = 8
_N_SUMMARIES = 2


def _synth_score(key: str) -> float:
    h = int.from_bytes(hashlib.blake2b(key.encode(),
                                       digest_size=8).digest(), "big")
    return round(0.05 + (h % 900) / 1000.0, 3)


def _clean(text: str, limit: int) -> str:
    # the MockLLM prompt parser splits at the first literal "Context:" /
    # "Question:" — scrub them from synthesized content so the staged
    # rows stay parse-clean on both sides
    t = (text or "").replace("Question:", "Question.") \
                    .replace("Context:", "Context.")
    return t[:limit]


def _entities_of(content: str) -> list[str]:
    out = []
    for w in content.split():
        t = re.sub(r"[^A-Za-z0-9]", "", w)
        if len(t) > 3:
            out.append(t)
        if len(out) == 2:
            break
    return out


def synthesize_generation_inputs(doc_ids: list[str], texts: list[str]):
    """(queries, results, summaries) Arrow tables — deterministic
    retrieval shortlists over the documents corpus; scores from the
    blake2b device (scaled ×0.25 for the insufficient-context cohort),
    result types cycled chunk/entity/summary to exercise the primary
    type gate."""
    n = len(doc_ids)
    q_cols = {"query_id": [], "question": [], "mode": [], "scale": []}
    r_cols = {"query_id": [], "seq": [], "result_id": [], "content": [],
              "score": [], "result_type": [], "entities_csv": []}
    s_cols = {"query_id": [], "seq": [], "node_id": [], "summary": [],
              "score": []}
    for i, (qid, question, mode, scale) in enumerate(GEN_QUERIES):
        q_cols["query_id"].append(qid)
        q_cols["question"].append(question)
        q_cols["mode"].append(mode)
        q_cols["scale"].append(scale)
        for j in range(_N_RESULTS):
            d = (i * 17 + j * 3) % n
            content = _clean(texts[d], 240)
            r_cols["query_id"].append(qid)
            r_cols["seq"].append(j)
            r_cols["result_id"].append(str(doc_ids[d]))
            r_cols["content"].append(content)
            r_cols["score"].append(_synth_score(f"{qid}|r{j}") * scale)
            r_cols["result_type"].append(
                ("chunk", "entity", "summary")[j % 3])
            r_cols["entities_csv"].append(",".join(_entities_of(content)))
        for k in range(_N_SUMMARIES):
            d = (i * 29 + k * 7 + 1) % n
            s_cols["query_id"].append(qid)
            s_cols["seq"].append(k)
            s_cols["node_id"].append(f"sum_{qid}_{k}")
            s_cols["summary"].append(_clean(texts[d], 150))
            s_cols["score"].append(_synth_score(f"{qid}|s{k}") * scale)
    queries = pa.table({
        "query_id": pa.array(q_cols["query_id"], pa.string()),
        "question": pa.array(q_cols["question"], pa.string()),
        "mode": pa.array(q_cols["mode"], pa.string()),
        "scale": pa.array(q_cols["scale"], pa.float64())})
    results = pa.table({
        "query_id": pa.array(r_cols["query_id"], pa.string()),
        "seq": pa.array(r_cols["seq"], pa.int64()),
        "result_id": pa.array(r_cols["result_id"], pa.string()),
        "content": pa.array(r_cols["content"], pa.string()),
        "score": pa.array(r_cols["score"], pa.float64()),
        "result_type": pa.array(r_cols["result_type"], pa.string()),
        "entities_csv": pa.array(r_cols["entities_csv"], pa.string())})
    summaries = pa.table({
        "query_id": pa.array(s_cols["query_id"], pa.string()),
        "seq": pa.array(s_cols["seq"], pa.int64()),
        "node_id": pa.array(s_cols["node_id"], pa.string()),
        "summary": pa.array(s_cols["summary"], pa.string()),
        "score": pa.array(s_cols["score"], pa.float64())})
    return queries, results, summaries


def generate_one(question: str, mode: str, results: list[dict],
                 summaries: list[dict]) -> dict:
    """Run the full generator for one query; returns the output row."""
    gen = AnswerGenerator(config=GenerationConfig(mode=mode))
    search = [{"id": r["result_id"], "content": r["content"],
               "score": r["score"], "result_type": r["result_type"],
               "entities": [e for e in r["entities_csv"].split(",")
                            if e != ""]}
              for r in sorted(results, key=lambda r: r["seq"])]
    hier = [{"node_id": s["node_id"], "summary": s["summary"],
             "score": s["score"]}
            for s in sorted(summaries, key=lambda s: s["seq"])]
    ans = gen.generate_answer(question, search, hier)
    formatted = format_with_citations(ans)
    return {
        "mode_used": ans["mode_used"],
        "answer": ans["answer_text"],
        "confidence": round(ans["confidence_score"], 12),
        "context_quality": round(ans["context_quality"], 12),
        "n_sources": len(ans["sources"]),
        "entities_csv": ",".join(ans["entities_mentioned"]),
        "citations_md5": hashlib.md5(formatted.encode()).hexdigest(),
        "quality": get_quality_assessment(ans),
    }


def generated_answers(results_ds, summaries_ds, queries_tbl: pa.Table):
    """Distributed per-query generation: results + summaries rows are
    tagged, unioned, hash-bucketed by query_id; each bucket runs the
    full generator per contained query (query metadata broadcast via
    closure — the SMALL side)."""
    import ray
    qmeta_ref = ray.put({qid: (question, mode)
                         for qid, question, mode in zip(
        queries_tbl.column("query_id").to_pylist(),
        queries_tbl.column("question").to_pylist(),
        queries_tbl.column("mode").to_pylist())})

    def widen_results(t: pa.Table) -> pa.Table:
        return t.append_column("row_kind",
                               pa.array(["r"] * len(t), pa.string())) \
                .append_column("node_id",
                               pa.array([""] * len(t), pa.string())) \
                .append_column("summary",
                               pa.array([""] * len(t), pa.string()))

    def widen_summaries(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "query_id": t.column("query_id"),
            "seq": t.column("seq"),
            "result_id": pa.array([""] * n, pa.string()),
            "content": pa.array([""] * n, pa.string()),
            "score": t.column("score"),
            "result_type": pa.array([""] * n, pa.string()),
            "entities_csv": pa.array([""] * n, pa.string()),
            "row_kind": pa.array(["s"] * n, pa.string()),
            "node_id": t.column("node_id"),
            "summary": t.column("summary")})

    combined = (results_ds.map_batches(widen_results,
                                       batch_format="pyarrow")
                .union(summaries_ds.map_batches(widen_summaries,
                                                batch_format="pyarrow")))

    def per_bucket(t: pa.Table) -> pa.Table:
        import ray as _ray
        qmeta = _ray.get(qmeta_ref)   # query metadata broadcast once
        rows = t.to_pylist()
        by_q: dict[str, dict[str, list]] = {}
        for r in rows:
            d = by_q.setdefault(r["query_id"], {"r": [], "s": []})
            d[r["row_kind"]].append(r)
        cols: dict[str, list] = {
            "query_id": [], "mode_used": [], "answer": [],
            "confidence": [], "context_quality": [], "n_sources": [],
            "entities_csv": [], "citations_md5": [], "quality": []}
        for qid in sorted(by_q):
            question, mode = qmeta[qid]
            out = generate_one(question, mode, by_q[qid]["r"],
                               by_q[qid]["s"])
            cols["query_id"].append(qid)
            for k, v in out.items():
                cols[k].append(v)
        return pa.table({
            "query_id": pa.array(cols["query_id"], pa.string()),
            "mode_used": pa.array(cols["mode_used"], pa.string()),
            "answer": pa.array(cols["answer"], pa.string()),
            "confidence": pa.array(cols["confidence"], pa.float64()),
            "context_quality": pa.array(cols["context_quality"],
                                        pa.float64()),
            "n_sources": pa.array(cols["n_sources"], pa.int64()),
            "entities_csv": pa.array(cols["entities_csv"], pa.string()),
            "citations_md5": pa.array(cols["citations_md5"], pa.string()),
            "quality": pa.array(cols["quality"], pa.string())})

    return hash_grouped_aggregate(combined, ["query_id"], per_bucket,
                                  num_buckets=8)


__all__ = ["GEN_QUERIES", "synthesize_generation_inputs", "generate_one",
           "generated_answers"]
