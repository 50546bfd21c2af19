"""Query-side retrieval dataflows: confidence cross-encoder reranking and
HippoRAG personalized-PageRank retrieval.

Bonus slice beyond SURVEY's build scope (§2.12 inventoried query-side),
following the round-1 pattern of shipping the deterministic query-side
operators that compose from existing engine pieces:

- ``rerank_topk`` — ``reranking/cross_encoder.rs:93-196``
  (ConfidenceCrossEncoder over a BM25 candidate list).
- ``hipporag_retrieve`` — ``retrieval/hipporag_ppr.rs:87-305`` (fact →
  entity reset weights, dense passage weights, personalized PageRank
  over the entity+passage graph, passage ranking).

Scale shape: candidate/fact/passage shortlists are inherently top-k-small
(broadcast side); the corpus-wide halves — BM25 scoring, fact scoring,
passage-frequency counts, the PPR itself — stay distributed Datasets.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hipporag import (
    HippoRAGConfig,
    combine_weights,
    entity_weights,
    passage_weights,
)
from ..functions.rerank import CrossEncoderConfig, relevance_score
from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

# ---------------------------------------------------------------- rerank --


def rerank_candidates(docs_ds, candidates: dict[int, float], query: str,
                      cfg: CrossEncoderConfig | None = None) -> pa.Table:
    """Cross-encoder rerank of a scored candidate shortlist
    (``cross_encoder.rs:150-196``): score every candidate document against
    the query (distributed map over the corpus, candidates broadcast),
    sort by relevance desc, filter ``min_confidence``, truncate ``top_k``.

    Returns (rank, doc_id, relevance_score, original_score, score_delta);
    relevance rounded to 8 (DuckDB-oracle exp() ulp discipline), ties
    break by ascending doc_id (documented deviation — the reference keeps
    unstable candidate order)."""
    import ray

    cfg = cfg or CrossEncoderConfig()
    cand_ref = ray.put(candidates)

    def score(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        ids, rel, orig = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            if did not in cand:
                continue
            r = round(relevance_score(query, text or "",
                                      normalize=cfg.normalize_scores), 8)
            ids.append(did)
            rel.append(r)
            orig.append(cand[did])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "relevance_score": pa.array(rel, pa.float64()),
                         "original_score": pa.array(orig, pa.float64())})

    scored = (docs_ds.map_batches(score, batch_format="pyarrow")
              .sort(["relevance_score", "doc_id"], descending=[True, False])
              .take_all())
    rows = [r for r in scored
            if r["relevance_score"] >= cfg.min_confidence][:cfg.top_k]
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "relevance_score": pa.array([r["relevance_score"] for r in rows],
                                    pa.float64()),
        "original_score": pa.array([r["original_score"] for r in rows],
                                   pa.float64()),
        "score_delta": pa.array(
            [round(r["relevance_score"] - r["original_score"], 8)
             for r in rows], pa.float64()),
    })


# -------------------------------------------------------------- hipporag --


def _embed_query(query: str, dim: int):
    from ..functions.embedding import HashEmbedder
    return HashEmbedder(dim).embed(query)


def fact_scores(triples_ds, query: str, dim: int = 64):
    """Distributed query-fact similarity: each (subj, pred, obj) fact is
    hash-embedded as the text "subj pred obj" and scored by cosine against
    the query embedding (the reference takes pre-ranked facts as input;
    this is the engine-side production of that ranking)."""
    import numpy as np
    import ray

    q = _embed_query(query, dim)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.embedding import HashEmbedder
        emb = HashEmbedder(dim)
        qv = ray.get(q_ref)
        subs = batch.column("subj").to_pylist()
        preds = batch.column("pred").to_pylist()
        objs = batch.column("obj").to_pylist()
        mat = emb.embed_many([f"{s} {p} {o}"
                              for s, p, o in zip(subs, preds, objs)])
        scores = mat @ qv  # rows and query are unit vectors → cosine
        return pa.table({"subj": batch.column("subj"),
                         "pred": batch.column("pred"),
                         "obj": batch.column("obj"),
                         "score": pa.array(np.round(scores.astype(np.float64),
                                                    8), pa.float64())})

    return triples_ds.map_batches(score, batch_format="pyarrow")


def passage_dense_scores(chunks_ds, query: str, top_n: int = 20,
                         dim: int = 64):
    """Dense passage shortlist: chunks hash-embedded and scored by cosine
    against the query, global top-n (score desc, chunk_id asc)."""
    import numpy as np
    import ray

    q_ref = ray.put(_embed_query(query, dim))

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.embedding import HashEmbedder
        emb = HashEmbedder(dim)
        qv = ray.get(q_ref)
        mat = emb.embed_many([t or "" for t in batch.column("text").to_pylist()])
        return pa.table({
            "passage": batch.column("chunk_id"),
            "score": pa.array(np.round((mat @ qv).astype(np.float64), 8),
                              pa.float64())})

    return (chunks_ds.map_batches(score, batch_format="pyarrow")
            .sort(["score", "passage"], descending=[True, False]).limit(top_n))


def entity_passage_pairs(mentions_ds, num_buckets: int = 16):
    """Distinct (entity id, passage) pairs from the mention rows — the
    distributed form of the reference's ``entity_to_passages`` map.
    Keyed by ENTITY ID to match the fact-triple endpoints (the
    content-derived TYPE_name ids), so the passage-frequency
    downweighting and the entity↔passage PPR edges actually connect."""
    return hash_grouped_aggregate(
        mentions_ds.map_batches(
            lambda t: pa.table({"entity": t.column("entity_id"),
                                "passage": t.column("chunk_id")}),
            batch_format="pyarrow"),
        ["entity", "passage"],
        grouped_arrow_agg(["entity", "passage"], [("passage", "count")],
                          rename=["entity", "passage", "n"]),
        num_buckets=num_buckets).map_batches(
            lambda t: t.select(["entity", "passage"]), batch_format="pyarrow")


def hipporag_retrieve(facts_topk: pa.Table, ep_pairs_ds, passage_scores: pa.Table,
                      edges_ds, cfg: HippoRAGConfig | None = None,
                      ppr_iterations: int = 8):
    """HippoRAG retrieval (``hipporag_ppr.rs:117-141`` retrieve()):

    1. entity weights from the top-k facts, downweighted by passage
       frequency (counts computed distributed from ``ep_pairs_ds``),
    2. passage weights = dense scores × passage_node_weight,
    3. combined + normalized → PPR reset distribution,
    4. personalized PageRank over the entity+passage edge Dataset
       (damping 0.5, FIXED ``ppr_iterations`` so the DuckDB oracle can
       replay the recurrence; ``graph_ops.pagerank_dataset``),
    5. passages ranked by PPR score (desc, id asc), top_k_results.

    Returns a Dataset of (rank, passage_id, score)."""
    import ray
    import ray.data as rd

    from .graph_ops import pagerank_dataset

    cfg = cfg or HippoRAGConfig()

    facts = [(s, o, sc) for s, o, sc in
             zip(facts_topk.column("subj").to_pylist(),
                 facts_topk.column("obj").to_pylist(),
                 facts_topk.column("score").to_pylist())]
    fact_entities = sorted({e for s, o, _ in facts for e in (s, o)})

    # passage-frequency counts for the fact entities only (small side —
    # filter distributed, collect ≤ 2·top_k_facts rows)
    ents_ref = ray.put(pa.array(fact_entities, pa.string()))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("entity"),
                                 value_set=ray.get(ents_ref)))

    counts_tbl = hash_grouped_aggregate(
        ep_pairs_ds.map_batches(keep, batch_format="pyarrow"), ["entity"],
        grouped_arrow_agg(["entity"], [("passage", "count")],
                          rename=["entity", "np"]))
    passage_counts = {r["entity"]: int(r["np"]) for r in counts_tbl.take_all()}

    ew = entity_weights(facts, passage_counts, cfg)
    pw = passage_weights(
        dict(zip(passage_scores.column("passage").to_pylist(),
                 passage_scores.column("score").to_pylist())), cfg)
    reset = combine_weights(ew, pw)
    if not reset or sum(reset.values()) <= 0:
        return rd.from_arrow(pa.table({
            "rank": pa.array([], pa.int64()),
            "passage_id": pa.array([], pa.string()),
            "score": pa.array([], pa.float64())}))

    scores = pagerank_dataset(
        edges_ds.map_batches(
            lambda t: pa.table({"subj": t.column("src"),
                                "obj": t.column("dst")}),
            batch_format="pyarrow").materialize(),
        damping=cfg.damping_factor, max_iter=ppr_iterations, tolerance=0.0,
        reset_probabilities=reset, round_digits=8)

    # rank passages: PPR score of the dense-shortlist passage nodes
    # (rs:252-287; nodes absent from the graph simply have no score)
    pset = set(passage_scores.column("passage").to_pylist())
    pref = ray.put(pa.array(sorted(pset), pa.string()))
    ranked = (scores.map_batches(
        lambda t: t.filter(pc.is_in(t.column("node"),
                                    value_set=ray.get(pref))),
        batch_format="pyarrow")
        .sort(["score", "node"], descending=[True, False])
        .limit(cfg.top_k_results).take_all())
    return rd.from_arrow(pa.table({
        "rank": pa.array(range(1, len(ranked) + 1), pa.int64()),
        "passage_id": pa.array([r["node"] for r in ranked], pa.string()),
        "score": pa.array([r["score"] for r in ranked], pa.float64())}))
