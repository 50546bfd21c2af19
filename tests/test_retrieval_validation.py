"""Cross-encoder rerank, HippoRAG PPR weights, and pipeline validation —
unit tests ported from the reference
(``reranking/cross_encoder.rs:268-388``, ``retrieval/hipporag_ppr.rs:
326-410``, ``evaluation/pipeline_validation.rs:595-680``)."""

import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.hipporag import (
    HippoRAGConfig,
    combine_weights,
    entity_weights,
    passage_weights,
)
from graphrag_rs_ray.functions.rerank import (
    CrossEncoderConfig,
    relevance_score,
    reranking_stats,
)

# ------------------------------------------------- cross-encoder kernel --


def test_score_pair_range():
    # cross_encoder.rs:346-359
    s = relevance_score("artificial intelligence",
                        "AI and machine learning are related fields")
    assert 0.0 <= s <= 1.0


def test_relevance_empty_inputs():
    # cross_encoder.rs:109-111 — empty side scores 0 before normalization
    assert relevance_score("query", "") == 0.0
    assert relevance_score("", "document text") == 0.0


def test_relevance_overlap_ordering():
    # cross_encoder.rs:283-320 test_rerank_basic — result 3 has best overlap
    q = "machine learning algorithms"
    s1 = relevance_score(q, "Machine learning is a subset of artificial intelligence")
    s2 = relevance_score(q, "The weather today is sunny")
    s3 = relevance_score(q, "Neural networks are machine learning algorithms "
                            "used for pattern recognition")
    assert s3 > s1 > s2


def test_reranking_stats():
    # cross_encoder.rs:362-387
    stats = reranking_stats(5, [0.3, 0.1])
    assert stats["candidates_count"] == 5
    assert stats["results_count"] == 2
    assert abs(stats["filter_rate"] - 60.0) < 1e-3
    assert stats["avg_score_improvement"] > 0.0
    assert abs(stats["max_score_improvement"] - 0.3) < 1e-12
    assert reranking_stats(0, [])["filter_rate"] == 0.0


def test_rerank_candidates_filter_and_order(ray_session):
    # cross_encoder.rs:322-344 test_confidence_filtering + ordering
    import ray.data as rd

    from graphrag_rs_ray.pipelines.retrieval import rerank_candidates

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "highly relevant technical content about the specific technical query",
            "somewhat relevant",
            "not relevant at all",
        ], pa.string())}))
    out = rerank_candidates(docs, {1: 0.3, 2: 0.4, 3: 0.5},
                            "specific technical query",
                            CrossEncoderConfig(top_k=10, min_confidence=0.5))
    rel = out.column("relevance_score").to_pylist()
    assert all(r >= 0.5 for r in rel)
    assert rel == sorted(rel, reverse=True)
    assert out.column("rank").to_pylist() == list(range(1, out.num_rows + 1))
    deltas = out.column("score_delta").to_pylist()
    origs = out.column("original_score").to_pylist()
    for r, o, d in zip(rel, origs, deltas):
        assert abs(d - round(r - o, 8)) < 1e-12


# ----------------------------------------------------- hipporag kernels --


def test_entity_weight_calculation():
    # hipporag_ppr.rs:330-361 — Alice (1 passage) outweighs Company (2)
    cfg = HippoRAGConfig()
    facts = [("Alice", "Company", 0.9), ("Bob", "Company", 0.8)]
    counts = {"Alice": 1, "Company": 2}
    w = entity_weights(facts, counts, cfg)
    assert w["Alice"] > w["Company"]
    assert "Bob" not in w  # zero passages < min_entity_frequency=1


def test_passage_weight_calculation():
    # hipporag_ppr.rs:363-387 — scaled by passage_node_weight, no normalize
    cfg = HippoRAGConfig(passage_node_weight=0.05, normalize_scores=False)
    w = passage_weights({"doc1": 0.9, "doc2": 0.5}, cfg)
    assert abs(w["doc1"] - 0.9 * 0.05) < 1e-3
    assert w["doc1"] > w["doc2"]


def test_weight_combining():
    # hipporag_ppr.rs:389-410 — overlap summed, total mass 1
    combined = combine_weights({"entity1": 0.8},
                               {"doc1": 0.04, "entity1": 0.01})
    assert combined["entity1"] > 0.0
    assert abs(sum(combined.values()) - 1.0) < 1e-3


def test_hipporag_retrieve_end_to_end(ray_session):
    import ray.data as rd

    from graphrag_rs_ray.pipelines.retrieval import hipporag_retrieve

    facts = pa.table({
        "subj": pa.array(["Alice", "Bob"], pa.string()),
        "obj": pa.array(["Stanford", "Stanford"], pa.string()),
        "score": pa.array([0.9, 0.7], pa.float64())})
    ep = rd.from_arrow(pa.table({
        "entity": pa.array(["Alice", "Stanford", "Stanford", "Bob"]),
        "passage": pa.array(["p1", "p1", "p2", "p2"])}))
    ps = pa.table({"passage": pa.array(["p1", "p2"], pa.string()),
                   "score": pa.array([0.8, 0.6], pa.float64())})
    edges = rd.from_arrow(pa.table({
        "src": pa.array(["Alice", "Bob", "Alice", "p1", "Stanford", "p1",
                         "Stanford", "p2", "Bob", "p2"]),
        "dst": pa.array(["Stanford", "Stanford", "p1", "Alice", "p1",
                         "Stanford", "p2", "Stanford", "p2", "Bob"])}))
    out = hipporag_retrieve(facts, ep, ps, edges).take_all()
    assert {r["passage_id"] for r in out} <= {"p1", "p2"}
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert len(out) == 2


# -------------------------------------------------- pipeline validation --


def _docs_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "doc_chars": pa.array([r[1] for r in rows], pa.int64())}))


def _chunks_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "chunk_id": pa.array([r[0] for r in rows], pa.string()),
        "doc_id": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string())}))


def _mentions_ds(chunk_ids):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "chunk_id": pa.array(chunk_ids, pa.string()),
        "entity_id": pa.array([f"e{i}" for i in range(len(chunk_ids))],
                              pa.string())}))


def _entities_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "type": pa.array([r[1] for r in rows], pa.string()),
        "conf": pa.array([r[2] for r in rows], pa.float64()),
        "mention_count": pa.array([r[3] for r in rows], pa.int64())}))


def _triples_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float64())}))


def _report_map(tbl):
    return {(p, n): (ok, v) for p, n, ok, v in
            zip(tbl.column("phase").to_pylist(), tbl.column("name").to_pylist(),
                tbl.column("passed").to_pylist(), tbl.column("value").to_pylist())}


def test_document_processing_validation(ray_session):
    # pipeline_validation.rs:601-628 — 41-char doc, 2 chunks covering 40
    # chars (97.6% ≥ 0.9): every doc-phase check passes
    from graphrag_rs_ray.pipelines.validation import pipeline_validation_report

    tbl = pipeline_validation_report(
        _docs_ds([("test", 41)]),
        _chunks_ds([("c1", "test", "This is test"),
                    ("c2", "test", "content with multiple words.")]),
        _mentions_ds(["c1"]),
        _entities_ds([("Alice", "person", 0.9, 1)]),
        _triples_ds([("Alice", "knows", "Alice", 0.8)]))
    m = _report_map(tbl)
    for check in ("document_not_empty", "chunks_created", "content_coverage",
                  "no_empty_chunks", "metadata_enrichment"):
        assert m[("Document Processing", check)][0], check
    assert m[("Document Processing", "chunks_count")][1] == 2.0
    assert abs(m[("Document Processing", "coverage_ratio")][1] - 40 / 41) < 1e-6


def test_entity_extraction_validation(ray_session):
    # pipeline_validation.rs:631-657
    from graphrag_rs_ray.pipelines.validation import pipeline_validation_report

    tbl = pipeline_validation_report(
        _docs_ds([("test", 23)]),
        _chunks_ds([("c1", "test", "Alice works at Stanford")]),
        _mentions_ds(["c1"]),
        _entities_ds([("Alice", "person", 0.9, 1)]),
        _triples_ds([("Alice", "works_at", "Alice", 0.9)]))
    m = _report_map(tbl)
    for check in ("entities_extracted", "confidence_scores_valid",
                  "entity_types_populated", "entity_names_valid",
                  "entity_mentions_valid"):
        assert m[("Entity Extraction", check)][0], check
    assert m[("Entity Extraction", "entities_count")][1] == 1.0
    assert abs(m[("Entity Extraction", "avg_confidence")][1] - 0.9) < 1e-9


def test_validation_detects_violations(ray_session):
    # corrupted graph: mention → missing chunk, triple → missing entity,
    # blank entity type, invalid confidence, empty chunk, poor coverage
    from graphrag_rs_ray.pipelines.validation import (
        detailed_report, pipeline_validation_report)

    tbl = pipeline_validation_report(
        _docs_ds([("d1", 100), ("d2", 50)]),
        _chunks_ds([("c1", "d1", "short"), ("c2", "d1", "   ")]),
        _mentions_ds(["c1", "missing_chunk"]),
        _entities_ds([("Alice", "person", 0.9, 2),
                      ("Bob", "", 1.5, 1)]),
        _triples_ds([("Alice", "knows", "Bob", 0.9),
                     ("Alice", "knows", "Ghost", 0.8),
                     ("Alice", "", "Bob", 0.7)]))
    m = _report_map(tbl)
    assert m[("Document Processing", "chunks_created")] == (False, 1.0)   # d2
    assert m[("Document Processing", "content_coverage")] == (False, 1.0)  # d1 8/100
    assert m[("Document Processing", "no_empty_chunks")] == (False, 1.0)
    assert m[("Entity Extraction", "confidence_scores_valid")] == (False, 1.0)
    assert m[("Entity Extraction", "entity_types_populated")] == (False, 1.0)
    assert m[("Entity Extraction", "entity_mentions_valid")] == (False, 1.0)
    assert m[("Relationship Extraction", "relationship_types_populated")] == (False, 1.0)
    assert m[("Relationship Extraction", "relationship_entities_exist")] == (False, 1.0)
    assert m[("Graph Construction", "graph_not_empty")][0]
    rep = detailed_report(tbl)
    assert "FAIL" in rep and "checks passed" in rep


def test_pipeline_report_rollup(ray_session):
    # pipeline_validation.rs:658-680 — all-green rollup: every check passes
    from graphrag_rs_ray.pipelines.validation import (
        detailed_report, pipeline_validation_report)
    import pyarrow.compute as pc

    tbl = pipeline_validation_report(
        _docs_ds([("test", 41)]),
        _chunks_ds([("c1", "test", "This is test"),
                    ("c2", "test", "content with multiple words.")]),
        _mentions_ds(["c1"]),
        _entities_ds([("Alice", "person", 0.9, 1),
                      ("Stanford", "organization", 0.8, 1)]),
        _triples_ds([("Alice", "works_at", "Stanford", 0.9)]))
    checks = tbl.filter(pc.equal(tbl.column("kind"), "check"))
    assert all(checks.column("passed").to_pylist())
    rep = detailed_report(tbl)
    assert "FAIL" not in rep
