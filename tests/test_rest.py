"""REST handlers vs ``api/handlers.rs`` contracts."""

from graphrag_rs_ray.api import GraphRAG
from graphrag_rs_ray.rest import (
    AppState,
    add_document,
    export_graph,
    get_document,
    get_metrics,
    graph_stats,
    handle_query,
    health_check,
    list_entities,
)

DOC = ("John Smith founded Acme Corp in Boston. "
       "Mary Jones joined Acme Corp as chief engineer.")


def _state():
    return AppState(GraphRAG(), clock=lambda: 1234.0)


def test_health():
    code, body = health_check(_state())
    assert code == 200
    assert body["status"] == "healthy" and body["timestamp"] == 1234.0


def test_uninitialized_envelopes():
    s = _state()
    code, body = graph_stats(s)
    assert code == 200 and body["entities"] == 0
    assert body["message"] == "Knowledge graph not initialized"
    code, body = list_entities(s)
    assert body["total"] == 0 and "message" in body
    code, body = get_metrics(s)
    assert body["sessions"] == {"active": 0, "total_created": 0}
    assert "graph" not in body
    code, body = get_document(s, "nope")
    assert code == 404 and body["error"] == "Document not found: nope"


def test_document_and_query_flow(ray_session):
    s = _state()
    code, body = add_document(s, {"id": "d1", "content": DOC,
                                  "metadata": {"k": "v"}})
    assert code == 200 and body["status"] == "success"
    assert body["metadata"] == {"content_length": len(DOC),
                                "has_metadata": True}
    code, body = handle_query(
        s, {"query": "Who founded Acme Corp?",
            "options": {"include_sources": True,
                        "include_confidence": True}})
    assert code == 200
    assert body["answer"]
    assert body["sources"] == ["doc1"]       # reference placeholder
    assert body["confidence"] == 0.85        # reference placeholder
    assert body["metadata"]["tokens_used"] == 100
    # plain options omit the optional fields
    code, plain = handle_query(s, {"query": "Acme?"})
    assert "sources" not in plain and "confidence" not in plain

    code, stats = graph_stats(s)
    assert stats["entities"] > 0 and stats["nodes"] == stats["entities"]
    code, metrics = get_metrics(s)
    assert metrics["graph"]["documents"] == 1

    doc_id = s.graphrag._docs[0]["id"]
    code, doc = get_document(s, doc_id)
    assert code == 200 and doc["content"] == DOC

    code, export = export_graph(s)
    assert export["metadata"]["node_count"] == len(export["nodes"]) > 0
    assert all({"id", "name", "type", "confidence"} <= set(n)
               for n in export["nodes"])

    code, page = list_entities(s, {"page": 1, "page_size": 2})
    assert len(page["entities"]) <= 2
    assert page["total_pages"] == (page["total"] + 1) // 2
    # type filter
    code, typed = list_entities(s, {"entity_type": "person"})
    assert all(e["type"] == "person" for e in typed["entities"])
