"""REST API handlers — port of ``graphrag-core/src/api/handlers.rs``
(+ the ``api/rest.rs`` client shape).  Each handler is a pure
``(state, request) → (status_code, body_dict)`` function — the axum
HTTP plumbing is out of sandbox scope (any WSGI/ASGI shim can mount
these), but every request/response contract is pinned:

- ``health_check``: status/version/timestamp.
- ``handle_query``: answer lines from ``GraphRAG.ask``'s query path;
  ``include_sources`` → the hardcoded ``["doc1"]`` placeholder and
  ``include_confidence`` → the hardcoded 0.85 (reference quirks,
  pinned), tokens_used hardwired 100, default limit 10 (parsed but
  unused — also a reference quirk).
- ``add_document``: success envelope with content_length/has_metadata.
- ``get_document``: 404 with "Document not found: {id}".
- ``graph_stats`` / ``get_metrics``: initialized vs not-initialized
  envelopes (the uninitialized branch carries a message).
- ``export_graph``: nodes/edges arrays + counts.
- ``list_entities``: optional type filter, 1-based pagination with
  ``(page-1)*page_size`` skip and ceil total_pages.
- ``AppError`` → (500/404/400, {"error": msg}).
"""

from __future__ import annotations

import time

API_VERSION = "0.1.0"


class AppState:
    """``handlers.rs:18-22`` — shared facade + session map."""

    def __init__(self, graphrag, clock=time.time):
        self.graphrag = graphrag
        self.sessions: dict[str, object] = {}
        self._clock = clock


def health_check(state: AppState):
    return 200, {"status": "healthy", "version": API_VERSION,
                 "timestamp": state._clock()}


def handle_query(state: AppState, req: dict):
    """``:71-103``."""
    query = req["query"]
    options = req.get("options", {})
    g = state.graphrag
    g.ensure_initialized()
    if g.has_documents() and not g.has_graph():
        g.build_graph()
    answer = g.query_internal(query)
    body = {"answer": answer,
            "metadata": {"query_time_ms": 0, "tokens_used": 100}}
    if options.get("include_sources"):
        body["sources"] = ["doc1"]          # reference placeholder
    if options.get("include_confidence"):
        body["confidence"] = 0.85           # reference placeholder
    return 200, body


def add_document(state: AppState, req: dict):
    """``:112-134``."""
    content = req["content"]
    metadata = req.get("metadata", {})
    try:
        state.graphrag.ensure_initialized()
        state.graphrag.add_document_from_text(content)
    except Exception as e:                            # noqa: BLE001
        return app_error("internal", f"Failed to add document: {e}")
    return 200, {"status": "success", "document_id": req["id"],
                 "message": "Document added and processed successfully",
                 "processing_time_ms": 0,
                 "metadata": {"content_length": len(content),
                              "has_metadata": bool(metadata)}}


def get_document(state: AppState, doc_id: str):
    """``:136-154``."""
    kg = state.graphrag.get_knowledge_graph()
    if kg is not None:
        for doc in kg["documents"]:
            if doc["id"] == doc_id:
                return 200, {"id": doc["id"], "content": doc["content"],
                             "metadata": {}}
    return app_error("not_found", f"Document not found: {doc_id}")


def graph_stats(state: AppState):
    """``:156-179``."""
    kg = state.graphrag.get_knowledge_graph()
    if kg is not None:
        ne, nr = len(kg["entities"]), len(kg["relationships"])
        return 200, {"entities": ne, "relationships": nr,
                     "documents": len(kg["documents"]),
                     "nodes": ne, "edges": nr}
    return 200, {"entities": 0, "relationships": 0, "documents": 0,
                 "nodes": 0, "edges": 0,
                 "message": "Knowledge graph not initialized"}


def export_graph(state: AppState):
    """``:181-227``."""
    kg = state.graphrag.get_knowledge_graph()
    if kg is None:
        return 200, {"nodes": [], "edges": [],
                     "metadata": {"node_count": 0, "edge_count": 0}}
    nodes = [{"id": e["id"], "name": e["name"], "type": e["type"],
              "confidence": e["confidence"]} for e in kg["entities"]]
    edges = [{"source": r["source"], "target": r["target"],
              "type": r["type"], "confidence": r["confidence"]}
             for r in kg["relationships"]]
    return 200, {"nodes": nodes, "edges": edges,
                 "metadata": {"node_count": len(nodes),
                              "edge_count": len(edges)}}


def list_entities(state: AppState, params: dict | None = None):
    """``:241-284``."""
    params = params or {}
    page = params.get("page", 1)
    page_size = params.get("page_size", 20)
    etype = params.get("entity_type")
    kg = state.graphrag.get_knowledge_graph()
    if kg is None:
        return 200, {"entities": [], "page": page,
                     "page_size": page_size, "total": 0,
                     "message": "Knowledge graph not initialized"}
    entities = [{"id": e["id"], "name": e["name"], "type": e["type"],
                 "confidence": e["confidence"]}
                for e in kg["entities"]
                if etype is None or e["type"] == etype]
    total = len(entities)
    start = (page - 1) * page_size
    entities = entities[start:start + page_size]
    return 200, {"entities": entities, "page": page,
                 "page_size": page_size, "total": total,
                 "total_pages": (total + page_size - 1) // page_size}


def get_metrics(state: AppState):
    """``:286-308``."""
    metrics = {"sessions": {"active": len(state.sessions),
                            "total_created": len(state.sessions)}}
    kg = state.graphrag.get_knowledge_graph()
    if kg is not None:
        metrics["graph"] = {"entities": len(kg["entities"]),
                            "relationships": len(kg["relationships"]),
                            "documents": len(kg["documents"])}
    return 200, metrics


def build_graph_route(state: AppState):
    """``graphrag-server/src/main.rs:625-678`` (memory backend branch):
    400 when no documents, else build + pinned success envelope
    (processing_time_ms pinned 0 — the reference's value is a measured
    sleep; we pin the deterministic member of the envelope)."""
    state.graphrag.ensure_initialized()
    if not state.graphrag.has_documents():
        return app_error(
            "bad_request",
            "No documents to build graph from. Add documents first.")
    state.graphrag.build_graph()
    kg = state.graphrag.get_knowledge_graph()
    return 200, {"success": True,
                 "document_count": len(kg["documents"]) if kg else 0,
                 "processing_time_ms": 0,
                 "message": "Knowledge graph built from memory successfully",
                 "backend": "memory"}


def app_error(kind: str, message: str):
    """``AppError::into_response`` (``:312-334``)."""
    status = {"graphrag": 500, "not_found": 404, "bad_request": 400,
              "internal": 500}[kind]
    return status, {"error": message}


ROUTES = {
    ("GET", "/health"): health_check,
    ("POST", "/query"): handle_query,
    ("POST", "/documents"): add_document,
    ("GET", "/documents/{id}"): get_document,
    ("POST", "/graph/build"): build_graph_route,
    ("GET", "/graph/stats"): graph_stats,
    ("GET", "/graph/export"): export_graph,
    ("GET", "/entities"): list_entities,
    ("GET", "/metrics"): get_metrics,
}


__all__ = ["API_VERSION", "AppState", "health_check", "handle_query",
           "add_document", "get_document", "graph_stats",
           "export_graph", "list_entities", "get_metrics", "app_error",
           "build_graph_route", "ROUTES"]
