"""IncrementalGraphManager vs ``incremental/mod.rs`` semantics."""

import pytest

from graphrag_rs_ray.state.incremental import (
    IncrementalConfig,
    IncrementalGraphManager,
)


def _extractor(content):
    """Deterministic stand-in for the engine extractor (the reference
    ships an empty stub)."""
    words = [w for w in content["text"].split() if w[:1].isupper()]
    ents = [{"name": w, "attributes": {"src": content["id"]}}
            for w in words]
    rels = []
    return {"entities": ents, "relationships": rels, "concepts": []}


def test_change_detection_skips_unchanged():
    m = IncrementalGraphManager(extractor=_extractor)
    s1 = m.add_content({"id": "d1", "text": "Alice met Bob"})
    assert s1.nodes_added == 2
    s2 = m.add_content({"id": "d1", "text": "Alice met Bob"})
    assert s2.nodes_added == 0 and s2.nodes_updated == 0
    s3 = m.add_content({"id": "d1", "text": "Alice met Carol"})
    assert s3.nodes_added == 1 and s3.nodes_updated == 1


def test_default_extractor_is_reference_stub():
    m = IncrementalGraphManager()
    s = m.add_content({"id": "d1", "text": "Alice met Bob"})
    assert s.nodes_added == 0 and m.stats()["node_count"] == 0
    assert m.stats()["update_count"] == 1     # record still written


def test_similar_entity_case_insensitive_sorted_iteration():
    m = IncrementalGraphManager(extractor=_extractor)
    m.add_content({"id": "d1", "text": "ALICE here"})
    s = m.add_content({"id": "d2", "text": "Alice again"})
    assert s.nodes_updated == 1 and s.nodes_added == 0


def test_update_node_strategies():
    # latest_wins: label replaced, attributes extended
    m = IncrementalGraphManager()
    m._add_node({"id": "n1", "label": "Old", "node_type": "entity",
                 "attributes": {"a": "1"}, "embeddings": None,
                 "created_at": 0, "updated_at": 0, "version": 1})
    m.update_node("n1", {"label": "New", "attributes": {"b": "2"},
                         "embeddings": [0.5], "node_type": None})
    n = m.nodes["n1"]
    assert n["label"] == "New" and n["attributes"] == {"a": "1",
                                                       "b": "2"}
    assert n["embeddings"] == [0.5] and n["version"] == 2

    # merge: or_insert keeps existing keys
    mm = IncrementalGraphManager(
        IncrementalConfig(conflict_resolution="merge"))
    mm._add_node({"id": "n1", "label": "X", "node_type": "entity",
                  "attributes": {"a": "old"}, "embeddings": None,
                  "created_at": 0, "updated_at": 0, "version": 1})
    mm.update_node("n1", {"label": "Y",
                          "attributes": {"a": "new", "b": "2"},
                          "embeddings": None, "node_type": None})
    assert mm.nodes["n1"]["attributes"] == {"a": "old", "b": "2"}
    assert mm.nodes["n1"]["label"] == "X"     # merge never touches label

    # highest_confidence: comment-only arm → no-op but version bumps
    hc = IncrementalGraphManager(
        IncrementalConfig(conflict_resolution="highest_confidence"))
    hc._add_node({"id": "n1", "label": "X", "node_type": "entity",
                  "attributes": {}, "embeddings": None, "created_at": 0,
                  "updated_at": 0, "version": 1})
    hc.update_node("n1", {"label": "Y", "attributes": {"a": "1"},
                          "embeddings": None, "node_type": None})
    assert hc.nodes["n1"]["label"] == "X"
    assert hc.nodes["n1"]["version"] == 2

    # manual: error
    mn = IncrementalGraphManager(
        IncrementalConfig(conflict_resolution="manual"))
    mn._add_node({"id": "n1", "label": "X", "node_type": "entity",
                  "attributes": {}, "embeddings": None, "created_at": 0,
                  "updated_at": 0, "version": 1})
    with pytest.raises(RuntimeError, match="Manual conflict"):
        mn.update_node("n1", {"label": "Y", "attributes": None,
                              "embeddings": None, "node_type": None})


def test_update_missing_node_adds_it():
    m = IncrementalGraphManager()
    m.update_node("fresh", {"label": "L", "attributes": {"k": "v"},
                            "embeddings": None, "node_type": None})
    assert m.nodes["fresh"]["version"] == 1


def test_add_edge_requires_endpoints():
    m = IncrementalGraphManager()
    m._add_node({"id": "a", "label": "A", "node_type": "entity",
                 "attributes": {}, "embeddings": None, "created_at": 0,
                 "updated_at": 0, "version": 1})
    with pytest.raises(KeyError, match="Node not found"):
        m.add_edge("a", "missing", {"edge_type": "related",
                                    "weight": 0.5})


def test_rollback_add_node_inverse():
    m = IncrementalGraphManager()
    m._add_node({"id": "n1", "label": "A", "node_type": "entity",
                 "attributes": {}, "embeddings": None, "created_at": 0,
                 "updated_at": 0, "version": 1})
    v1 = m.record_external_update("batch_update", [], [])
    m._add_node({"id": "n2", "label": "B", "node_type": "entity",
                 "attributes": {}, "embeddings": None, "created_at": 0,
                 "updated_at": 0, "version": 1})
    m.record_external_update("add_node", ["n2"], [])
    assert m.stats()["node_count"] == 2
    m.rollback(v1)
    assert m.stats()["node_count"] == 1
    assert "n2" not in m.nodes
    assert m.stats()["update_count"] == 1
    with pytest.raises(KeyError, match="Version not found"):
        m.rollback("nope")


def test_history_cap_drains_oldest_100():
    m = IncrementalGraphManager()
    for _ in range(1001):
        m.record_external_update("batch_update", [], [])
    assert m.stats()["update_count"] == 901
