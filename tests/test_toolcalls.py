"""Agent-tool kernel tests (`function_calling/functions.rs:11-874`,
`inference.rs:29-402` semantics) on hand-built graphs."""

import pyarrow as pa

from graphrag_rs_ray.functions.toolcalls import (
    InferenceConfig,
    entities_near_pattern,
    evidence_score,
    extract_entity_name,
    fuzzy_name_match,
    infer_relationships,
    proximity_score,
    resolver_find,
    tool_entity_expand,
    tool_get_entity_context,
    tool_graph_search,
    tool_relationship_traverse,
    validate_tool_args,
)
from graphrag_rs_ray.pipelines.tools import build_tool_graph


def _graph():
    ents = pa.table({
        "entity_id": ["PERSON_alice_smith", "PERSON_bob_jones",
                      "PERSON_carol_smith", "ORGANIZATION_acme"],
        "name": ["Alice Smith", "Bob Jones", "Carol Smith", "Acme"],
        "type": ["PERSON", "PERSON", "PERSON", "ORGANIZATION"],
        "conf": [0.9, 0.8, 0.85, 0.7],
        "mention_count": [5, 3, 2, 4],
    })
    tris = pa.table({
        "subj": ["PERSON_alice_smith", "PERSON_bob_jones",
                 "PERSON_alice_smith"],
        "pred": ["KNOWS", "WORKS_AT", "WORKS_AT"],
        "obj": ["PERSON_bob_jones", "ORGANIZATION_acme",
                "ORGANIZATION_acme"],
        "conf": [0.9, 0.8, 0.7],
    })
    mentions = pa.table({
        "chunk_id": ["c1", "c1", "c2", "c2", "c3"],
        "doc_id": ["d1", "d1", "d1", "d1", "d2"],
        "entity_id": ["PERSON_alice_smith", "PERSON_bob_jones",
                      "PERSON_alice_smith", "ORGANIZATION_acme",
                      "PERSON_carol_smith"],
        "conf": [0.9, 0.8, 0.9, 0.7, 0.85],
    })
    chunks = pa.table({
        "chunk_id": ["c1", "c2", "c3"],
        "doc_id": ["d1", "d1", "d2"],
        "text": ["alice smith and bob jones were best friends on the "
                 "journey",
                 "alice smith worked at acme together with the partner",
                 "carol smith stayed home"],
    })
    return build_tool_graph(ents, tris, mentions, chunks)


# -------------------------------------------------------- resolution --


def test_fuzzy_name_match():
    # single query word: prefix either way
    assert fuzzy_name_match("Alice Smith", "Ali")
    assert fuzzy_name_match("Al", "Alice")
    # last-name equality
    assert fuzzy_name_match("Alice Smith", "Carol Smith")
    # edit distance ≤ max(min_len//4, 1)
    assert fuzzy_name_match("Alice Smith", "Alice Smyth")
    assert not fuzzy_name_match("Alice Smith", "Bob Jones Qx")


def test_resolver_order():
    g = _graph()
    assert resolver_find(g["entities"], "alice smith")["name"] == \
        "Alice Smith"
    # contains: 'Smith' hits Alice first in name-asc order
    assert resolver_find(g["entities"], "Smith")["name"] == "Alice Smith"
    assert resolver_find(g["entities"], "totally unknown zz") is None


def test_extract_entity_name():
    assert extract_entity_name("PERSON_alice_smith") == "alice smith"
    assert extract_entity_name("noprefix") == "noprefix"


# ------------------------------------------------------------- tools --


def test_graph_search_phases():
    g = _graph()
    rows = tool_graph_search({"entity_name": "Alice Smith", "limit": 10}, g)
    assert rows[0]["relevance_score"] == 1.0
    assert rows[0]["id"] == "PERSON_alice_smith"
    # 'Smith' contains-matches both Smiths at 0.8
    rows = tool_graph_search({"entity_name": "Smith", "limit": 10}, g)
    ids = {r["id"] for r in rows if r["relevance_score"] == 0.8}
    assert ids == {"PERSON_alice_smith", "PERSON_carol_smith"}
    # limit gates the later phases
    rows = tool_graph_search({"entity_name": "Smith", "limit": 1}, g)
    assert len(rows) == 1


def test_entity_expand():
    g = _graph()
    rows = tool_entity_expand({"entity_id": "PERSON_alice_smith",
                               "limit": 20}, g)
    assert len(rows) == 2
    dirs = {(r["relationship_type"], r["direction"]) for r in rows}
    assert dirs == {("KNOWS", "outgoing"), ("WORKS_AT", "outgoing")}
    err = tool_entity_expand({"entity_id": "NOPE", "limit": 5}, g)
    assert err == "Entity with id 'NOPE' not found"


def test_traverse_single_path_quirk():
    g = _graph()
    res = tool_relationship_traverse(
        {"source_entity": "Alice Smith", "target_entity": "Bob Jones",
         "max_hops": 3}, g)
    # the visited-set DFS returns at most one non-trivial path
    assert len(res) == 1
    assert res[0]["path"][0] == "PERSON_alice_smith"
    assert res[0]["path"][-1] == "PERSON_bob_jones"
    same = tool_relationship_traverse(
        {"source_entity": "Alice Smith", "target_entity": "alice smith",
         "max_hops": 3}, g)
    assert same == [{"path": ["PERSON_alice_smith"], "length": 0,
                     "rel_types": []}]
    err = tool_relationship_traverse(
        {"source_entity": "zzz", "target_entity": "Bob Jones",
         "max_hops": 3}, g)
    assert "not found" in err


def test_entity_context():
    g = _graph()
    res = tool_get_entity_context(
        {"entity_id": "PERSON_alice_smith", "limit": 1}, g)
    assert [c["chunk_id"] for c in res["chunks"]] == ["c1"]   # limit 1
    assert len(res["mentions"]) == 2
    assert res["mentions"][0]["chunk_id"] == "c1"
    assert isinstance(
        tool_get_entity_context({"entity_id": "NOPE", "limit": 5}, g), str)


# -------------------------------------------------------- validation --


def test_validate_tool_args():
    assert validate_tool_args("graph_search", {"entity_name": "x"}) == ""
    assert "must be a string" in validate_tool_args("graph_search", {})
    assert "between 1 and 100" in validate_tool_args(
        "graph_search", {"entity_name": "x", "limit": 0})
    assert "between 1 and 5" in validate_tool_args(
        "entity_expand", {"entity_id": "x", "depth": 9})
    assert "PARAMETER ERROR: Use" in validate_tool_args(
        "relationship_traverse",
        {"entity_id_1": "a", "source_entity": "a", "target_entity": "b"})
    assert "'max_hops' must be between" in validate_tool_args(
        "relationship_traverse",
        {"source_entity": "a", "target_entity": "b", "max_hops": 0})
    assert "between 1 and 50" in validate_tool_args(
        "get_entity_context", {"entity_id": "x", "limit": 51})
    assert validate_tool_args("infer_relationships", {}) == \
        "entity_name is required"


# --------------------------------------------------------- inference --


def test_proximity_and_near_pattern():
    assert proximity_score("alice met bob", "alice", "bob") == 0.4
    assert proximity_score("alice " + "x " * 8 + "bob", "alice", "bob") == 0.2
    assert proximity_score("alice only", "alice", "bob") == 0.0
    assert entities_near_pattern("alice and bob were best friends",
                                 "alice", "bob", "best friend")
    assert not entities_near_pattern("no pattern here", "a", "b", "friend")


def test_evidence_score_components():
    text = "alice smith and bob jones were best friends on the journey"
    s = evidence_score(text, "PERSON_alice_smith", "PERSON_bob_jones")
    # base 0.2 + proximity + several positive patterns, clamped ≤ 1
    assert 0.5 < s <= 1.0
    neg = evidence_score("alice smith hated bob jones the enemy",
                         "PERSON_alice_smith", "PERSON_bob_jones")
    assert neg < s
    fam = evidence_score("alice smith and her brother bob jones friends",
                         "PERSON_alice_smith", "PERSON_bob_jones")
    raw = evidence_score("alice smith and her buddy bob jones friends",
                         "PERSON_alice_smith", "PERSON_bob_jones")
    assert fam < raw     # family damper ×0.8


def test_infer_relationships():
    g = _graph()
    res = infer_relationships("PERSON_alice_smith", "FRIEND", g)
    targets = [r["target"] for r in res]
    assert "PERSON_bob_jones" in targets
    top = res[0]
    assert top["relation_type"] == "FRIEND"
    assert 0.3 <= top["confidence"] <= 1.0
    assert top["evidence_count"] == 2      # alice appears in c1, c2
    assert infer_relationships("NOPE", "FRIEND", g) == []
    strict = infer_relationships("PERSON_alice_smith", "FRIEND", g,
                                 InferenceConfig(min_confidence=0.99))
    assert all(r["confidence"] >= 0.99 for r in strict)
