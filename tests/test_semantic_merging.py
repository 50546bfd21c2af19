"""Semantic entity merging (``entity/semantic_merging.rs``) — the
reference's own test cases ported, plus grouping/decision/merge gates."""

import pytest

from graphrag_rs_ray.functions.semantic_merging import (
    combine_descriptions,
    group_mean_name_similarity,
    group_similar_entities,
    heuristic_merge_decision,
    merge_entities,
    select_best_name,
    semantic_similarity,
    string_similarity,
)


def _e(eid, name, typ, conf=0.9, mc=0):
    return {"entity_id": eid, "name": name, "type": typ, "conf": conf,
            "mention_count": mc}


def test_string_similarity():
    # semantic_merging.rs:497-504 (reference's own test)
    assert string_similarity("Apple", "Apple") == 1.0
    assert string_similarity("Apple Inc", "Apple Inc.") > 0.8   # contains
    assert string_similarity("Apple", "Microsoft") < 0.3
    # case-insensitive exact
    assert string_similarity("BERLIN", "berlin") == 1.0
    # word jaccard fallback
    assert string_similarity("alpha beta", "beta gamma") == pytest.approx(
        1 / 3)


def test_entity_grouping():
    # semantic_merging.rs:452-471: Apple Inc / Apple Inc. group together
    ents = [_e("e1", "Apple Inc", "ORGANIZATION"),
            _e("e2", "Apple Inc.", "ORGANIZATION"),
            _e("e3", "Microsoft", "ORGANIZATION")]
    groups = group_similar_entities(ents, 0.7)
    assert len(groups) == 1 and len(groups[0]) == 2
    assert {e["entity_id"] for e in groups[0]} == {"e1", "e2"}
    # cross-type pairs cap at 0.7 — never strictly above a 0.7 threshold
    assert semantic_similarity("Berlin", "LOCATION", "Berlin",
                               "PERSON") == pytest.approx(0.7)
    assert group_similar_entities(
        [_e("a", "Berlin", "LOCATION"), _e("b", "Berlin", "PERSON")],
        0.7) == []
    # star grouping, not transitive closure: the seed absorbs matches
    # in order; a later entity similar only to an absorbed member does
    # NOT join (processed set)
    ents2 = [_e("a", "Alpha Beta", "T"), _e("b", "Alpha Beta Co", "T"),
             _e("c", "Zeta", "T")]
    g2 = group_similar_entities(ents2, 0.7)
    assert [len(g) for g in g2] == [2]


def test_heuristic_merge_decision():
    # semantic_merging.rs:474-495
    ents = [_e("e1", "Apple Inc", "ORGANIZATION", 0.9),
            _e("e2", "Apple Inc.", "ORGANIZATION", 0.8)]
    d = heuristic_merge_decision(ents)
    assert d["should_merge"] and d["confidence"] > 0.8
    assert d["merged_name"] is not None
    assert d["reasoning"] == ("High name similarity (0.90) "
                              "and matching types")
    # low similarity → no merge, confidence 1 - sim
    d2 = heuristic_merge_decision([_e("a", "Alpha", "T"),
                                   _e("b", "Zeta", "T")])
    assert not d2["should_merge"] and d2["confidence"] == 1.0
    # type mismatch → hard no
    d3 = heuristic_merge_decision([_e("a", "X", "T1"), _e("b", "X", "T2")])
    assert not d3["should_merge"] and d3["confidence"] == 1.0
    assert d3["reasoning"] == "Different entity types"
    # singleton
    assert not heuristic_merge_decision([_e("a", "X", "T")])["should_merge"]


def test_select_best_name_and_descriptions():
    # longest name wins; conf tie-break; LAST maximal on full ties
    g = [_e("a", "Al", "T", 0.5), _e("b", "Albert", "T", 0.4),
         _e("c", "Berta1", "T", 0.6)]
    assert select_best_name(g) == "Berta1"      # same len, higher conf
    g2 = [_e("a", "Same1", "T", 0.5), _e("b", "Same2", "T", 0.5)]
    assert select_best_name(g2) == "Same2"      # last maximal
    d = combine_descriptions([_e("a", "X", "T", mc=2),
                              _e("b", "Y", "T", mc=0)])
    assert d == "Entity 'X' mentioned in context; Entity 'Y' of type T"


def test_merge_entities():
    # semantic_merging.rs:507-552
    ents = [_e("e1", "Apple Inc", "ORGANIZATION", 0.9, mc=1),
            _e("e2", "Apple Inc.", "ORGANIZATION", 0.8, mc=1)]
    decision = {"should_merge": True, "confidence": 0.9,
                "reasoning": "Test merge",
                "merged_name": "Apple Inc.",
                "merged_description": "Merged Apple entity"}
    m = merge_entities(ents, decision)
    assert m["name"] == "Apple Inc."
    assert m["entity_id"] == "e1"               # first entity's id kept
    assert m["mention_count"] == 2
    assert m["conf"] == pytest.approx(max((0.9 + 0.8) / 2, 0.9))
    # no-merge returns the first entity unchanged
    nod = dict(decision, should_merge=False)
    assert merge_entities(ents, nod)["entity_id"] == "e1"
    assert merge_entities(ents, nod)["name"] == "Apple Inc"


def test_group_mean_similarity():
    g = [_e("a", "Apple Inc", "T"), _e("b", "Apple Inc.", "T"),
         _e("c", "Apple", "T")]
    # pairs: (a,b)=0.9 contains, (a,c)=0.9, (b,c)=0.9 → mean 0.9
    assert group_mean_name_similarity(g) == pytest.approx(0.9)
    assert group_mean_name_similarity([_e("a", "X", "T")]) == 1.0
