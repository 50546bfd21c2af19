"""Selective cache invalidation planner
(``graph/incremental.rs:460-618``)."""

from graphrag_rs_ray.state.invalidation import (
    CacheRegion, ChangeRecord, Regional, Relational, Selective,
    SelectiveInvalidation)


def _mgr():
    m = SelectiveInvalidation()
    m.register_cache_region(CacheRegion("r1", entity_ids={"e1", "e2"}))
    m.register_cache_region(CacheRegion("r2", entity_ids={"e2", "e3"}))
    return m


def test_entity_change_relational_plus_regional():
    m = _mgr()
    out = m.invalidate_for_changes(
        [ChangeRecord("entity_updated", entity_id="e2")])
    assert Relational("e2", 2) in out
    # e2 belongs to both regions → both invalidated
    assert Regional("r1") in out and Regional("r2") in out
    assert len(out) == 3


def test_relationship_change_invalidates_both_endpoints_depth1():
    m = _mgr()
    out = m.invalidate_for_changes(
        [ChangeRecord("relationship_added", source="a", target="b")])
    assert out == [Relational("a", 1), Relational("b", 1)]


def test_document_and_embedding_changes_selective_keys():
    m = _mgr()
    out = m.invalidate_for_changes([
        ChangeRecord("document_updated", document_id="d7"),
        ChangeRecord("embedding_added", entity_id="e9"),
    ])
    assert out == [
        Selective(("document:d7", "document_chunks:d7")),
        Selective(("embedding:e9", "similarity:e9")),
    ]


def test_stats_and_log():
    m = _mgr()
    m.invalidate_for_changes([ChangeRecord("entity_added", entity_id="e1")])
    m.invalidate_for_changes(
        [ChangeRecord("relationship_removed", source="x", target="y")])
    s = m.get_invalidation_stats()
    assert s["total_invalidations"] == 4        # rel(2)+regional, then 2 rel
    assert s["cache_regions"] == 2 and s["entity_mappings"] == 3
    assert s["last_invalidation"] == 4


def test_unknown_entity_no_regional():
    m = _mgr()
    out = m.invalidate_for_changes(
        [ChangeRecord("entity_removed", entity_id="ghost")])
    assert out == [Relational("ghost", 2)]
