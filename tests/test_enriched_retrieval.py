"""Enriched metadata-aware retrieval (``retrieval/enriched.rs``) —
kernel gates including the reference's own test cases and the
dead-code structure-mention quirk."""

import pytest

from graphrag_rs_ray.functions.enriched_retrieval import (
    EnrichedRetrievalConfig,
    boost_with_metadata,
    completeness_from_row,
    count_keyword_matches,
    extract_structure_references,
    filter_by_structure,
    matches_query,
    metadata_boost,
    query_words,
    search_by_keywords,
    structure_boost_raw,
)


def test_query_words_len_gate():
    # only words LONGER than 3 chars survive (enriched.rs:74-79)
    assert query_words("the data in a big model") == {"data", "model"}


def test_keyword_matching():
    # enriched.rs:449-459 (reference's own test)
    kws = ["machine", "learning", "neural"]
    assert count_keyword_matches(kws, {"machine", "learning"}) == 2
    # case-insensitive on the chunk side
    assert count_keyword_matches(["Machine"], {"machine"}) == 1


def test_structure_extraction():
    # enriched.rs:461-468 + first-match-per-pattern semantics
    refs = extract_structure_references(
        "what does socrates say in chapter 1?")
    assert refs == ["chapter 1"]
    refs = extract_structure_references(
        "chapter 2 then chapter 9 and section 3.1 of part iv")
    assert refs == ["chapter 2", "section 3.1", "part iv"]
    # the uppercase "direct mentions" loop never fires on lowered text
    assert extract_structure_references("introduction conclusion") == []


def test_structure_boost_and_matches_query():
    refs = ["chapter 1", "section 2.1"]
    b = structure_boost_raw("Chapter 1: Intro", "Section 2.1", None, refs)
    # chapter contains 'chapter 1' (+0.5); section contains
    # 'section 2.1' (+0.3) — each ref checked against every field
    assert b == pytest.approx(0.8)
    assert structure_boost_raw(None, None, None, refs) == 0.0
    # ≥ max(|qw|/2, 1) containment
    assert matches_query("data model summary", {"data", "model"})
    assert not matches_query("nothing here", {"data", "model", "graph"})
    assert matches_query("data only", {"data"})


def test_completeness_mapping():
    # chapter counts 2/9 (chapter + heading_path); topic never set
    full = completeness_from_row("c", "s", "ss", ["k"], "sum", 1, 0.5)
    assert full == pytest.approx(8 / 9)
    assert completeness_from_row(None, None, None, [], None, None,
                                 None) == 0.0
    assert completeness_from_row("c", None, None, ["k"], "s", 1,
                                 0.5) == pytest.approx(6 / 9)


def test_metadata_boost_stack():
    cfg = EnrichedRetrievalConfig()
    qw = {"data", "model", "chapter"}
    refs = ["chapter 2"]
    row = {"chapter": "Chapter 2", "section": None, "subsection": None,
           "keywords": ["data", "graph"], "summary": "data model notes",
           "structural_level": 1, "position_in_document": 0.0}
    # keyword: 1/3·0.3; structure: 0.5·0.2; summary ≥1 hit? needs
    # max(3//2,1)=1... 'data' and 'model' both hit → +0.15;
    # completeness = (2+1+1+1+1)/9 = 6/9 < 0.7 → no bonus
    b = metadata_boost(row, qw, refs, cfg)
    assert b == pytest.approx((1 / 3) * 0.3 + 0.5 * 0.2 + 0.15)
    # below the 0.05 significance gate nothing would be emitted
    empty = {"chapter": None, "section": None, "subsection": None,
             "keywords": [], "summary": None, "structural_level": None,
             "position_in_document": None}
    assert metadata_boost(empty, qw, [], cfg) == 0.0


def test_search_by_keywords():
    chunks = [("c1", ["Machine", "learning"]), ("c2", ["learning"]),
              ("c3", ["other"])]
    out = search_by_keywords(["machine", "learning"], chunks, top_k=5)
    assert out[0] == ("c1", pytest.approx(1.0))
    assert out[1] == ("c2", pytest.approx(0.5))
    assert len(out) == 2
    assert search_by_keywords(["machine"], chunks, top_k=1) == [
        ("c1", pytest.approx(1.0))]


def test_boost_with_metadata_and_filter():
    meta = {"c1": {"keywords": ["data"], "chapter": "chapter 1",
                   "section": None},
            "c2": {"keywords": [], "chapter": "chapter 9",
                   "section": None}}
    out = boost_with_metadata([("c1", 0.5), ("c2", 0.9)], meta,
                              "data in chapter 1")
    got = dict(out)
    # c1: +1/2·0.2 keyword ('data' of {'data','chapter'}), +0.15 chapter
    assert got["c1"] == pytest.approx(min(0.5 + 0.1 + 0.15, 1.0))
    assert got["c2"] == 0.9
    # filter keeps matching chunks and chunks WITHOUT metadata
    kept = filter_by_structure(["c1", "c2", "c3"], meta, "chapter 1?")
    assert kept == ["c1", "c3"]
    # no refs in query → passthrough
    assert filter_by_structure(["c2"], meta, "plain query") == ["c2"]
