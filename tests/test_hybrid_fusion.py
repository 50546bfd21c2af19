"""Hybrid fusion kernels (``retrieval/hybrid.rs:230-427``) — hand
shortlists, all four methods, and the reference's default-RRF
zero-result quirk."""

import pytest

from graphrag_rs_ray.functions.hybrid_fusion import (
    HybridFusionConfig,
    fuse_shortlists,
)

SEM = [("entity:E1", 0.9, "entity:E1"),      # semantic content = the id
       ("chunk:C1", 0.6, "chunk:C1"),
       ("entity:E2", 0.4, "entity:E2")]
KW = [("chunk:C1", 5.0, "c1 text"),
      ("entity:E1", 2.5, "Alpha ORGANIZATION"),
      ("chunk:C2", 1.0, "c2 text")]


def _by_id(rows):
    return {r[0]: r for r in rows}


def test_rrf_default_threshold_returns_nothing():
    # max possible RRF score = (0.7 + 0.3)/61 ≈ 0.016 < the default
    # min_score_threshold 0.1 (hybrid.rs:66-78 defaults) — pinned quirk
    assert fuse_shortlists(SEM, KW, "rrf", HybridFusionConfig()) == []


def test_rrf_scores_and_content_overwrite():
    cfg = HybridFusionConfig(min_score_threshold=0.0)
    rows = _by_id(fuse_shortlists(SEM, KW, "rrf", cfg))
    # E1: sem rank 0, kw rank 1
    assert rows["entity:E1"][2] == pytest.approx(
        round(0.7 / 61.0 + 0.3 / 62.0, 8))
    # keyword content overwrites the semantic id-as-content
    assert rows["entity:E1"][1] == "Alpha ORGANIZATION"
    # semantic-only entry keeps the id as content, keyword_score 0
    assert rows["entity:E2"][1] == "entity:E2"
    assert rows["entity:E2"][4] == 0.0
    # keyword-only entry: semantic_score 0
    assert rows["chunk:C2"][3] == 0.0
    # result_type / entities / source_chunks columns
    assert rows["entity:E1"][5] == "entity"
    assert rows["entity:E1"][6] == "Alpha ORGANIZATION"
    assert rows["chunk:C1"][5] == "chunk" and rows["chunk:C1"][6] == ""
    assert rows["chunk:C1"][7] == "chunk:C1"


def test_weighted_max_normalization():
    rows = _by_id(fuse_shortlists(SEM, KW, "weighted",
                                  HybridFusionConfig()))
    # E1: (0.9/0.9)·0.7 + (2.5/5.0)·0.3 = 0.85
    assert rows["entity:E1"][2] == pytest.approx(0.85)
    # C1: (0.6/0.9)·0.7 + (5.0/5.0)·0.3
    assert rows["chunk:C1"][2] == pytest.approx(
        round((0.6 / 0.9) * 0.7 + 0.3, 8))
    # non-positive max → all-zero normalization, thresholded away
    neg = [("entity:X", -0.5, "entity:X")]
    assert fuse_shortlists(neg, [], "weighted", HybridFusionConfig()) == []


def test_combsum_raw_addition():
    rows = _by_id(fuse_shortlists(SEM, KW, "combsum",
                                  HybridFusionConfig()))
    assert rows["chunk:C1"][2] == pytest.approx(5.6)
    assert rows["entity:E1"][2] == pytest.approx(3.4)
    assert rows["chunk:C2"][2] == pytest.approx(1.0)


def test_maxscore_semantics():
    rows = _by_id(fuse_shortlists(SEM, KW, "maxscore",
                                  HybridFusionConfig()))
    assert rows["entity:E1"][2] == 2.5          # max(0.9, 2.5)
    assert rows["chunk:C1"][2] == 5.0
    assert rows["entity:E2"][2] == 0.4          # semantic-only keeps score
    # keyword applies max against the 0.0 default entry — a negative
    # keyword score on a keyword-only entry clamps to 0 (hybrid.rs:365)
    got = fuse_shortlists([], [("chunk:CX", -1.0, "x")], "maxscore",
                          HybridFusionConfig(min_score_threshold=-5.0))
    assert _by_id(got)["chunk:CX"][2] == 0.0


def test_sort_and_truncate():
    cfg = HybridFusionConfig(min_score_threshold=0.0, limit=2)
    rows = fuse_shortlists(SEM, KW, "combsum", cfg)
    assert [r[0] for r in rows] == ["chunk:C1", "entity:E1"]
    scores = [r[2] for r in fuse_shortlists(SEM, KW, "combsum",
                                            HybridFusionConfig())]
    assert scores == sorted(scores, reverse=True)
