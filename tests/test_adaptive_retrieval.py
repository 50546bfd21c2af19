"""Adaptive strategy selection (``retrieval/adaptive.rs`` +
``retrieval/mod.rs:600-683``) — analyzer classification, weight
selection, fusion truncation/dedup, diversity-aware selection."""

import pytest

from graphrag_rs_ray.functions.adaptive_retrieval import (
    AdaptiveConfig,
    StrategyWeights,
    analyze_query,
    diversity_aware_selection,
    select_strategy_weights,
    weight_and_fuse,
)

ENTS = ["Berlin", "Tokyo", "Alpha Corp"]


def test_analyze_query_types():
    # two mutual-substring entity hits → Relationship
    a = analyze_query("connections between berlin and tokyo", ENTS)
    assert a["query_type"] == "relationship"
    assert set(a["key_entities"]) == {"Berlin", "Tokyo"}
    # one entity → EntityFocused
    assert analyze_query("all about berlin",
                         ENTS)["query_type"] == "entity_focused"
    # abstract indicator (no entities) → Conceptual
    assert analyze_query("theory of justice",
                         [])["query_type"] == "conceptual"
    # question word → Exploratory
    assert analyze_query("how does it work", [])["query_type"] \
        == "exploratory"
    # otherwise → Factual
    assert analyze_query("revenue figures", [])["query_type"] == "factual"


def test_analyze_query_concepts_and_complexity():
    a = analyze_query("berlin trade routes", ENTS)
    # 'trade'/'routes' are >3-char non-stop non-entity-related concepts
    assert a["concepts"] == ["trade", "routes"]
    assert a["complexity_score"] == pytest.approx(
        min(3 * 0.1 + 1 * 0.3 + 2 * 0.2, 1.0))
    # intent detection
    assert analyze_query("overview of berlin", ENTS)["intent"] == "overview"
    assert analyze_query("compare things", [])["intent"] == "comparative"
    assert analyze_query("why so slow", [])["intent"] == "causal"
    assert analyze_query("when did it start", [])["intent"] == "temporal"


def test_select_strategy_weights():
    cfg = AdaptiveConfig()
    # high confidence → per-type table
    w = select_strategy_weights("entity_focused", 0.8, cfg)
    assert (w.vector_weight, w.graph_weight) == (0.2, 0.5)
    assert select_strategy_weights("conceptual", 0.7,
                                   cfg).bm25_weight == 0.0
    assert select_strategy_weights("factual", 0.9, cfg).bm25_weight == 0.6
    assert select_strategy_weights("relationship", 0.61,
                                   cfg).graph_weight == 0.6
    # exploratory and ANY low-confidence type → balanced complex weights
    assert select_strategy_weights("exploratory", 0.9,
                                   cfg).vector_weight == 0.25
    assert select_strategy_weights("entity_focused", 0.59,
                                   cfg).graph_weight == 0.25


def test_weight_and_fuse_truncation_and_dedup():
    cfg = AdaptiveConfig()
    lists = {
        "vector": [(f"c{i}", 1.0 - i * 0.1, "") for i in range(10)],
        "graph": [("c0", 0.5, ""), ("g1", 0.4, "")],
        "hierarchical": [("h1", 0.9, "")],
        "bm25": [("b1", 0.8, "")],
    }
    w = StrategyWeights(0.2, 0.5, 0.2, 0.1)     # entity weights
    fused, total = weight_and_fuse(lists, w, cfg)
    # trunc(10·w) rows per strategy: 2 + 5(only 2 exist) + 2 + 1
    assert total == 2 + 2 + 1 + 1
    d = dict((i, s) for i, s, _ in fused)
    # c0 appears in vector (1.0·0.2) and graph (0.5·0.5) → keep max 0.25
    assert d["c0"] == pytest.approx(0.25)
    # sorted desc
    scores = [s for _, s, _ in fused]
    assert scores == sorted(scores, reverse=True)
    # zero weight excludes the strategy entirely
    w0 = StrategyWeights(0.6, 0.1, 0.3, 0.0)    # conceptual
    fused0, _ = weight_and_fuse(lists, w0, cfg)
    assert all(i != "b1" for i, _, _ in fused0)


def test_diversity_aware_selection():
    rows = [("a", 0.9, "E1"), ("b", 0.7, "E1"), ("c", 0.6, "E1"),
            ("d", 0.5, "E2"), ("e", 0.4, "E1"), ("f", 0.3, "")]
    # max=4: 'a' (score>0.8 + new E1), 'b' (< max/2=2 slots),
    # 'c' rejected (no new entity, slot quota used), 'd' new E2,
    # then the fill pass appends 'c' back in score order
    got = diversity_aware_selection(rows, 4)
    assert [r[0] for r in got] == ["a", "b", "d", "c"]
    # small max (2): quota max//2=1 spent on 'a'; 'b'/'c' bring no new
    # entity → skipped; 'd' enters on the new-entity rule
    assert [r[0] for r in diversity_aware_selection(rows, 2)] == ["a", "d"]
    # max=6: quota 3 admits a/b/c; 'd' new entity; 'e' (E1 seen) and
    # 'f' (no entities → has_new false) only enter via the fill pass
    got6 = diversity_aware_selection(rows, 6)
    assert [r[0] for r in got6] == ["a", "b", "c", "d", "e", "f"]
