"""LLM evaluation framework (evaluation/mod.rs) — ports the reference's
own tests (mod.rs:434-539) plus the deterministic fake-LLM loop."""

import pytest

from graphrag_rs_ray.functions.evaluation import (
    build_result,
    deterministic_scores,
    fake_llm_evaluation_response,
    format_chunks,
    generate_prompt,
    parse_evaluation,
    passes_threshold,
    report,
    weakest_dimension,
)


def test_prompt_generation():
    # mod.rs:435-461 (test_prompt_generation)
    result = build_result(
        query="Who is Alice?",
        answer="Alice is a person mentioned in the context.",
        entities=[{"name": "Alice", "entity_type": "person",
                   "confidence": 0.9}],
        chunks=["Alice works at Stanford."],
        retrieval_strategy="semantic")
    generated = generate_prompt(result)
    assert "Who is Alice?" in generated
    assert "Alice is a person" in generated
    assert "Alice (type: person" in generated
    assert generated.endswith("Evaluate now:")
    # counts come from the full lists; empty lists hit the fallbacks
    assert "### Entities (1 total)" in generated
    assert "No relationships retrieved." in generated


def test_builder_requires_query_and_answer():
    # mod.rs:397-403
    with pytest.raises(ValueError):
        build_result(query="", answer="x")
    with pytest.raises(ValueError):
        build_result(query="q", answer="")


def test_evaluation_parsing_and_threshold():
    # mod.rs:464-495 (test_evaluation_parsing)
    json_str = """{
        "relevance": {"score": 5, "reasoning": "Perfectly answers"},
        "faithfulness": {"score": 4, "reasoning": "Mostly grounded"},
        "completeness": {"score": 4, "reasoning": "Covers main points"},
        "coherence": {"score": 5, "reasoning": "Well structured"},
        "groundedness": {"score": 5, "reasoning": "All accurate"},
        "overall_score": 4.6,
        "summary": "High quality answer"
    }"""
    ev = parse_evaluation(json_str)
    assert ev["relevance"]["score"] == 5
    assert ev["faithfulness"]["score"] == 4
    assert passes_threshold(ev, 4.0)
    assert not passes_threshold(ev, 5.0)
    with pytest.raises(ValueError):
        parse_evaluation("not json")
    with pytest.raises(ValueError):
        parse_evaluation('{"relevance": {"score": 5}}')


def test_weakest_dimension():
    # mod.rs:498-513 — and first-of-equal-minima tie rule
    ev = parse_evaluation("""{
        "relevance": {"score": 5, "reasoning": "Perfect"},
        "faithfulness": {"score": 3, "reasoning": "Some issues"},
        "completeness": {"score": 4, "reasoning": "Good"},
        "coherence": {"score": 5, "reasoning": "Excellent"},
        "groundedness": {"score": 4, "reasoning": "Accurate"},
        "overall_score": 4.2, "summary": "Good overall"}""")
    name, score = weakest_dimension(ev)
    assert name == "faithfulness" and score["score"] == 3
    tie = parse_evaluation("""{
        "relevance": {"score": 4, "reasoning": "a"},
        "faithfulness": {"score": 3, "reasoning": "b"},
        "completeness": {"score": 3, "reasoning": "c"},
        "coherence": {"score": 5, "reasoning": "d"},
        "groundedness": {"score": 3, "reasoning": "e"},
        "overall_score": 3.6, "summary": "s"}""")
    assert weakest_dimension(tie)[0] == "faithfulness"


def test_report_generation():
    # mod.rs:516-538 (test_report_generation)
    ev = parse_evaluation("""{
        "relevance": {"score": 5, "reasoning": "Perfect"},
        "faithfulness": {"score": 4, "reasoning": "Good"},
        "completeness": {"score": 4, "reasoning": "Complete"},
        "coherence": {"score": 5, "reasoning": "Clear"},
        "groundedness": {"score": 4, "reasoning": "Accurate"},
        "overall_score": 4.4, "summary": "Excellent answer"}""")
    rep = report(ev)
    assert "4.40" in rep
    assert "- Relevance:     5/5 - Perfect" in rep
    assert "Excellent answer" in rep
    assert rep.endswith("faithfulness: Good (score 4/5)\n")
    assert abs(ev["overall_score"] - 4.4) < 0.01


def test_chunk_preview_truncation():
    # mod.rs:207-226: >200 chars -> 200 + ellipsis; 1-based labels
    long = "x" * 250
    s = format_chunks([long, "short"])
    assert "Chunk 1:\n" + "x" * 200 + "..." in s
    assert "Chunk 2:\nshort" in s
    assert format_chunks([]) == "No context chunks retrieved."
    assert format_chunks([str(i) for i in range(9)]).count("Chunk ") == 5


def test_deterministic_fake_loop():
    result = build_result(query="q?", answer="a.",
                          retrieval_strategy="hybrid")
    prompt = generate_prompt(result)
    ev = parse_evaluation(fake_llm_evaluation_response(prompt, "hybrid"))
    scores = deterministic_scores(prompt)
    assert [ev[d]["score"] for d in ("relevance", "faithfulness",
                                     "completeness", "coherence",
                                     "groundedness")] == scores
    assert ev["overall_score"] == sum(scores) / 5.0
    assert all(1 <= s <= 5 for s in scores)
    # same prompt -> same response (pure function)
    assert (fake_llm_evaluation_response(prompt, "hybrid")
            == fake_llm_evaluation_response(prompt, "hybrid"))
