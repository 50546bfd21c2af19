"""Answer-generation kernels vs the reference's own tests
(``generation/mod.rs:1049-1101``) plus branch-coverage gates for the
pinned quirks."""

import pytest

from graphrag_rs_ray.functions.generation import (
    AnswerContext,
    AnswerGenerator,
    GenerationConfig,
    MockLLM,
    PromptTemplate,
    extract_sentences,
    format_with_citations,
    get_quality_assessment,
)


def test_mock_llm_creation():
    # :1057-1060
    llm = MockLLM()
    assert llm.response_templates["default"].startswith("Based on")


def test_prompt_template():
    # :1062-1074
    template = PromptTemplate("Hello {name}, how are you?")
    assert "name" in template.variables
    assert template.fill({"name": "World"}) == "Hello World, how are you?"


def test_prompt_template_missing_variable():
    template = PromptTemplate("Hi {a} and {b}")
    with pytest.raises(ValueError, match="'b' not provided"):
        template.fill({"a": "x"})


def test_answer_context():
    # :1076-1084
    context = AnswerContext()
    assert context.confidence_score == 0.0
    assert context.source_count == 0
    assert context.get_combined_content() == ""


def test_answer_generator_creation():
    # :1086-1091
    gen = AnswerGenerator()
    assert set(gen.prompt_templates) == {"qa", "summary", "extractive"}


def _results(scores_types):
    return [{"id": f"r{i}", "content": f"Sentence about topic {i}. More "
             f"detail here {i}.", "score": s, "result_type": t,
             "entities": [f"Topic{i}"]}
            for i, (s, t) in enumerate(scores_types)]


def test_assemble_context_categorization():
    gen = AnswerGenerator()
    results = _results([(0.9, "chunk"), (0.8, "summary"), (0.5, "chunk"),
                        (0.2, "chunk"), (0.75, "entity")])
    ctx = gen.assemble_context(results, [])
    # 0.9 chunk + 0.75 entity are primary; 0.8 summary-type falls to
    # supporting (type gate); 0.5 supporting; 0.2 dropped
    assert [r["score"] for r in ctx.primary_chunks] == [0.9, 0.75]
    assert [r["score"] for r in ctx.supporting_chunks] == [0.8, 0.5]
    # entities collected from ALL results incl. the dropped one, sorted
    assert ctx.entities == ["Topic0", "Topic1", "Topic2", "Topic3",
                            "Topic4"]


def test_insufficient_context_short_circuit():
    gen = AnswerGenerator()
    results = _results([(0.1, "chunk"), (0.05, "chunk")])
    ans = gen.generate_answer("what is this?", results, [])
    assert ans["answer_text"].startswith("Insufficient information")
    assert ans["confidence_score"] == ans["context_quality"] == 0.0


def test_hybrid_falls_back_on_short_extractive():
    # a context whose extractive answer is the "No directly relevant…"
    # string reroutes hybrid to the abstractive path
    gen = AnswerGenerator(config=GenerationConfig(mode="hybrid"))
    results = [{"id": "r0", "content": "zzz qqq vvv", "score": 0.9,
                "result_type": "chunk", "entities": []}]
    ans = gen.generate_answer("completely unrelated interrogative",
                              results, [])
    assert ans["mode_used"] == "hybrid"
    assert ans["answer_text"]   # non-empty, no crash


def test_extractive_scoring_quirks():
    llm = MockLLM()
    # suffix words score; single-char sentence words fire the partial
    # match for >4-char query words ("word ⊃ sentence-word" direction)
    out = llm.generate_extractive_answer(
        "a b c. topic sentence here.", "information")
    assert "(relevance:" in out or "(low confidence:" in out


def test_contextual_response_branches():
    llm = MockLLM()
    ctx = "The guardian met a companion near the settlement."
    who = llm.generate_contextual_response(ctx, "who is the friend?")
    assert who.startswith("Based on the context, the main characters")
    assert "guardian, companion" in who
    where = llm.generate_contextual_response(ctx, "where is it?")
    assert where == ("The story takes place in locations such as: "
                     "settlement")
    fallback = llm.generate_contextual_response(
        "Alpha beta. Gamma delta.", "none of the patterns")
    assert fallback == ("Based on the available context: "
                        "Alpha beta Gamma delta")


def test_question_response_canned():
    llm = MockLLM()
    assert llm.generate_question_response(
        "who are entity friends?").startswith("Entity Name's main")
    assert llm.generate_question_response(
        "tell me about the guardian").startswith("Guardian Entity")
    assert llm.generate_question_response(
        "what was the main activity?").startswith("The main activity")
    assert llm.generate_question_response("when?").startswith(
        "I need more specific")


def test_generate_summary_budget():
    llm = MockLLM()
    s = llm.generate_summary("One two. Three four. Five six. Seven.", 12)
    assert s == "One two"          # second sentence would exceed 12
    assert llm.generate_summary("", 100) == ""


def test_sentence_extraction():
    assert extract_sentences("Hi there. What? Ok!tail") == [
        "Hi there", "What", "Ok", "tail"]
    assert extract_sentences("...") == []


def test_citation_format_and_quality():
    ans = {"answer_text": "The answer.",
           "confidence_score": 0.87,
           "sources": [{"id": 1, "content_type": "chunk",
                        "source_id": "d1", "confidence": 0.9,
                        "snippet": "snip"}],
           "entities_mentioned": [], "mode_used": "hybrid",
           "context_quality": 0.62}
    txt = format_with_citations(ans)
    assert "\n\nSources:\n[1] chunk (confidence: 0.90) - snip" in txt
    assert txt.endswith("Overall confidence: 0.87")
    q = get_quality_assessment(ans)
    assert q == ("Confidence: High | Sources: Moderately sourced | "
                 "Context Quality: 0.62")
