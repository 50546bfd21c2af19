"""ROGRAG streaming/synthesis kernels vs the reference's own tests
(``rograg/streaming.rs:1010-1144``) plus quirk gates."""

import math

from graphrag_rs_ray.functions.rograg_streaming import (
    StreamingConfig,
    build_response,
    clean_content,
    determine_template_type,
    generate_streaming_chunks,
    select_template,
    synthesize,
)


def _results():
    # :1015-1035 create_test_subquery_results
    return [
        {"subquery": "What is Entity Name?", "result_type": "logic_form",
         "confidence": 0.9,
         "content": "Entity Name is a young boy character",
         "sources": ["source1"]},
        {"subquery": "Who is Second Entity?",
         "result_type": "fuzzy_match", "confidence": 0.8,
         "content": "Second Entity is Tom's friend",
         "sources": ["source2"]},
    ]


def _intent():
    return {"primary_intent": "factual", "confidence": 0.85}


def test_synthesis_weighted():
    # :1058-1070
    s = synthesize(_results(), "weighted")
    assert s["content"]
    assert s["confidence"] > 0.0
    assert len(s["sources"]) == 2
    # sqrt(mean of squared confidences)
    assert math.isclose(s["confidence"],
                        math.sqrt((0.9 ** 2 + 0.8 ** 2) / 2))


def test_synthesis_best_only():
    # :1074-1087
    s = synthesize(_results(), "best_only")
    assert s["content"] == "Entity Name is a young boy character"
    assert s["confidence"] == 0.9


def test_synthesis_best_only_last_max_tie():
    rs = _results()
    rs[1]["confidence"] = 0.9      # tie → LAST maximal (Rust max_by)
    s = synthesize(rs, "best_only")
    assert s["content"] == "Second Entity is Tom's friend"


def test_synthesis_smart_merge_prefers_logic_in_input_order():
    rs = _results() + [{"subquery": "x", "result_type": "logic_form",
                        "confidence": 0.1, "content": "Low conf logic",
                        "sources": ["source3"]}]
    s = synthesize(rs, "smart_merge")
    # logic rows in INPUT order (no sort), take 2; conf = mean of ALL
    # preferred rows
    assert s["content"] == ("Entity Name is a young boy character. "
                            "Low conf logic")
    assert math.isclose(s["confidence"], (0.9 + 0.1) / 2)


def test_synthesis_hierarchical():
    s = synthesize(_results(), "hierarchical")
    assert s["content"] == ("Entity Name is a young boy character. "
                            "Additionally: Second Entity is Tom's "
                            "friend")
    assert s["confidence"] == 0.9


def test_response_building():
    # :1089-1104
    resp = build_response("What is Entity Name?", _results(), _intent())
    assert resp["content"]
    assert resp["confidence"] > 0.0
    assert resp["sources"] == ["source1", "source2"]
    assert resp["template_type"] == "factual"
    assert resp["content"].startswith("Based on the available "
                                      "information, ")
    assert "\n\nSources: [1] source1, [2] source2" in resp["content"]


def test_template_selection():
    # :1108-1126 + the Causal/Temporal no-template fallback quirk
    assert select_template("factual")[0] == "factual"
    assert select_template("causal") == (
        "fallback", "Based on the available information: {content}")
    assert select_template("temporal")[0] == "fallback"
    assert determine_template_type("exploratory", 1) == "summary"
    assert determine_template_type("ambiguous", 2) == "summary"
    assert determine_template_type("ambiguous", 1) == "fallback"


def test_streaming_chunks():
    # :1129-1143
    resp = build_response("Test query", _results(), _intent())
    chunks = generate_streaming_chunks(resp)
    assert chunks
    assert chunks[-1]["is_final"]
    cfg = StreamingConfig(chunk_size=3)
    small = generate_streaming_chunks(resp, cfg)
    assert len(small) > 1
    assert all(not c["is_final"] for c in small[:-1])
    assert small[-1]["is_final"]


def test_clean_content():
    assert clean_content("a  b {left}  ") == "a b."
    assert clean_content("done!") == "done!"
    assert clean_content("") == ""
