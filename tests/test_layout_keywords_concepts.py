"""Unit tests for layout parsers, TF-IDF keywords, summarizer, concepts."""

from graphrag_rs_ray.functions.concepts import extract_concepts, is_valid_concept
from graphrag_rs_ray.functions.keywords import summarize, tfidf_keywords, tfidf_tokenize
from graphrag_rs_ray.functions.layout import (
    detect_heading_level,
    find_section_containing_offset,
    heading_path,
    is_underline,
    parse_layout,
    parse_markdown_headings,
    parse_plaintext_headings,
)


def test_markdown_headings():
    md = "# Title\nbody text\n## Sub One\nmore\n### Deep\nend\n#not-a-heading\n"
    hs = parse_markdown_headings(md)
    assert [(h.level, h.text) for h in hs] == [(1, "Title"), (2, "Sub One"), (3, "Deep")]


def test_plaintext_underline_and_caps():
    # analysis.rs:282-299 and :41-51
    txt = "Chapter One\n===========\nsome body\nINTRODUCTION TO X\nmore body\n"
    hs = parse_plaintext_headings(txt)
    assert (1, "Chapter One") == (hs[0].level, hs[0].text)
    assert any(h.text == "INTRODUCTION TO X" and h.level == 1 for h in hs)
    assert is_underline("=====") == 1
    assert is_underline("-----") == 2
    assert is_underline("___") == 3
    assert is_underline("==-") is None
    assert detect_heading_level("## Proper md") == 2
    assert detect_heading_level("##bad") is None
    assert detect_heading_level("SHORT CAPS") == 1
    assert detect_heading_level("A MEDIUM LENGTH ALL CAPS LINE YES") == 2


def test_layout_factory_and_paths():
    md = "# A\nx\n## B\ny\n## C\nz\n"
    _, sections, roots = parse_layout(md, "md")
    assert roots == [0]
    idx = find_section_containing_offset(sections, md.index("y"))
    assert heading_path(sections, idx) == ["A", "B"]


def test_tfidf_tokenize_reference():
    # keyword_extraction.rs:69-86
    assert tfidf_tokenize("The Quick-Brown fox_1 123 ab") == ["quick-brown", "fox_1"]


def test_tfidf_scoring():
    df = {"graph": 1, "common": 10}
    kws = tfidf_keywords("graph graph common word", df, total_docs=10, top_k=2)
    assert kws[0][0] == "graph"           # rare term outranks common
    assert kws[0][1] > 0


def test_summarizer():
    text = ("Alice Johnson founded the company in 1995. "
            "The weather was mild that year. "
            "Revenue grew to 10 million by 2000 under Alice Johnson. "
            "Some filler sentence here with nothing. "
            "The final conclusion states the growth continued.")
    s = summarize(text, 150)
    assert 0 < len(s) <= 150
    assert s == summarize(text, 150)      # deterministic
    assert summarize("", 100) == ""
    assert summarize("One short sentence.", 100) == "One short sentence"


def test_concept_extraction():
    # lightrag/concept_graph.rs:162-194
    text = ("Machine Learning is part of Artificial Intelligence. "
            "machine learning appears again and again in learning systems.")
    cs = extract_concepts(text)
    assert "Machine Learning" in cs
    assert "Artificial Intelligence" in cs
    assert cs == sorted(set(cs))
    assert not is_valid_concept("of the and")   # mostly stopwords
    assert not is_valid_concept("ab")           # too short
