"""Syntax analyzer — semantics from ``nlp/syntax_analyzer.rs`` incl. its
own test expectations (``:583-599``)."""

from graphrag_rs_ray.functions.syntax import (
    ADJ,
    DET,
    NOUN,
    PROPN,
    extract_noun_phrases,
    lemmatize,
    parse_dependencies,
    pos_tag,
    tag_word,
    tokenize,
)


def test_pos_tagging_reference_case():
    tokens = pos_tag("The good brown fox jumps over the lazy dog.")
    assert tokens[0].pos == DET              # "The"
    assert tokens[1].pos == ADJ              # "good" (dictionary)
    assert tokens[3].pos in (NOUN, PROPN)    # "fox"
    assert any(t.text == "jumps" for t in tokens)
    assert tokens[-1].pos == "PUNCT"         # trailing period


def test_tokenizer():
    assert tokenize("don't stop-go!") == [("don't", 0), ("stop-go", 6), ("!", 13)]


def test_suffix_patterns_and_lemmas():
    assert tag_word("running") == "VBG"
    assert tag_word("walked") == "VBD"
    assert tag_word("cities") == "NNS"
    assert tag_word("beautiful") == ADJ
    assert tag_word("quickly") == "RB"
    assert tag_word("Paris") == PROPN
    assert tag_word("42") == "CD"
    assert lemmatize("cities", "NNS") == "city"
    assert lemmatize("walked", "VBD") == "walk"
    assert lemmatize("running", "VBG") == "runn"   # faithful naive strip


def test_dependencies():
    # only base-form dictionary verbs are recognized as verbs (inflected
    # forms fall through to the suffix patterns — the reference's own test
    # notes "jumps ... may be tagged as plural noun", :597)
    tokens = pos_tag("the cat go the fish")
    deps = parse_dependencies(tokens)
    rels = {(tokens[d].text, r, tokens[h].text) for h, d, r in deps}
    assert ("cat", "subject", "go") in rels
    assert ("fish", "object", "go") in rels
    assert parse_dependencies([]) == []


def test_noun_phrases():
    tokens = pos_tag("the old man go to a big dog")
    phrases = extract_noun_phrases(tokens)
    assert "the old man" in phrases
    assert "a big dog" in phrases
