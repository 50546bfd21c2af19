"""Similarity-stack goldens taken from the reference's tests
(``string_similarity_linker.rs:471-621``)."""

from graphrag_rs_ray.functions.similarity import (
    LinkingConfig,
    compute_similarity,
    greedy_cluster,
    jaccard_similarity,
    jaro_winkler_similarity,
    levenshtein_distance,
    normalize_string,
    select_canonical_name,
    soundex,
)


def test_soundex_reference_goldens():
    # string_similarity_linker.rs:512-520
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Rubin") == "R150"
    assert soundex("Smith") == "S530"
    assert soundex("Smyth") == "S530"


def test_levenshtein_reference_goldens():
    # string_similarity_linker.rs:477-484
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("saturday", "sunday") == 3
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("same", "same") == 0


def test_normalization_reference_goldens():
    # string_similarity_linker.rs:523-534
    assert normalize_string("John  Smith!") == "john smith"
    assert normalize_string("ACME Corp.") == "acme corp"


def test_jaro_winkler_prefix_bonus():
    assert jaro_winkler_similarity("martha", "martha") == 1.0
    assert jaro_winkler_similarity("abc", "xyz") == 0.0
    assert jaro_winkler_similarity("dixon", "dicksonx") > 0.7


def test_jaccard():
    assert jaccard_similarity("new york city", "new york") == 2 / 3
    assert jaccard_similarity("", "") == 1.0


def test_cross_type_never_links():
    # string_similarity_linker.rs:537-575
    assert compute_similarity("John Smith", "John Smith", "PERSON", "ORGANIZATION") == 0.0


def test_typo_variants_link():
    s = compute_similarity("John Smith", "Jon Smith", "PERSON", "PERSON")
    assert s >= 0.85
    s = compute_similarity("John Smith", "Jhon Smith", "PERSON", "PERSON")
    assert s >= 0.85


def test_greedy_cluster_typos():
    items = [
        ("PERSON_johnsmith", "John Smith", 0.9),
        ("PERSON_jonsmith", "Jon Smith", 0.7),
        ("PERSON_jhonsmith", "Jhon Smith", 0.6),
        ("PERSON_maryjones", "Mary Jones", 0.8),
    ]
    links = greedy_cluster(items)
    assert links.get("PERSON_jonsmith") == "PERSON_johnsmith"
    assert links.get("PERSON_jhonsmith") == "PERSON_johnsmith"
    assert "PERSON_maryjones" not in links
    assert "PERSON_johnsmith" not in links   # canonical maps to nothing


def test_greedy_cluster_deterministic_under_order():
    items = [
        ("PERSON_jonsmith", "Jon Smith", 0.7),
        ("PERSON_maryjones", "Mary Jones", 0.8),
        ("PERSON_johnsmith", "John Smith", 0.9),
    ]
    import itertools
    results = {frozenset(greedy_cluster(list(p)).items())
               for p in itertools.permutations(items)}
    assert len(results) == 1


def test_select_canonical_name():
    # corpus/entity_linker.rs:468-481 — most frequent, ties → longest
    assert select_canonical_name({"NYC": 3, "New York City": 3}) == "New York City"
    assert select_canonical_name({"NYC": 5, "New York City": 3}) == "NYC"


def test_phonetic_config():
    cfg = LinkingConfig(use_phonetic=True, min_similarity=0.85)
    s = compute_similarity("Smith", "Smyth", "PERSON", "PERSON", cfg)
    assert s >= 0.85
