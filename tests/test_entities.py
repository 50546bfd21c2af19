"""Entity extraction semantics ported from the reference's tests
(``entity/mod.rs:1089-1133``) and fixture-derived cases."""

from graphrag_rs_ray.functions.entities import (
    PatternEntityExtractor,
    calculate_confidence,
    clean_word,
    entity_id_for,
    extract_relationships,
    infer_relationship_type,
    is_likely_person_word,
    normalize_name,
)


def ex(min_conf=0.5):
    return PatternEntityExtractor(min_confidence=min_conf)


def test_person_extraction_reference_case():
    # entity/mod.rs:1094-1115
    text = "Entity Name works at Test Corp. Dr. Second Entity is a professor."
    entities = ex().extract(text)
    assert entities
    persons = [e for e in entities if e.entity_type == "PERSON"]
    assert persons
    names = {e.name for e in persons}
    assert "Entity Name" in names       # known-name gazetteer phase
    assert "Second Entity" in names


def test_relationship_extraction_reference_case():
    # entity/mod.rs:1117-1132
    text = "Entity Name works for Test Corp in Test City."
    entities = ex().extract(text)
    rels = extract_relationships(entities, text)
    assert rels


def test_two_word_person_and_org_and_location():
    text = "John Smith works for Acme Inc in New York."
    entities = ex(0.7).extract(text)
    by_type = {}
    for e in entities:
        by_type.setdefault(e.entity_type, set()).add(e.name)
    assert "John Smith" in by_type["PERSON"]
    # Reference semantics (entity/mod.rs:500-506): `text[..pos].rfind(' ')+1`
    # lands ON the suffix when it is space-separated, so the extracted org
    # name is the bare suffix token, NOT "Acme Inc".
    assert "Inc" in by_type["ORGANIZATION"]
    assert "New York" in by_type["LOCATION"]
    rels = extract_relationships(entities, text)
    triples = {(s, p, o) for s, p, o in rels}
    assert (entity_id_for("John Smith", "PERSON"), "WORKS_FOR",
            entity_id_for("Inc", "ORGANIZATION")) in triples
    assert any(p in ("HEADQUARTERED_IN", "LOCATED_IN")
               for s, p, o in rels
               if s == entity_id_for("Inc", "ORGANIZATION"))


def test_title_based_person():
    text = "Dr. Watson is a professor at University of London."
    entities = ex(0.7).extract(text)
    names = {(e.entity_type, e.name) for e in entities}
    assert ("PERSON", "Watson") in names
    assert any(t == "ORGANIZATION" and n.startswith("University of London") for t, n in names)


def test_stop_listed_words_not_persons():
    text = "Chapter Saturday The Adventures Complete"
    persons = [e for e in ex(0.5).extract(text) if e.entity_type == "PERSON"]
    assert not any(e.name.lower() in
                   {"chapter", "saturday", "the", "adventures", "complete"}
                   for e in persons)


def test_confidence_formula():
    # entity/mod.rs:700-738
    assert abs(calculate_confidence("John Smith", "PERSON") - 0.8) < 1e-6
    assert abs(calculate_confidence("Acme Inc", "ORGANIZATION") - 0.9) < 1e-6
    assert abs(calculate_confidence("New York", "LOCATION") - 0.9) < 1e-6
    assert abs(calculate_confidence("lowercase", "PERSON") - 0.5) < 1e-6


def test_normalize_name_removes_spaces():
    # entity/mod.rs:758-764 — space is filtered OUT (not turned into _)
    assert normalize_name("John Smith") == "johnsmith"
    assert normalize_name("ACME Corp.") == "acmecorp"
    assert entity_id_for("John Smith", "PERSON") == "PERSON_johnsmith"


def test_clean_word():
    assert clean_word('"John,') == "John"
    assert clean_word("O'Connor's") == "O'Connor's"  # keeps inner apostrophes
    assert clean_word("don't'") == "don't"


def test_is_likely_person_word():
    assert is_likely_person_word("Smith")
    assert is_likely_person_word("Johnson")
    assert not is_likely_person_word("a")
    assert not is_likely_person_word("It")   # short non-name
    assert not is_likely_person_word("smith" + "!")  # non-alpha


def test_mentions_found_and_merged():
    text = "Boston is big. I love Boston. Boston forever."
    entities = ex(0.7).extract(text)
    boston = [e for e in entities if e.name == "Boston"]
    assert len(boston) == 1
    assert len(boston[0].mentions) == 3
    offsets = [(m.start, m.end) for m in boston[0].mentions]
    assert all(text[s:e] == "Boston" for s, e in offsets)


def test_predicate_inference_table():
    assert infer_relationship_type("PERSON", "ORGANIZATION", "she works for them") == "WORKS_FOR"
    assert infer_relationship_type("ORGANIZATION", "PERSON", "founded in 1999") == "LEADS"
    assert infer_relationship_type("PERSON", "LOCATION", "he was born in X") == "BORN_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "headquartered there") == "HEADQUARTERED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "nothing") == "LOCATED_IN"
    assert infer_relationship_type("PERSON", "PERSON", "they married") == "MARRIED_TO"
    assert infer_relationship_type("PERSON", "PERSON", "just friends") == "KNOWS"
    assert infer_relationship_type("EVENT", "OBJECT", "whatever") == "RELATED_TO"


def test_deterministic_output_order():
    text = "John Smith works for Acme Inc in New York. Mary Jones lives in Boston."
    a = [(e.entity_id, e.confidence) for e in ex(0.7).extract(text)]
    b = [(e.entity_id, e.confidence) for e in ex(0.7).extract(text)]
    assert a == b
