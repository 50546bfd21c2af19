"""Custom NER rule engine — semantics from ``nlp/custom_ner.rs``."""

from graphrag_rs_ray.functions.custom_ner import (
    CONTAINS,
    CONTEXTUAL,
    DICTIONARY,
    EXACT,
    PREFIX,
    REGEX,
    SUFFIX,
    CustomNER,
    EntityTypeDef,
    ExtractionRule,
)


def ner_with(rules, entity_types=()):
    ner = CustomNER()
    for et in entity_types:
        ner.register_entity_type(et)
    for r in rules:
        ner.add_rule(r)
    return ner


def test_exact_match_case_insensitive():
    ner = ner_with([ExtractionRule("r1", "DRUG", EXACT, "aspirin")])
    ms = ner.extract("Aspirin and aspirin and ASPIRIN.")
    assert len(ms) == 3
    assert all(m.entity_type == "DRUG" and m.confidence == 1.0 for m in ms)
    assert ms[0].text == "Aspirin"    # original casing preserved


def test_regex_rule():
    ner = ner_with([ExtractionRule("rx", "CODE", REGEX, r"[A-Z]{2}\d{3}")])
    ms = ner.extract("Codes AB123 and XY999 but not ab123.")
    assert [(m.text, m.confidence) for m in ms] == [("AB123", 0.9), ("XY999", 0.9)]


def test_prefix_suffix_contains():
    ner = ner_with([ExtractionRule("p", "T", PREFIX, "anti")])
    assert [m.text for m in ner.extract("antibody antigen body")] == ["antibody", "antigen"]
    ner = ner_with([ExtractionRule("s", "T", SUFFIX, "ase")])
    assert [m.text for m in ner.extract("kinase protease random")] == ["kinase", "protease"]
    ner = ner_with([ExtractionRule("c", "T", CONTAINS, "gen")])
    assert [m.text for m in ner.extract("antigen generic nothing")] == ["antigen", "generic"]


def test_dictionary_rule():
    et = EntityTypeDef(name="CITY")
    et.add_dictionary_entries(["london", "new york"])
    ner = ner_with([ExtractionRule("d", "CITY", DICTIONARY, "")], [et])
    ms = ner.extract("From London to New York and back to london.")
    assert sorted(m.text.lower() for m in ms) == ["london", "london", "new york"]
    assert all(m.confidence == 0.95 for m in ms)


def test_contextual_rule():
    ner = ner_with([ExtractionRule("ctx", "ROLE", CONTEXTUAL, "the|manager|of")])
    ms = ner.extract("she is the manager of sales")
    assert [m.text for m in ms] == ["manager"]
    assert ms[0].confidence == 0.85


def test_overlap_resolution_higher_confidence_wins():
    # exact (1.0) overlapping with contains (0.6) at same span start
    ner = ner_with([
        ExtractionRule("lo", "T1", CONTAINS, "aspir", priority=1),
        ExtractionRule("hi", "T2", EXACT, "aspirin", priority=0),
    ])
    ms = ner.extract("aspirin")
    assert len(ms) == 1
    assert ms[0].entity_type == "T2" and ms[0].confidence == 1.0


def test_priority_ordering_and_determinism():
    rules = [
        ExtractionRule("a", "T", EXACT, "alpha", priority=1),
        ExtractionRule("b", "T", EXACT, "beta", priority=5),
    ]
    ner = ner_with(rules)
    assert [r.name for r in ner.rules] == ["b", "a"]
    t = "alpha beta alpha"
    assert ner.extract(t) == ner.extract(t)


def test_ner_stage_over_ray(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from graphrag_rs_ray.stages.ner import DEMO_ENTITY_TYPES, DEMO_RULES, NERStage
    chunks = rd.from_arrow(pa.table({
        "chunk_id": ["c1", "c2"],
        "doc_id": ["d1", "d2"],
        "text": ["Dr. Watson visited London and Acme Inc.",
                 "a professor at university level"],
    }))
    out = chunks.map_batches(NERStage, fn_constructor_args=(DEMO_ENTITY_TYPES, DEMO_RULES),
                             batch_format="pyarrow", concurrency=1).to_pandas()
    got = set(zip(out["type"], out["surface"]))
    assert ("TITLE_PERSON", "Dr. Watson") in got
    assert ("CITY", "London") in got
    assert ("ORG", "Acme Inc") in got
    assert ("TITLE_PERSON", "at") in got or ("TITLE_PERSON", "professor") in got or len(got) >= 3
