"""Cross-implementation vectors ported from the reference's inline
``#[test]`` expectations (cargo remains unbuildable offline — no
vendored crates, no network — so these pin fidelity test-by-test).

Sources:
* ``entity/llm_extractor.rs:1062-1140`` (6 vectors) → ``functions/
  llm_extract.py``
* ``entity/bidirectional_index.rs:333-500`` (8 vectors) → the dataset
  twins in ``pipelines/graph_ops.py`` (the mutable index becomes
  mention rows; every count/expectation carries over)
* ``text/extractive_summarizer.rs:286-351`` (6 vectors) →
  ``functions/keywords.summarize`` / ``functions/textstats``
"""

import pyarrow as pa


# ------------------------------------------- llm_extractor.rs vectors --

TOM_CHUNK = ("Tom Sawyer is a young boy who lives in St. Petersburg with "
             "his Aunt Polly. Tom is best friends with Huckleberry Finn. "
             "They often go on adventures together.")


def test_extract_json_from_markdown():
    # llm_extractor.rs:1079-1092
    from graphrag_rs_ray.functions.llm_extract import (
        extract_json_from_markdown,
    )
    markdown = ('\nHere\'s the extraction:\n```json\n{\n  "entities": [],'
                '\n  "relationships": []\n}\n```\n')
    js = extract_json_from_markdown(markdown)
    assert js is not None and "entities" in js
    # plain fence accepted only when the body looks like JSON
    assert extract_json_from_markdown("```\n{\"a\": 1}\n```") == '{"a": 1}'
    assert extract_json_from_markdown("```\nnot json\n```") is None


def test_find_json_in_text():
    # llm_extractor.rs:1094-1099
    from graphrag_rs_ray.functions.llm_extract import find_json_in_text
    text = 'Some text before { "entities": [] } some text after'
    assert find_json_in_text(text) == '{ "entities": [] }'
    assert find_json_in_text("no braces here") is None


def test_parse_valid_json():
    # llm_extractor.rs:1101-1126
    from graphrag_rs_ray.functions.llm_extract import (
        parse_extraction_response,
    )
    response = ('\n{\n  "entities": [\n    {\n      "name": "Tom Sawyer",'
                '\n      "type": "PERSON",\n      "description": "A young '
                'boy"\n    }\n  ],\n  "relationships": []\n}\n')
    out = parse_extraction_response(response)
    assert len(out["entities"]) == 1
    assert out["entities"][0]["name"] == "Tom Sawyer"
    # unparseable input → EMPTY output, never an error (:216-223)
    assert parse_extraction_response("utter garbage") == {
        "entities": [], "relationships": []}


def test_convert_to_entities():
    # llm_extractor.rs:1128-1150
    from graphrag_rs_ray.functions.llm_extract import convert_to_entities
    data = [{"name": "Tom Sawyer", "type": "PERSON",
             "description": "A young boy"}]
    ents = convert_to_entities(data, TOM_CHUNK)
    assert len(ents) == 1
    assert ents[0].name == "Tom Sawyer"
    assert ents[0].entity_type == "PERSON"
    assert ents[0].confidence == 0.9
    assert ents[0].mentions        # at least one mention found


def test_find_llm_mentions():
    # llm_extractor.rs:1152-1162 — "Tom" appears ≥ 2 times
    from graphrag_rs_ray.functions.llm_extract import find_llm_mentions
    mentions = find_llm_mentions("Tom", TOM_CHUNK)
    assert len(mentions) >= 2
    assert all(c == 0.9 for _, _, c in mentions)
    # case-insensitive fallback at 0.85 when no exact match (:336-354)
    ci = find_llm_mentions("tom sawyer", TOM_CHUNK)
    assert ci and all(c == 0.85 for _, _, c in ci)
    assert TOM_CHUNK[ci[0][0]:ci[0][1]] == "Tom Sawyer"


def test_normalize_llm_name_implementation_pinned():
    # llm_extractor.rs:393-400.  NOTE: the reference's inline test
    # (:1164-1174) expects "tom_sawyer", but its implementation filters
    # out spaces BEFORE the space→underscore replace, so it actually
    # produces "tomsawyer"; the test sits behind disabled features and
    # never runs.  We pin the implementation.
    from graphrag_rs_ray.functions.llm_extract import normalize_llm_name
    assert normalize_llm_name("Tom Sawyer") == "tomsawyer"
    assert normalize_llm_name("New York City") == "newyorkcity"
    assert normalize_llm_name("Dr. Smith") == "drsmith"
    assert normalize_llm_name("snake_case Kept") == "snake_casekept"


def test_convert_to_relationships():
    # llm_extractor.rs:360-391 — case-insensitive entity resolution,
    # unmatched pairs silently skipped, type := description
    from graphrag_rs_ray.functions.llm_extract import (
        convert_to_entities,
        convert_to_relationships,
    )
    ents = convert_to_entities(
        [{"name": "Tom Sawyer", "type": "PERSON", "description": ""},
         {"name": "Huckleberry Finn", "type": "PERSON", "description": ""}],
        TOM_CHUNK)
    rels = convert_to_relationships(
        [{"source": "tom sawyer", "target": "HUCKLEBERRY FINN",
          "description": "best friends", "strength": 0.8},
         {"source": "Tom Sawyer", "target": "Becky Thatcher",
          "description": "likes", "strength": 0.5}],
        ents)
    assert len(rels) == 1
    assert rels[0]["source"] == "PERSON_tomsawyer"
    assert rels[0]["target"] == "PERSON_huckleberryfinn"
    assert rels[0]["relation_type"] == "best friends"
    assert rels[0]["confidence"] == 0.8


# ------------------------------------ bidirectional_index.rs vectors --

def _mentions_ds(pairs):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "entity_id": pa.array([p[0] for p in pairs], pa.string()),
        "chunk_id": pa.array([p[1] for p in pairs], pa.string()),
    })).repartition(2)


BASIC = [("entity_1", "chunk_1"), ("entity_1", "chunk_2"),
         ("entity_2", "chunk_1")]


def test_bidir_basic_operations(ray_session):
    # bidirectional_index.rs test_basic_operations
    from graphrag_rs_ray.pipelines.graph_ops import (
        chunk_to_entities,
        entity_to_chunks,
    )
    e2c = (entity_to_chunks(_mentions_ds(BASIC)).to_pandas()
           .set_index("entity_id"))
    assert set(e2c.loc["entity_1", "chunks"]) == {"chunk_1", "chunk_2"}
    assert e2c.loc["entity_1", "n_chunks"] == 2
    c2e = (chunk_to_entities(_mentions_ds(BASIC)).to_pandas()
           .set_index("chunk_id"))
    assert set(c2e.loc["chunk_1", "entities"]) == {"entity_1", "entity_2"}
    # counts: 2 entities, 2 chunks, 3 mappings
    assert len(e2c) == 2 and len(c2e) == 2
    assert int(e2c["n_chunks"].sum()) == 3


def test_bidir_idempotent_add(ray_session):
    # test_idempotent_add — duplicate mention rows collapse
    from graphrag_rs_ray.pipelines.graph_ops import entity_to_chunks
    dup = [("entity_1", "chunk_1")] * 3
    e2c = entity_to_chunks(_mentions_ds(dup)).to_pandas()
    assert len(e2c) == 1
    assert e2c["n_chunks"].iloc[0] == 1


def test_bidir_from_entities(ray_session):
    # test_from_entities — an entity with mentions in 2 chunks
    from graphrag_rs_ray.pipelines.graph_ops import (
        chunk_to_entities,
        entity_to_chunks,
    )
    rows = [("entity_1", "chunk_1"), ("entity_1", "chunk_2")]
    e2c = entity_to_chunks(_mentions_ds(rows)).to_pandas()
    c2e = chunk_to_entities(_mentions_ds(rows)).to_pandas()
    assert len(e2c) == 1 and len(c2e) == 2
    assert int(e2c["n_chunks"].sum()) == 2


def test_bidir_co_occurrence(ray_session):
    # test_co_occurrence — (e1,e2) share 2 chunks; (e1,e3) share 1
    from graphrag_rs_ray.pipelines.graph_ops import co_occurring_entities
    rows = [("entity_1", "chunk_1"), ("entity_1", "chunk_2"),
            ("entity_2", "chunk_1"), ("entity_2", "chunk_2"),
            ("entity_3", "chunk_1")]
    co = (co_occurring_entities(_mentions_ds(rows), min_shared_chunks=1)
          .to_pandas())
    co = co.set_index(["entity_a", "entity_b"])["shared_chunks"]
    assert co.loc[("entity_1", "entity_2")] == 2
    assert co.loc[("entity_1", "entity_3")] == 1


def test_bidir_common_entities(ray_session):
    # test_common_entities — entities in ≥ 2 chunks, most-common first
    from graphrag_rs_ray.pipelines.graph_ops import entity_to_chunks
    rows = [("entity_1", "chunk_1"), ("entity_1", "chunk_2"),
            ("entity_1", "chunk_3"), ("entity_2", "chunk_1")]
    e2c = entity_to_chunks(_mentions_ds(rows)).to_pandas()
    common = (e2c[e2c["n_chunks"] >= 2]
              .sort_values("n_chunks", ascending=False))
    assert len(common) == 1
    assert common["entity_id"].iloc[0] == "entity_1"
    assert common["n_chunks"].iloc[0] == 3


def test_bidir_merge(ray_session):
    # test_merge — union of two mention tables
    from graphrag_rs_ray.pipelines.graph_ops import (
        chunk_to_entities,
        entity_to_chunks,
    )
    merged = _mentions_ds([("entity_1", "chunk_1")]).union(
        _mentions_ds([("entity_2", "chunk_2")]))
    e2c = entity_to_chunks(merged).to_pandas()
    c2e = chunk_to_entities(merged).to_pandas()
    assert len(e2c) == 2 and len(c2e) == 2
    assert int(e2c["n_chunks"].sum()) == 2


def test_bidir_statistics(ray_session):
    # test_statistics — avg chunks/entity = avg entities/chunk = 1.5
    from graphrag_rs_ray.pipelines.graph_ops import (
        chunk_to_entities,
        entity_to_chunks,
    )
    e2c = entity_to_chunks(_mentions_ds(BASIC)).to_pandas()
    c2e = chunk_to_entities(_mentions_ds(BASIC)).to_pandas()
    assert float(e2c["n_chunks"].mean()) == 1.5
    assert float(c2e["n_entities"].mean()) == 1.5


def test_bidir_removal_semantics(ray_session):
    # test_removal — removing a mapping / an entity == filtering rows
    from graphrag_rs_ray.pipelines.graph_ops import (
        chunk_to_entities,
        entity_to_chunks,
    )
    after_removals = [p for p in BASIC
                      if p != ("entity_1", "chunk_1")
                      and p[0] != "entity_1"]
    e2c = entity_to_chunks(_mentions_ds(after_removals)).to_pandas()
    c2e = chunk_to_entities(_mentions_ds(after_removals)).to_pandas()
    assert len(e2c) == 1 and len(c2e) == 1
    assert int(e2c["n_chunks"].sum()) == 1


# --------------------------------- extractive_summarizer.rs vectors --

def test_sum_sentence_splitting():
    # extractive_summarizer.rs test_sentence_splitting
    from graphrag_rs_ray.functions.textstats import extract_sentences
    text = "This is the first sentence. This is the second! Is this the third?"
    sentences = extract_sentences(text)
    assert len(sentences) == 3
    assert "first sentence" in sentences[0]
    assert "second" in sentences[1]
    assert "third" in sentences[2]


def test_sum_summarization():
    from graphrag_rs_ray.functions.keywords import summarize
    text = ("Machine learning is a subset of artificial intelligence. "
            "It focuses on training algorithms to learn from data. "
            "Deep learning is a specialized branch of machine learning. "
            "Neural networks are the foundation of deep learning systems.")
    summary = summarize(text, 100)
    assert summary
    assert len(summary) <= 100
    low = summary.lower()
    assert "machine learning" in low or "artificial intelligence" in low


def test_sum_truncation():
    # test_truncation — a single long sentence must be cut with "..."
    from graphrag_rs_ray.functions.keywords import summarize
    long_sentence = ("This is a very long sentence that needs to be "
                     "truncated because it exceeds the maximum allowed "
                     "length for the summary")
    out = summarize(long_sentence, 50)
    assert len(out) <= 50
    assert out.endswith("...")


def test_sum_empty_text():
    from graphrag_rs_ray.functions.keywords import summarize
    assert summarize("", 100) == ""


def test_sum_single_sentence():
    # Reference vector: summary == text verbatim.  DOCUMENTED
    # DIVERGENCE: our summarizer reuses textstats.extract_sentences
    # (pinned by the sentence_stats oracle family), which strips the
    # terminal punctuation the reference's private splitter
    # (extractive_summarizer.rs:71-98) keeps — the divergence is
    # exactly that one character.
    from graphrag_rs_ray.functions.keywords import summarize
    text = "This is a single sentence."
    assert summarize(text, 100) == text.rstrip(".")


def test_sum_sentence_selection():
    # test_sentence_selection — bounded sentence count in the summary
    from graphrag_rs_ray.functions.keywords import summarize
    text = ("The quick brown fox jumps over the lazy dog. "
            "This is a simple test sentence. "
            "Machine learning and artificial intelligence are "
            "transforming technology.")
    summary = summarize(text, 60)
    n = (summary.count(".") + summary.count("!") + summary.count("?"))
    assert n <= 2
