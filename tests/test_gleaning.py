"""Gleaning loop + mock LLM + response cache (semantics from
``entity/gleaning_extractor.rs`` / ``caching/cache_key.rs``)."""

import pyarrow as pa

from graphrag_rs_ray.functions.mock_llm import (
    MockLLM,
    ResponseCache,
    cache_key,
    repair_json,
)
from graphrag_rs_ray.stages.gleaning import GleaningExtractStage

TEXT = ("John Smith works for Acme Inc in New York. "
        "The meeting discussed a treasure and a sword.")


def test_repair_json():
    assert repair_json('```json\n{"a": 1,}\n```') == '{"a": 1}'
    assert repair_json('noise {"a": [1, 2,]} trailing') == '{"a": [1, 2]}'


def test_cache():
    c = ResponseCache(max_entries=2)
    assert c.get("p1") is None
    c.put("p1", "r1")
    assert c.get("p1") == "r1"
    c.put("p2", "r2")
    c.put("p3", "r3")          # evicts p1 (LRU)
    assert c.get("p1") is None
    assert cache_key("x") == cache_key("x") != cache_key("y")


def _batch(text=TEXT):
    return pa.table({"chunk_id": ["c1"], "doc_id": ["d1"], "text": [text]})


def test_gleaning_rounds_and_merge():
    stage = GleaningExtractStage(max_rounds=4)
    out = stage(_batch())
    kinds = out.column("kind").to_pylist()
    names = [n for k, n in zip(kinds, out.column("name").to_pylist()) if k == "e"]
    # round 1 finds pattern entities; round 2 gleans EVENT/OBJECT keywords
    assert "John Smith" in names
    assert "meeting" in names and "treasure" in names and "sword" in names
    # completion check ends the loop before max_rounds once nothing is left
    assert max(out.column("rounds").to_pylist()) <= 3
    # triples have resolved endpoints
    t_rows = [i for i, k in enumerate(kinds) if k == "t"]
    assert t_rows
    for i in t_rows:
        assert out.column("subj")[i].as_py() and out.column("obj")[i].as_py()


def test_gleaning_deterministic_and_cached():
    stage = GleaningExtractStage(max_rounds=4)
    a = stage(_batch()).to_pydict()
    misses_first = stage.cache_stats()["misses"]
    b = stage(_batch()).to_pydict()
    assert a == b
    stats = stage.cache_stats()
    assert stats["misses"] == misses_first       # second pass fully cached
    assert stats["hits"] > 0


def test_relationship_dedup_first_wins():
    class DupLLM(MockLLM):
        def _initial(self, chunk):
            import json
            return json.dumps({
                "entities": [{"name": "A", "type": "PERSON", "description": "a"},
                             {"name": "B", "type": "PERSON", "description": "b"}],
                "relationships": [
                    {"source": "A", "target": "B", "relation_type": "KNOWS",
                     "description": "first"},
                    {"source": "A", "target": "B", "relation_type": "KNOWS",
                     "description": "second (dropped)"},
                ]})

    stage = GleaningExtractStage(max_rounds=1, llm=DupLLM())
    out = stage(_batch("A plain chunk."))
    t = out.filter(pa.compute.equal(out.column("kind"), "t"))
    assert t.num_rows == 1


def test_gleaning_over_ray(ray_session):
    import ray.data as rd
    chunks = rd.from_arrow(pa.table({
        "chunk_id": ["c1", "c2"],
        "doc_id": ["d1", "d1"],
        "text": [TEXT, "Mary Jones married Robert Brown near a crown ceremony."],
    }))
    out = chunks.map_batches(GleaningExtractStage, fn_constructor_args=(3,),
                             batch_format="pyarrow", concurrency=1).to_pandas()
    assert len(out) > 0
    assert {"e", "t"} <= set(out["kind"])
