"""Deterministic mock LLM + response cache + JSON repair.

The reference's LLM path is exercised in its OWN tests through a mock LLM
(``generation/mod.rs`` MockLLM, ``generation/async_mock_llm.rs``); this
module provides the same test strategy for our gleaning pipeline:

- ``MockLLM.complete(prompt)``: pure function of the prompt.  Extraction
  prompts get a Microsoft-GraphRAG-style JSON answer
  (``entity/prompts.rs:8-52`` shape: ``{"entities": [...],
  "relationships": [...]}``) derived deterministically from the chunk text
  embedded in the prompt (the pattern extractor plays the role of the
  model); continuation prompts ("did you miss any") yield EVENT/OBJECT
  keyword entities once, then nothing — driving the gleaning loop's
  stop conditions.
- ``ResponseCache``: sha256(prompt)-keyed LRU
  (``caching/cache_key.rs:5-44``).
- ``repair_json``: code-fence / trailing-comma cleanup (the reference
  depends on ``jsonfixer``; SURVEY §2.9).
"""

from __future__ import annotations

import hashlib
import json
import re
from collections import OrderedDict

EXTRACT_PROMPT = (
    "Extract entities and relationships from the text below as JSON "
    '{"entities": [...], "relationships": [...]}.\n'
    "-TEXT-\n{chunk}\n-END-")
CONTINUE_PROMPT = (
    "Some entities may have been missed. Known: {known}.\n"
    "Extract ONLY additional entities/relationships as JSON.\n"
    "-TEXT-\n{chunk}\n-END-")
COMPLETION_PROMPT = (
    "Known entities: {known}. Is extraction of the text complete? "
    "Answer COMPLETE or INCOMPLETE.\n-TEXT-\n{chunk}\n-END-")

_TEXT_RE = re.compile(r"-TEXT-\n(.*?)\n-END-", re.S)
_KNOWN_RE = re.compile(r"Known(?: entities)?: (.*?)\.\n", re.S)


def cache_key(prompt: str) -> str:
    """sha256 cache key (``caching/cache_key.rs:5-44``)."""
    return hashlib.sha256(prompt.encode("utf-8")).hexdigest()


class ResponseCache:
    """LRU response cache keyed by sha256(prompt)."""

    def __init__(self, max_entries: int = 10_000):
        self.max_entries = max_entries
        self._data: OrderedDict[str, str] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, prompt: str) -> str | None:
        k = cache_key(prompt)
        if k in self._data:
            self._data.move_to_end(k)
            self.hits += 1
            return self._data[k]
        self.misses += 1
        return None

    def put(self, prompt: str, response: str):
        k = cache_key(prompt)
        self._data[k] = response
        self._data.move_to_end(k)
        while len(self._data) > self.max_entries:
            self._data.popitem(last=False)


def repair_json(s: str) -> str:
    """Best-effort cleanup of LLM-ish JSON: strip code fences, cut to the
    outermost braces, drop trailing commas."""
    s = re.sub(r"^```(?:json)?|```$", "", s.strip(), flags=re.M).strip()
    start, end = s.find("{"), s.rfind("}")
    if start != -1 and end > start:
        s = s[start:end + 1]
    s = re.sub(r",\s*([}\]])", r"\1", s)
    return s


class MockLLM:
    """Deterministic completions for the three gleaning prompt families."""

    def complete(self, prompt: str) -> str:
        m = _TEXT_RE.search(prompt)
        chunk = m.group(1) if m else ""
        if prompt.startswith("Known entities:"):
            return self._completion_check(prompt, chunk)
        if prompt.startswith("Some entities may have been missed"):
            return self._continuation(prompt, chunk)
        return self._initial(chunk)

    # -- round 1: pattern extraction plays the model --------------------
    def _initial(self, chunk: str) -> str:
        from .entities import PatternEntityExtractor, extract_relationships
        ex = PatternEntityExtractor(min_confidence=0.7)
        ents = ex.extract(chunk)
        rels = extract_relationships(ents, chunk)
        by_id = {e.entity_id: e for e in ents}
        payload = {
            "entities": [
                {"name": e.name, "type": e.entity_type,
                 "description": f"{e.name} appears in the text"}
                for e in ents],
            "relationships": [
                {"source": by_id[s].name, "target": by_id[o].name,
                 "relation_type": p, "description": f"{p} co-occurrence"}
                for s, p, o in rels],
        }
        # fenced output exercises repair_json in the consumer
        return "```json\n" + json.dumps(payload) + "\n```"

    # -- rounds 2+: keyword-tier "missed" entities once ------------------
    def _continuation(self, prompt: str, chunk: str) -> str:
        from .entities import EVENT_WORDS, OBJECT_WORDS
        known = set()
        km = _KNOWN_RE.search(prompt)
        if km:
            known = {x.strip().lower() for x in km.group(1).split(",") if x.strip()}
        low = chunk.lower()
        extra = []
        for w in EVENT_WORDS:
            if w in low and w not in known:
                extra.append({"name": w, "type": "EVENT",
                              "description": f"{w} event in the text"})
        for w in OBJECT_WORDS:
            if w in low and w not in known:
                extra.append({"name": w, "type": "OBJECT",
                              "description": f"{w} object in the text"})
        return json.dumps({"entities": extra, "relationships": []})

    def _completion_check(self, prompt: str, chunk: str) -> str:
        # complete iff the keyword tier has nothing left to add
        cont = json.loads(self._continuation(
            prompt.replace("Known entities:", "Some entities may have been missed. Known:", 1), chunk))
        return "COMPLETE" if not cont["entities"] else "INCOMPLETE"
