"""Gleaning extraction stage: iterative extract → "did you miss any?" →
merge-new-only, with an LLM abstraction + per-actor response cache.

Port of the loop in ``entity/gleaning_extractor.rs:112-227``:
round 1 initial extraction; rounds 2..max: optional LLM completion check
(stop on COMPLETE), additional-extraction call, stop when nothing new;
entity merge keyed by lowercase name keeping the LONGER description
(``:229-273``, the LightRAG strategy); relationship dedup first-wins on
``src->tgt:type`` (``:418-436``).

The LLM is pluggable; the default is the deterministic ``MockLLM``
(``functions/mock_llm.py``) — same row schema as the pattern path, so
swapping in a real model changes no plumbing.  Runs as an actor pool:
the response cache (sha256-keyed LRU, ``caching/cache_key.rs``) lives in
the actor and is amortized across batches.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.entities import entity_id_for
from ..functions.mock_llm import (
    COMPLETION_PROMPT,
    CONTINUE_PROMPT,
    EXTRACT_PROMPT,
    MockLLM,
    ResponseCache,
    repair_json,
)

GLEANED_SCHEMA = pa.schema([
    ("kind", pa.string()),            # "e" | "t"
    ("chunk_id", pa.string()),
    ("doc_id", pa.string()),
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("type", pa.string()),
    ("description", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("rounds", pa.int32()),
])


class GleaningExtractStage:
    def __init__(self, max_rounds: int = 4, use_completion_check: bool = True,
                 llm=None, cache_entries: int = 10_000):
        self.max_rounds = max_rounds
        self.use_completion_check = use_completion_check
        self.llm = llm or MockLLM()
        self.cache = ResponseCache(cache_entries)

    def _complete(self, prompt: str) -> str:
        cached = self.cache.get(prompt)
        if cached is not None:
            return cached
        out = self.llm.complete(prompt)
        self.cache.put(prompt, out)
        return out

    def _parse(self, raw: str) -> tuple[list[dict], list[dict]]:
        try:
            obj = json.loads(repair_json(raw))
        except json.JSONDecodeError:
            return [], []
        return list(obj.get("entities") or []), list(obj.get("relationships") or [])

    def _glean_chunk(self, chunk_text: str
                     ) -> tuple[list[dict], list[dict], int, list[tuple]]:
        """Returns (entities, relationships, rounds, trace) where trace is
        the raw per-round parse stream ``(round, ents, rels)`` BEFORE any
        merging — the staging surface that lets the oracle replay the
        merge/dedup arithmetic in SQL."""
        # .replace, not .format — the templates contain literal JSON braces
        ents, rels = self._parse(self._complete(
            EXTRACT_PROMPT.replace("{chunk}", chunk_text)))
        trace: list[tuple] = [(1, ents, rels)]
        merged: dict[str, dict] = {}
        for e in ents:
            merged[str(e.get("name", "")).lower()] = e
        all_rels = list(rels)
        rounds = 1
        for _round in range(2, self.max_rounds + 1):
            known = ", ".join(sorted(merged))
            if self.use_completion_check:
                verdict = self._complete(
                    COMPLETION_PROMPT.replace("{known}", known)
                                     .replace("{chunk}", chunk_text))
                if verdict.strip().upper().startswith("COMPLETE"):
                    break
            rounds = _round
            extra_e, extra_r = self._parse(self._complete(
                CONTINUE_PROMPT.replace("{known}", known)
                               .replace("{chunk}", chunk_text)))
            if not extra_e and not extra_r:
                break
            trace.append((_round, extra_e, extra_r))
            for e in extra_e:                       # merge: longer description wins
                key = str(e.get("name", "")).lower()
                old = merged.get(key)
                if old is None or len(str(e.get("description", ""))) > \
                        len(str(old.get("description", ""))):
                    merged[key] = e
            all_rels.extend(extra_r)
        # relationship dedup: first-wins on src->tgt:type (gleaning_extractor.rs:418-436)
        seen = set()
        deduped = []
        for r in all_rels:
            k = f"{r.get('source')}->{r.get('target')}:{r.get('relation_type')}"
            if k not in seen:
                seen.add(k)
                deduped.append(r)
        return list(merged.values()), deduped, rounds, trace

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in GLEANED_SCHEMA.names}

        def put(kind, cid, did, rounds, **kw):
            cols["kind"].append(kind)
            cols["chunk_id"].append(cid)
            cols["doc_id"].append(did)
            cols["rounds"].append(rounds)
            for f in ("entity_id", "name", "type", "description", "subj", "pred", "obj"):
                cols[f].append(kw.get(f))

        doc_ids = (batch.column("doc_id").to_pylist()
                   if "doc_id" in batch.column_names
                   else batch.column("chunk_id").to_pylist())
        for cid, did, text in zip(batch.column("chunk_id").to_pylist(),
                                  doc_ids, batch.column("text").to_pylist()):
            ents, rels, rounds, _trace = self._glean_chunk(text or "")
            name_to_id = {}
            for e in ents:
                name, etype = str(e.get("name", "")), str(e.get("type", "UNKNOWN"))
                if not name:
                    continue
                eid = entity_id_for(name, etype)
                name_to_id[name.lower()] = eid
                put("e", cid, did, rounds, entity_id=eid, name=name, type=etype,
                    description=str(e.get("description", "")))
            for r in rels:
                s = name_to_id.get(str(r.get("source", "")).lower())
                o = name_to_id.get(str(r.get("target", "")).lower())
                if s and o:                    # drop edges with missing endpoints
                    put("t", cid, did, rounds, subj=s,
                        pred=str(r.get("relation_type", "RELATED_TO")), obj=o)
        return pa.table({n: pa.array(cols[n], GLEANED_SCHEMA.field(n).type)
                         for n in GLEANED_SCHEMA.names})

    def cache_stats(self) -> dict:
        return {"hits": self.cache.hits, "misses": self.cache.misses}
