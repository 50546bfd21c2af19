"""Actor-pool NER stage: the rule engine (gazetteers + regexes) is built
ONCE per actor in ``__init__`` from a declarative rule config — this is
the canonical stateful map_batches stage of the north star
("gazetteer+NER mention detection on stateful actor pools").
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.custom_ner import CustomNER, EntityTypeDef, ExtractionRule

NER_MENTIONS_SCHEMA = pa.schema([
    ("chunk_id", pa.string()),
    ("doc_id", pa.string()),
    ("surface", pa.string()),
    ("type", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("conf", pa.float32()),
    ("rule", pa.string()),
])


def build_ner(entity_types: list[dict], rules: list[dict]) -> CustomNER:
    """Declarative construction (mirrors the registration API of
    ``nlp/custom_ner.rs:118-139``)."""
    ner = CustomNER()
    for et in entity_types:
        etd = EntityTypeDef(name=et["name"], description=et.get("description", ""))
        for ex in et.get("examples", []):
            etd.add_example(ex)
        etd.add_dictionary_entries(et.get("dictionary", []))
        ner.register_entity_type(etd)
    for r in rules:
        ner.add_rule(ExtractionRule(
            name=r["name"], entity_type=r["entity_type"],
            rule_type=r["rule_type"], pattern=r.get("pattern", ""),
            min_confidence=r.get("min_confidence", 0.0),
            priority=r.get("priority", 0)))
    return ner


class NERStage:
    """chunks (chunk_id, doc_id, text) → mention rows."""

    def __init__(self, entity_types: list[dict], rules: list[dict]):
        self.ner = build_ner(entity_types, rules)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in NER_MENTIONS_SCHEMA.names}
        doc_ids = (batch.column("doc_id").to_pylist()
                   if "doc_id" in batch.column_names
                   else batch.column("chunk_id").to_pylist())
        for cid, did, text in zip(batch.column("chunk_id").to_pylist(),
                                  doc_ids, batch.column("text").to_pylist()):
            for m in self.ner.extract(text or ""):
                cols["chunk_id"].append(cid)
                cols["doc_id"].append(did)
                cols["surface"].append(m.text)
                cols["type"].append(m.entity_type)
                cols["start"].append(m.start)
                cols["end"].append(m.end)
                cols["conf"].append(m.confidence)
                cols["rule"].append(m.rule_name)
        return pa.table({n: pa.array(cols[n], NER_MENTIONS_SCHEMA.field(n).type)
                         for n in NER_MENTIONS_SCHEMA.names})


# A demo rule set matched to the synthetic corpus (cities gazetteer, org
# suffix regex, title-based contextual) — used by the `ner_mentions` query.
DEMO_ENTITY_TYPES = [
    {"name": "CITY", "dictionary": [
        "new york", "london", "paris", "tokyo", "berlin", "washington",
        "boston", "chicago", "california", "united states"]},
    {"name": "ORG", "examples": []},
    {"name": "TITLE_PERSON", "examples": []},
]
DEMO_RULES = [
    {"name": "city_gazetteer", "entity_type": "CITY", "rule_type": "dictionary",
     "pattern": "", "priority": 10},
    {"name": "org_suffix", "entity_type": "ORG", "rule_type": "regex",
     "pattern": r"\b[A-Z][A-Za-z]+ (?:Inc|Corp|LLC|Ltd)\b", "priority": 8},
    {"name": "dr_person", "entity_type": "TITLE_PERSON", "rule_type": "regex",
     "pattern": r"\bDr\. [A-Z][a-z]+\b", "priority": 9},
    {"name": "prof_contextual", "entity_type": "TITLE_PERSON", "rule_type": "contextual",
     "pattern": "professor|at|university", "priority": 5},
]
