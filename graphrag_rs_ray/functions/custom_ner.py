"""Custom NER rule engine — the gazetteer+rule mention detector.

Port of ``nlp/custom_ner.rs:20-377``:
- entity types carry examples + regex patterns + a lowercased dictionary
  (``:22-66``),
- extraction rules: ExactMatch(conf 1.0), Regex(0.9), Prefix(0.7),
  Suffix(0.7), Contains(0.6), Dictionary(0.95), Contextual
  "before|target|after" 3-word window (0.85) — confidences at
  ``:142-345``,
- rules applied in priority order (higher first, ``:131-138``),
- overlap resolution: sort by (start, -confidence), greedy keep
  non-overlapping (``:349-377``).

Deterministic tie-break addition: rules with equal priority keep insertion
order (Python sort is stable; Rust ``sort_by`` is stable too).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

EXACT, REGEX, PREFIX, SUFFIX, CONTAINS, DICTIONARY, CONTEXTUAL = (
    "exact", "regex", "prefix", "suffix", "contains", "dictionary", "contextual")


@dataclass
class EntityTypeDef:
    name: str
    description: str = ""
    examples: list[str] = field(default_factory=list)
    patterns: list[str] = field(default_factory=list)
    dictionary: set[str] = field(default_factory=set)

    def add_example(self, example: str):
        self.examples.append(example)
        self.dictionary.add(example.lower())

    def add_dictionary_entries(self, entries):
        for e in entries:
            self.dictionary.add(e.lower())


@dataclass
class ExtractionRule:
    name: str
    entity_type: str
    rule_type: str
    pattern: str
    min_confidence: float = 0.0
    priority: int = 0


@dataclass
class NERMatch:
    text: str
    entity_type: str
    start: int
    end: int
    confidence: float
    rule_name: str


class CustomNER:
    def __init__(self):
        self.entity_types: dict[str, EntityTypeDef] = {}
        self.rules: list[ExtractionRule] = []
        self._compiled: dict[str, re.Pattern] = {}

    def register_entity_type(self, et: EntityTypeDef):
        self.entity_types[et.name] = et

    def add_rule(self, rule: ExtractionRule):
        if rule.rule_type == REGEX:
            try:
                self._compiled[rule.name] = re.compile(rule.pattern)
            except re.error:
                pass
        self.rules.append(rule)
        self.rules.sort(key=lambda r: -r.priority)

    # ---- rule implementations ------------------------------------------

    def _exact(self, text: str, rule) -> list[NERMatch]:
        out = []
        tl, pl = text.lower(), rule.pattern.lower()
        start = 0
        while True:
            pos = tl.find(pl, start)
            if pos == -1:
                break
            out.append(NERMatch(text[pos:pos + len(rule.pattern)], rule.entity_type,
                                pos, pos + len(rule.pattern), 1.0, rule.name))
            start = pos + len(rule.pattern)
        return out

    def _regex(self, text: str, rule) -> list[NERMatch]:
        rx = self._compiled.get(rule.name)
        if rx is None:
            return []
        return [NERMatch(m.group(0), rule.entity_type, m.start(), m.end(), 0.9, rule.name)
                for m in rx.finditer(text)]

    def _word_scan(self, text: str, rule, predicate, conf) -> list[NERMatch]:
        out = []
        pos = 0
        pat = rule.pattern.lower()
        for word in text.split(" "):      # the reference advances by len+1
            if word and predicate(word.lower(), pat):
                out.append(NERMatch(word, rule.entity_type, pos, pos + len(word),
                                    conf, rule.name))
            pos += len(word) + 1
        return out

    def _dictionary(self, text: str, rule) -> list[NERMatch]:
        et = self.entity_types.get(rule.entity_type)
        if et is None:
            return []
        out = []
        tl = text.lower()
        for entry in sorted(et.dictionary):   # sorted → deterministic order
            start = 0
            while True:
                pos = tl.find(entry, start)
                if pos == -1:
                    break
                out.append(NERMatch(text[pos:pos + len(entry)], rule.entity_type,
                                    pos, pos + len(entry), 0.95, rule.name))
                start = pos + len(entry)
        return out

    def _contextual(self, text: str, rule) -> list[NERMatch]:
        parts = rule.pattern.split("|")
        if len(parts) != 3:
            return []
        before, target, after = (p.lower() for p in parts)
        out = []
        words = text.split()
        lowers = [w.lower() for w in words]       # once, not per window
        for i in range(len(words) - 2):
            if before in lowers[i] and target in lowers[i + 1] and after in lowers[i + 2]:
                w1 = words[i + 1]
                pos = text.find(w1)
                if pos != -1:
                    out.append(NERMatch(w1, rule.entity_type, pos, pos + len(w1),
                                        0.85, rule.name))
        return out

    def _apply(self, text: str, rule) -> list[NERMatch]:
        if rule.rule_type == EXACT:
            return self._exact(text, rule)
        if rule.rule_type == REGEX:
            return self._regex(text, rule)
        if rule.rule_type == PREFIX:
            return self._word_scan(text, rule, lambda w, p: w.startswith(p), 0.7)
        if rule.rule_type == SUFFIX:
            return self._word_scan(text, rule, lambda w, p: w.endswith(p), 0.7)
        if rule.rule_type == CONTAINS:
            return self._word_scan(text, rule, lambda w, p: p in w, 0.6)
        if rule.rule_type == DICTIONARY:
            return self._dictionary(text, rule)
        if rule.rule_type == CONTEXTUAL:
            return self._contextual(text, rule)
        return []

    def extract(self, text: str) -> list[NERMatch]:
        matches: list[NERMatch] = []
        for rule in self.rules:
            found = self._apply(text, rule)
            matches.extend(m for m in found if m.confidence >= rule.min_confidence)
        return self._resolve_overlaps(matches)

    @staticmethod
    def _resolve_overlaps(matches: list[NERMatch]) -> list[NERMatch]:
        """Sort by (start, -confidence); greedily keep non-overlapping
        (``custom_ner.rs:349-377``)."""
        matches.sort(key=lambda m: (m.start, -m.confidence))
        out: list[NERMatch] = []
        last_end = 0
        for m in matches:
            if m.start < last_end:
                continue
            last_end = m.end
            out.append(m)
        return out
