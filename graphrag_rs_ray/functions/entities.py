"""Deterministic pattern/gazetteer mention detection + relationship inference.

Port of the reference's pattern ``EntityExtractor``
(``graphrag-core/src/entity/mod.rs``):

- 4-phase person extraction: known-name gazetteer (``:332-390``) →
  title-based (``:392-440``) → two-word Cap-Cap (``:442-482``) → single
  capitalized word (``:307-327``), with the stop lists at ``:165-279``.
- organization suffix/prefix matching (``:485-549``),
- known-location gazetteer (``:552-583``),
- concept / event / object keyword extraction (``:897-1036``),
- generic capitalized-word fallback (``:1039-1068``),
- per-type confidence formula (``:700-738``),
- per-chunk dedup by (name, type) keeping max confidence and merged
  mentions (``:767-788``),
- mention offsets via non-overlapping substring scan (``:586-614``),
- entity id = ``{TYPE}_{normalize_name(name)}`` (``:594, 758-764``),
- co-occurrence relationship extraction + predicate inference
  (``:791-858``).

Determinism note: the reference's final per-chunk entity order is a Rust
``HashMap::into_values`` (arbitrary).  Here dict insertion order is kept, so
entity order (and therefore subj/obj direction of emitted pairs) is
deterministic: extraction-phase order — persons, organizations, locations,
then any extra configured types.
"""

from __future__ import annotations

from dataclasses import dataclass, field

PERSON_TITLES = frozenset({
    "mr", "mrs", "ms", "dr", "prof", "professor", "sir", "lady", "lord",
    "captain", "major", "colonel", "general", "admiral", "judge", "father",
    "mother", "brother", "sister", "aunt", "uncle", "grandfather", "grandmother",
})

NON_PERSON_WORDS = frozenset({
    "chapter", "the", "and", "but", "or", "in", "on", "at", "to", "for", "with",
    "by", "from", "about", "into", "through", "during", "before", "after",
    "above", "below", "up", "down", "out", "off", "over", "under", "again",
    "further", "then", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "only", "own", "same", "so", "than", "too", "very", "can", "will",
    "just", "should", "now", "temptations", "strategic", "movements", "decides",
    "upon", "whitewashing", "saturday", "monday", "tuesday", "wednesday",
    "thursday", "friday", "sunday", "january", "february", "march", "april",
    "may", "june", "july", "august", "september", "october", "november",
    "december", "adventures", "complete",
})

# Reference ``entity/mod.rs:341-354`` — fixture gazetteer, kept verbatim for
# parity with the reference's own tests.
KNOWN_PERSON_NAMES: tuple[str, ...] = (
    "Entity Name", "Second Entity", "Guardian Entity", "Friend Entity",
    "Companion Entity", "Third Entity", "Fourth Entity", "Fifth Entity",
    "Sixth Entity", "Seventh Entity", "Eighth Entity", "Ninth Entity",
)

ORG_SUFFIXES: tuple[str, ...] = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "Group",
    "Solutions", "Technologies",
)
ORG_PREFIXES: tuple[str, ...] = ("University of", "Institute of", "Department of")
ORG_INDICATORS: tuple[str, ...] = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "University", "Institute",
)

KNOWN_LOCATIONS: tuple[str, ...] = (
    "United States", "New York", "California", "London", "Paris", "Tokyo",
    "Berlin", "Washington", "Boston", "Chicago",
)

NAME_ENDINGS = ("son", "sen", "ton", "ham", "ford", "ley", "ment", "ard", "ert")
NAME_PREFIXES = ("mc", "mac", "o'", "de", "van", "von", "la", "le")
SHORT_NON_NAMES = frozenset({
    "it", "is", "as", "at", "be", "by", "do", "go", "he", "if", "in", "me",
    "my", "no", "of", "on", "or", "so", "to", "up", "us", "we",
})

CONCEPT_INDICATORS: tuple[str, ...] = (
    "Theory", "Concept", "Principle", "Philosophy", "Doctrine", "Idea",
    "Method", "Approach", "Framework", "Model", "Paradigm", "Thesis",
)
EVENT_WORDS: tuple[str, ...] = (
    "meeting", "conference", "ceremony", "celebration", "festival",
    "competition", "war", "battle", "expedition", "journey", "trial",
)
OBJECT_WORDS: tuple[str, ...] = (
    "sword", "shield", "book", "manuscript", "scroll", "tablet", "ring",
    "crown", "treasure", "coin", "tool", "weapon",
)

COMMON_WORDS = frozenset(w.lower() for w in (
    "the", "and", "but", "or", "in", "on", "at", "to", "for", "with", "by",
    "from", "about", "into", "through", "during", "before", "after", "above",
    "below", "up", "down", "out", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some", "such",
    "only", "own", "same", "so", "than", "too", "very", "can", "will", "just",
    "should", "now", "could", "would", "said", "says", "told", "asked",
    "went", "came", "come", "going", "chapter", "page", "section", "part",
    "book", "volume",
))

DEFAULT_ENTITY_TYPES: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION")

PERSON_LIKE = frozenset({"PERSON", "CHARACTER", "RESEARCHER", "SPEAKER", "DIALOGUE_SPEAKER"})
ORG_LIKE = frozenset({"ORGANIZATION", "INSTITUTION", "BRAND", "COMPANY"})
LOC_LIKE = frozenset({"LOCATION", "SETTING", "PLACE"})
CONCEPT_LIKE = frozenset({"CONCEPT", "THEORY", "THEME", "ARGUMENT", "IDEA"})
EVENT_LIKE = frozenset({"EVENT", "EXPERIMENT", "HAPPENING"})
OBJECT_LIKE = frozenset({"OBJECT", "TOOL", "ARTIFACT", "ITEM"})


@dataclass(slots=True)
class Mention:
    start: int
    end: int
    confidence: float


@dataclass(slots=True)
class ExtractedEntity:
    entity_id: str
    name: str
    entity_type: str
    confidence: float
    mentions: list[Mention] = field(default_factory=list)


_CLEAN_MEMO: dict[str, str] = {}
_CLEAN_MEMO_MAX = 500_000


def clean_word(word: str) -> str:
    """Port of ``entity/mod.rs:622-628`` — keep alphabetic + apostrophes.
    Memoized per worker process (corpus vocabulary ≪ token occurrences)."""
    cached = _CLEAN_MEMO.get(word)
    if cached is None:
        cached = "".join(c for c in word if c.isalpha() or c == "'").rstrip("'")
        if len(_CLEAN_MEMO) < _CLEAN_MEMO_MAX:
            _CLEAN_MEMO[word] = cached
    return cached


# first-word index for the known-name gazetteer phase: lowercase first
# token → candidate names (turns the O(words × names) scan into O(words))
_KNOWN_BY_FIRST: dict[str, list[list[str]]] = {}
for _name in KNOWN_PERSON_NAMES:
    _parts = _name.split()
    _KNOWN_BY_FIRST.setdefault(_parts[0].lower(), []).append(_parts)


def is_capitalized(word: str) -> bool:
    """First char uppercase, on the RAW token (``entity/mod.rs:617-619``)."""
    return bool(word) and word[0].isupper()


def is_likely_person_word(word: str) -> bool:
    """Port of ``entity/mod.rs:631-668``."""
    if len(word) < 2:
        return False
    lower = word.lower()
    has_ending = lower.endswith(NAME_ENDINGS)
    has_prefix = lower.startswith(NAME_PREFIXES)
    proper = word[0].isupper() and all(c.isalpha() or c == "'" for c in word)
    if len(word) <= 2 and lower in SHORT_NON_NAMES:
        return False
    return proper and (len(word) >= 3 or has_ending or has_prefix)


# Per-token feature memo for the person phases.  Every phase needs the same
# handful of per-token predicates (cleaned form, capitalization, person-word
# likelihood, stop-list membership); computing them once per DISTINCT raw
# token (corpus vocabulary ≪ token occurrences) collapses the 4-phase
# per-word work to one dict lookup per token.  Pure function of the token —
# memoization cannot change extraction output.
_TOKEN_MEMO: dict[str, tuple] = {}
_TOKEN_MEMO_MAX = 500_000


def _token_features(word: str) -> tuple:
    """(clean, clean_lower, raw_is_capitalized, clean_is_person_word,
    clean_lower_in_NON_PERSON_WORDS, person_eligible, is_title,
    seeds_known_name, clean_is_capitalized) for one raw whitespace
    token.  [5] folds the single/two-word phase test ([2] and [3] and
    not [4] — [3] already implies len ≥ 2) into one flag; [6]/[7] are
    the title / known-name phase prechecks; [8] folds the two-word
    phase's ``is_likely_person_name`` (clean tokens are space-free and
    non-empty under [5], so the two-part name test reduces to both
    cleans capitalized) — all pure functions of the token, so memoizing
    cannot change extraction output."""
    f = _TOKEN_MEMO.get(word)
    if f is None:
        clean = clean_word(word)
        cl = clean.lower()
        cap = bool(word) and word[0].isupper()
        pw = is_likely_person_word(clean)
        npw = cl in NON_PERSON_WORDS
        f = (clean, cl, cap, pw, npw,
             cap and pw and not npw,
             cl in PERSON_TITLES,
             cl in _KNOWN_BY_FIRST,
             bool(clean) and clean[0].isupper())
        if len(_TOKEN_MEMO) < _TOKEN_MEMO_MAX:
            _TOKEN_MEMO[word] = f
    return f


def is_likely_person_name(name: str) -> bool:
    parts = name.split()
    return len(parts) == 2 and all(is_capitalized(p) for p in parts)


def is_likely_organization(name: str) -> bool:
    return any(ind in name for ind in ORG_INDICATORS)


def is_known_location(name: str) -> bool:
    return any(loc in name for loc in KNOWN_LOCATIONS)


def is_common_word(word: str) -> bool:
    return word.lower() in COMMON_WORDS


_NORM_MEMO: dict[str, str] = {}
_NORM_MEMO_MAX = 500_000


def normalize_name(name: str) -> str:
    """Port of ``entity/mod.rs:758-764``: lowercase then keep only
    alphanumerics and underscores — note this REMOVES spaces, so
    "John Smith" → "johnsmith" (exactly as the reference does).
    Memoized per worker process (pure; name vocabulary is small)."""
    cached = _NORM_MEMO.get(name)
    if cached is None:
        cached = "".join(c for c in name.lower() if c.isalnum() or c == "_")
        if len(_NORM_MEMO) < _NORM_MEMO_MAX:
            _NORM_MEMO[name] = cached
    return cached


def entity_id_for(name: str, entity_type: str) -> str:
    return f"{entity_type}_{normalize_name(name)}"


_CONF_MEMO: dict[tuple[str, str], float] = {}
_CONF_MEMO_MAX = 500_000


def calculate_confidence(name: str, entity_type: str) -> float:
    """Port of ``entity/mod.rs:700-738``.  Memoized (pure in its args)."""
    key = (name, entity_type)
    cached = _CONF_MEMO.get(key)
    if cached is not None:
        return cached
    confidence = 0.5
    if entity_type == "PERSON":
        if "Dr." in name or "Prof." in name:
            confidence += 0.3
        if len(name.split()) == 2:
            confidence += 0.2
    elif entity_type == "ORGANIZATION":
        if "Inc" in name or "Corp" in name or "LLC" in name:
            confidence += 0.3
        if "University" in name or "Institute" in name:
            confidence += 0.2
    elif entity_type == "LOCATION":
        if "," in name:
            confidence += 0.2
        if is_known_location(name):
            confidence += 0.3
    if name and name[0].isupper():
        confidence += 0.1
    confidence = min(confidence, 1.0)
    if len(_CONF_MEMO) < _CONF_MEMO_MAX:
        _CONF_MEMO[key] = confidence
    return confidence


def find_mentions(name: str, text: str, confidence: float) -> list[Mention]:
    """Non-overlapping substring scan; port of ``entity/mod.rs:596-608``."""
    mentions = []
    find = text.find
    ln = len(name)
    pos = find(name)
    while pos != -1:
        end = pos + ln
        mentions.append(Mention(pos, end, confidence))
        pos = find(name, end)
    return mentions


class PatternEntityExtractor:
    """The deterministic mention detector.

    Stateless apart from config; one instance is held per Ray actor (regex
    compilation / gazetteers are module-level constants, loaded once per
    worker process).
    """

    def __init__(self, min_confidence: float = 0.7,
                 entity_types: tuple[str, ...] = DEFAULT_ENTITY_TYPES,
                 allowed_patterns: tuple[str, ...] = (),
                 excluded_patterns: tuple[str, ...] = ()):
        import re
        self.min_confidence = min_confidence
        self.entity_types = tuple(entity_types)
        self.allowed = [re.compile(p) for p in allowed_patterns]
        self.excluded = [re.compile(p) for p in excluded_patterns]

    # ---- person phases ------------------------------------------------

    # The four phases test the memoized per-token flags FIRST and the
    # ``processed`` position flags second (independent conditions, so the
    # reorder is output-identical) — the flag tests are a single tuple
    # index on a mostly-False bit, which is the common case.  ``processed``
    # is a bytearray (O(1) indexing, no hashing) instead of a set.

    def _extract_known_names(self, feats, clean_lower, processed, entities,
                             text):
        n = len(feats)
        for i in range(n):
            if not feats[i][7] or processed[i]:
                continue
            candidates = _KNOWN_BY_FIRST[clean_lower[i]]
            for name_words in candidates:
                k = len(name_words)
                if i + k <= n and all(clean_lower[i + j] == name_words[j].lower()
                                      for j in range(1, k)):
                    name = " ".join(name_words)
                    if 0.95 >= self.min_confidence:
                        entities.append(self._mk(name, "PERSON", 0.95, text))
                    for j in range(k):
                        processed[i + j] = 1
                    break

    def _extract_title_based(self, feats, processed, entities, text):
        n = len(feats)
        for i in range(n):
            if not feats[i][6] or processed[i]:
                continue
            if i + 1 < n and not processed[i + 1]:
                f1 = feats[i + 1]
                if f1[2] and f1[3]:
                    next_word = f1[0]
                    if i + 2 < n and not processed[i + 2]:
                        f2 = feats[i + 2]
                        if f2[2] and f2[3]:
                            processed[i + 2] = 1
                            name = f"{next_word} {f2[0]}"
                        else:
                            name = next_word
                    else:
                        name = next_word
                    if 0.9 >= self.min_confidence:
                        entities.append(self._mk(name, "PERSON", 0.9, text))
                    processed[i] = 1
                    processed[i + 1] = 1

    def _extract_two_word(self, feats, processed, entities, text):
        for i in range(len(feats) - 1):
            f0 = feats[i]
            if not f0[5]:
                continue
            f1 = feats[i + 1]
            if f1[5] and f0[8] and f1[8] \
                    and not processed[i] and not processed[i + 1]:
                # f0[8]/f1[8] ≡ is_likely_person_name(clean0 + " " + clean1)
                # for space-free non-empty cleans (see _token_features)
                name = f"{f0[0]} {f1[0]}"
                conf = calculate_confidence(name, "PERSON")
                if conf >= self.min_confidence:
                    entities.append(self._mk(name, "PERSON", conf, text))
                processed[i] = 1
                processed[i + 1] = 1

    def _extract_single_word(self, feats, processed, entities, text):
        for i, f in enumerate(feats):
            if f[5] and not processed[i]:
                conf = calculate_confidence(f[0], "PERSON")
                if conf >= self.min_confidence:
                    entities.append(self._mk(f[0], "PERSON", conf, text))

    def extract_persons(self, text: str) -> list[ExtractedEntity]:
        words = text.split()
        # inline the memo hit path (feature tuples are always truthy)
        tm_get = _TOKEN_MEMO.get
        feats = [tm_get(w) or _token_features(w) for w in words]
        clean_lower = [f[1] for f in feats]
        processed = bytearray(len(words))
        entities: list[ExtractedEntity] = []
        self._extract_known_names(feats, clean_lower, processed, entities, text)
        self._extract_title_based(feats, processed, entities, text)
        self._extract_two_word(feats, processed, entities, text)
        self._extract_single_word(feats, processed, entities, text)
        return entities

    # ---- other types ---------------------------------------------------

    def extract_organizations(self, text: str) -> list[ExtractedEntity]:
        entities = []
        for suffix in ORG_SUFFIXES:
            pos = text.find(suffix)  # FIRST occurrence only, as in the reference
            if pos != -1:
                sp = text.rfind(" ", 0, pos)
                start = sp + 1 if sp != -1 else 0
                name = text[start:pos + len(suffix)].strip()
                if name and is_likely_organization(name):
                    conf = calculate_confidence(name, "ORGANIZATION")
                    if conf >= self.min_confidence:
                        entities.append(self._mk(name, "ORGANIZATION", conf, text))
        for prefix in ORG_PREFIXES:
            pos = text.find(prefix)
            if pos != -1:
                dot = text.find(".", pos)
                end = dot if dot != -1 else min(len(text), pos + 50)
                name = text[pos:end].strip()
                if name and len(name) > len(prefix):
                    conf = calculate_confidence(name, "ORGANIZATION")
                    if conf >= self.min_confidence:
                        entities.append(self._mk(name, "ORGANIZATION", conf, text))
        return entities

    def extract_locations(self, text: str) -> list[ExtractedEntity]:
        entities = []
        for location in KNOWN_LOCATIONS:
            if location in text:
                conf = calculate_confidence(location, "LOCATION")
                if conf >= self.min_confidence:
                    entities.append(self._mk(location, "LOCATION", conf, text))
        return entities

    def extract_concepts(self, text: str, entity_type: str) -> list[ExtractedEntity]:
        entities = []
        for raw in text.split():
            f = _token_features(raw)
            cw = f[0]
            if any(ind in cw for ind in CONCEPT_INDICATORS):
                if 0.75 >= self.min_confidence:
                    entities.append(self._mk(cw, entity_type, 0.75, text))
            if f[2] and len(raw) > 4:
                if not is_common_word(cw):
                    if 0.6 >= self.min_confidence:
                        entities.append(self._mk(cw, entity_type, 0.6, text))
        return entities

    def extract_events(self, text: str) -> list[ExtractedEntity]:
        entities = []
        lower = text.lower()
        for w in EVENT_WORDS:
            if w in lower:
                if 0.7 >= self.min_confidence:
                    entities.append(self._mk(w, "EVENT", 0.7, text))
        return entities

    def extract_objects(self, text: str) -> list[ExtractedEntity]:
        entities = []
        lower = text.lower()
        for w in OBJECT_WORDS:
            if w in lower:
                if 0.65 >= self.min_confidence:
                    entities.append(self._mk(w, "OBJECT", 0.65, text))
        return entities

    def extract_generic(self, text: str, entity_type: str) -> list[ExtractedEntity]:
        entities = []
        for raw in text.split():
            if len(raw) > 3:
                f = _token_features(raw)
                if f[2] and not is_common_word(f[0]):
                    if 0.5 >= self.min_confidence:
                        entities.append(self._mk(f[0], entity_type, 0.5, text))
        return entities

    # ---- assembly ------------------------------------------------------

    def _mk(self, name: str, entity_type: str, confidence: float, text: str) -> ExtractedEntity:
        return ExtractedEntity(
            entity_id=entity_id_for(name, entity_type),
            name=name,
            entity_type=entity_type,
            confidence=confidence,
            mentions=find_mentions(name, text, confidence),
        )

    def extract(self, text: str) -> list[ExtractedEntity]:
        """Dispatch + filter + dedup; port of ``entity/mod.rs:97-156``."""
        entities: list[ExtractedEntity] = []
        for et in self.entity_types:
            if et in PERSON_LIKE:
                entities.extend(self.extract_persons(text))
            elif et in ORG_LIKE:
                entities.extend(self.extract_organizations(text))
            elif et in LOC_LIKE:
                entities.extend(self.extract_locations(text))
            elif et in CONCEPT_LIKE:
                entities.extend(self.extract_concepts(text, et))
            elif et in EVENT_LIKE:
                entities.extend(self.extract_events(text))
            elif et in OBJECT_LIKE:
                entities.extend(self.extract_objects(text))
            else:
                entities.extend(self.extract_generic(text, et))
        entities = self._apply_pattern_filters(entities)
        entities = deduplicate_entities(entities)
        return [e for e in entities if e.confidence >= self.min_confidence]

    def _apply_pattern_filters(self, entities):
        if not self.allowed and not self.excluded:
            return entities
        out = []
        for e in entities:
            if self.allowed and not any(p.search(e.name) for p in self.allowed):
                continue
            if self.excluded and any(p.search(e.name) for p in self.excluded):
                continue
            out.append(e)
        return out


def deduplicate_entities(entities: list[ExtractedEntity]) -> list[ExtractedEntity]:
    """(name, type) dedup, merged mentions, max confidence
    (``entity/mod.rs:767-788``) — insertion-ordered, hence deterministic."""
    unique: dict[tuple[str, str], ExtractedEntity] = {}
    for e in entities:
        key = (e.name, e.entity_type)
        existing = unique.get(key)
        if existing is not None:
            existing.mentions.extend(e.mentions)
            if e.confidence > existing.confidence:
                existing.confidence = e.confidence
        else:
            unique[key] = e
    return list(unique.values())


# ---- relationships ------------------------------------------------------

def infer_relationship_type(type1: str, type2: str, context: str) -> str:
    """Port of ``entity/mod.rs:820-858`` — symmetric in the type pair."""
    pair = {type1, type2}
    if pair == {"PERSON", "ORGANIZATION"}:
        if "works for" in context or "employed by" in context:
            return "WORKS_FOR"
        if "founded" in context or "CEO" in context:
            return "LEADS"
        return "ASSOCIATED_WITH"
    if pair == {"PERSON", "LOCATION"}:
        if "born in" in context or "from" in context:
            return "BORN_IN"
        if "lives in" in context or "based in" in context:
            return "LOCATED_IN"
        return "ASSOCIATED_WITH"
    if pair == {"ORGANIZATION", "LOCATION"}:
        if "headquartered" in context or "based in" in context:
            return "HEADQUARTERED_IN"
        return "LOCATED_IN"
    if type1 == "PERSON" and type2 == "PERSON":
        if "married" in context or "spouse" in context:
            return "MARRIED_TO"
        if "colleague" in context or "partner" in context:
            return "COLLEAGUE_OF"
        return "KNOWS"
    return "RELATED_TO"


def extract_relationships(entities: list[ExtractedEntity], chunk_text: str) -> list[tuple[str, str, str]]:
    """All co-occurring pairs (i<j in deterministic entity order) with an
    inferred predicate; port of ``entity/mod.rs:791-817``.

    Returns ``(subj, pred, obj)`` triples (the reference returns
    (source, target, type) tuples; we normalize to subject-predicate-object
    order everywhere downstream)."""
    subs, preds, objs = relationship_columns(entities, chunk_text)
    return list(zip(subs, preds, objs))


def relationship_columns(entities: list[ExtractedEntity],
                         chunk_text: str) -> tuple[list, list, list]:
    """Column form of :func:`extract_relationships` — same pairs in the
    same order as three parallel (subj, pred, obj) lists, which is what
    the Arrow-assembling extraction stage actually needs (no per-pair
    tuple objects, no ``zip(*...)`` transpose)."""
    n = len(entities)
    ids = [e.entity_id for e in entities]
    types = [e.entity_type for e in entities]
    subs: list = []
    preds: list = []
    objs: list = []
    # Per-chunk predicate table: the inferred type depends only on the
    # (type1, type2) pair and the chunk text, but the naive loop re-scans
    # the text for every one of the O(k²) pairs.  Distinct types per
    # chunk ≤ |configured types|, so precomputing the full pair table
    # (infer_relationship_type is pure — extra unused cells are
    # side-effect-free) keeps the O(k²) emit loop at C-level list ops.
    distinct = set(types)
    pred_of = {t1: {t2: infer_relationship_type(t1, t2, chunk_text)
                    for t2 in distinct} for t1 in distinct}
    for i in range(n):
        prow = pred_of[types[i]]
        subs.extend([ids[i]] * (n - 1 - i))
        preds.extend([prow[t] for t in types[i + 1:]])
        objs.extend(ids[i + 1:])
    return subs, preds, objs
