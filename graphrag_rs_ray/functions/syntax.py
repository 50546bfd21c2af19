"""Rule-based syntax analysis: POS tagging, simplified dependencies,
noun-phrase extraction, sentence segmentation.

Port of ``nlp/syntax_analyzer.rs``:
- tokenizer keeps alnum + ``'`` + ``-`` runs, punctuation as single
  tokens (``:194-222``),
- POS tagging (``:244-312``): punctuation/number checks, dictionary
  lookups in the exact priority order (determiners → pronouns →
  prepositions → conjunctions → adverbs → verbs → adjectives → nouns,
  with the reference's word lists verbatim, ``:509-578``), then suffix
  patterns (capitalized→ProperNoun, -ing, -ed, -s, -ive/-ous/-ful, -ly),
  default Noun,
- lemmatization (``:316-351``): -ies→y, strip plural -s, strip -ed/-s of
  verbs, strip -ing,
- dependencies (``:354-438``): first verb = root; first noun before it =
  subject; first noun after it = object; adjective→next-noun,
  adverb→first-verb, determiner→next-noun modifiers,
- noun phrases (``:442-496``): maximal Det/Adj/Noun runs, head = last
  noun index within the phrase.
"""

from __future__ import annotations

from dataclasses import dataclass

DET, PRON, PREP, CONJ, ADV, VERB, VERB_PAST, VERB_GER, VERB_3SG, ADJ, \
    NOUN, NOUN_PL, PROPN, NUM, PUNCT = (
        "DT", "PRP", "IN", "CC", "RB", "VB", "VBD", "VBG", "VBZ", "JJ",
        "NN", "NNS", "NNP", "CD", "PUNCT")

_DICTS: list[tuple[dict, str]] = []


def _mk(words, tag):
    return {w: tag for w in words}


_DETERMINERS = _mk(("the a an this that these those my your his her its our "
                    "their all both each every some any no another such what "
                    "which").split(), DET)
_PRONOUNS = _mk("i you he she it we they me him her us them who whom what which this that".split(), PRON)
_PREPOSITIONS = _mk(("of in to for with on at from by about into through "
                     "during before after above below between under since "
                     "without within along among across").split(), PREP)
_CONJUNCTIONS = _mk(("and or but nor yet so for because although though while "
                     "if unless until when where").split(), CONJ)
_ADVERBS = _mk(("not so out up now only just more also very well back there "
                "even still too here then always never often quite really "
                "almost again").split(), ADV)
_VERBS = _mk(("be have do say get make go know take see come think look want "
              "give use find tell ask work seem feel try leave call").split(), VERB)
_ADJECTIVES = _mk(("good new first last long great little own other old right "
                   "big high different small large next early young important "
                   "few public bad same able").split(), ADJ)
_NOUNS = _mk(("time person year way day thing man world life hand part child "
              "eye woman place work week case point government company number "
              "group problem fact").split(), NOUN)

# exact reference lookup priority (syntax_analyzer.rs:259-283)
_LOOKUP_ORDER = (_DETERMINERS, _PRONOUNS, _PREPOSITIONS, _CONJUNCTIONS,
                 _ADVERBS, _VERBS, _ADJECTIVES, _NOUNS)


@dataclass
class Token:
    text: str
    position: int
    pos: str
    lemma: str


def tokenize(text: str) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    cur = ""
    start = 0
    for i, ch in enumerate(text):
        if ch.isalnum() or ch in "'-":
            if not cur:
                start = i
            cur += ch
        else:
            if cur:
                out.append((cur, start))
                cur = ""
            if not ch.isspace():
                out.append((ch, i))
    if cur:
        out.append((cur, start))
    return out


def tag_word(word: str) -> str:
    lower = word.lower()
    if all(not c.isalnum() and not c.isspace() and c.isascii() for c in word):
        return PUNCT
    if word.isdigit():
        return NUM
    for d in _LOOKUP_ORDER:
        tag = d.get(lower)
        if tag is not None:
            return tag
    if word[:1].isupper():
        return PROPN
    if lower.endswith("ing"):
        return VERB_GER
    if lower.endswith("ed"):
        return VERB_PAST
    if lower.endswith("s") and not lower.endswith("ss"):
        return NOUN_PL
    if lower.endswith(("ive", "ous", "ful")):
        return ADJ
    if lower.endswith("ly"):
        return ADV
    return NOUN


def lemmatize(word: str, pos: str) -> str:
    lower = word.lower()
    if pos == NOUN_PL:
        if lower.endswith("ies"):
            return lower[:-3] + "y"
        if lower.endswith("s") and not lower.endswith("ss"):
            return lower[:-1]
        return lower
    if pos in (VERB_PAST, VERB_3SG):
        if lower.endswith("ed"):
            return lower[:-2]
        if lower.endswith("s"):
            return lower[:-1]
        return lower
    if pos == VERB_GER:
        if lower.endswith("ing"):
            return lower[:-3]
        return lower
    return lower


def pos_tag(text: str) -> list[Token]:
    out = []
    for w, p in tokenize(text):
        tag = tag_word(w)
        out.append(Token(w, p, tag, lemmatize(w, tag)))
    return out


def parse_dependencies(tokens: list[Token]) -> list[tuple[int, int, str]]:
    """(head_idx, dependent_idx, relation) triples."""
    deps: list[tuple[int, int, str]] = []
    if not tokens:
        return deps
    verb_tags = (VERB, VERB_PAST, VERB_3SG)
    root = next((i for i, t in enumerate(tokens) if t.pos in verb_tags), 0)
    for i in range(root):
        if tokens[i].pos in (NOUN, PROPN, PRON):
            deps.append((root, i, "subject"))
            break
    for i in range(root + 1, len(tokens)):
        if tokens[i].pos in (NOUN, PROPN):
            deps.append((root, i, "object"))
            break
    first_verb = next((i for i, t in enumerate(tokens) if t.pos in verb_tags), None)
    for i, t in enumerate(tokens):
        if t.pos == ADJ:
            nxt = next((j for j in range(i + 1, len(tokens))
                        if tokens[j].pos in (NOUN, PROPN)), None)
            if nxt is not None:
                deps.append((nxt, i, "modifier"))
        elif t.pos == ADV and first_verb is not None:
            deps.append((first_verb, i, "modifier"))
        elif t.pos == DET:
            nxt = next((j for j in range(i + 1, len(tokens))
                        if tokens[j].pos in (NOUN, PROPN)), None)
            if nxt is not None:
                deps.append((nxt, i, "determiner"))
    return deps


def extract_noun_phrases(tokens: list[Token]) -> list[str]:
    """Maximal Det/Adj/Noun runs (``:442-496``)."""
    phrases: list[str] = []
    cur: list[str] = []
    noun_tags = (NOUN, PROPN, NOUN_PL)
    for t in tokens:
        if t.pos in (DET, ADJ) or t.pos in noun_tags:
            cur.append(t.text)
        else:
            if cur:
                phrases.append(" ".join(cur))
                cur = []
    if cur:
        phrases.append(" ".join(cur))
    return phrases
