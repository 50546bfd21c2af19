"""Multilingual support: n-gram language detection + language-specific
normalization/tokenization.

Port of ``nlp/multilingual.rs``:
- script heuristics first (``:321-372``): CJK ideographs >30% → zh;
  any hiragana/katakana → ja; hangul >30% → ko; arabic >30% → ar;
  cyrillic >30% → ru,
- else character-trigram models trained on the module's OWN tiny pangram
  samples (``:195-229``) with add-one-style smoothing (``:159-180``),
  winner by mean log-probability; confidence from the score spread,
- normalization (``:408-443``): whitespace collapse; Arabic diacritic
  strip (U+064B–0652); CJK full-width→half-width ASCII,
- tokenization (``:445-466``): CJK character-level, else whitespace.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

LANGS = ("en", "es", "fr", "de", "pt", "zh", "ja", "ko", "ar", "ru", "unknown")

_TRAINING = {
    "en": ["the quick brown fox jumps over the lazy dog",
           "this is a test of the english language"],
    "es": ["el rápido zorro marrón salta sobre el perro perezoso",
           "esta es una prueba del idioma español"],
    "fr": ["le renard brun rapide saute par-dessus le chien paresseux",
           "ceci est un test de la langue française"],
    "de": ["der schnelle braune fuchs springt über den faulen hund",
           "dies ist ein test der deutschen sprache"],
    "pt": ["a rápida raposa marrom pula sobre o cão preguiçoso",
           "este é um teste da língua portuguesa"],
}


class _NgramModel:
    def __init__(self, texts: list[str], n: int = 3):
        self.n = n
        self.ngrams: dict[str, float] = {}
        self.total = 0.0
        for t in texts:
            for i in range(len(t) - n + 1):
                g = t[i:i + n]
                self.ngrams[g] = self.ngrams.get(g, 0.0) + 1.0
                self.total += 1.0

    def score(self, text: str) -> float:
        n = self.n
        s, count = 0.0, 0
        for i in range(len(text) - n + 1):
            freq = self.ngrams.get(text[i:i + n])
            if freq is not None:
                s += math.log(freq / self.total)
            else:
                s += math.log(1.0 / (self.total + 1.0))
            count += 1
        return s / count if count else 0.0


_MODELS = {code: _NgramModel(texts) for code, texts in _TRAINING.items()}


def _ratio(text: str, lo: int, hi: int) -> float:
    n = len(text)
    if n == 0:
        return 0.0
    return sum(1 for c in text if lo <= ord(c) <= hi) / n


@dataclass
class DetectionResult:
    language: str
    confidence: float
    alternatives: list[tuple[str, float]] = field(default_factory=list)


def detect_language_full(text: str) -> DetectionResult:
    """Script heuristics then trigram models (``multilingual.rs:232-318``)."""
    if not text.strip():
        return DetectionResult("unknown", 0.0)
    if _ratio(text, 0x4E00, 0x9FFF) > 0.3:
        return DetectionResult("zh", 0.9, [("ja", 0.1)])
    if any(0x3040 <= ord(c) <= 0x30FF for c in text):
        return DetectionResult("ja", 0.9, [("zh", 0.1)])
    if _ratio(text, 0xAC00, 0xD7AF) > 0.3:
        return DetectionResult("ko", 0.95)
    if _ratio(text, 0x0600, 0x06FF) > 0.3:
        return DetectionResult("ar", 0.95)
    if _ratio(text, 0x0400, 0x04FF) > 0.3:
        return DetectionResult("ru", 0.9)

    scores = sorted(((code, m.score(text)) for code, m in _MODELS.items()),
                    key=lambda kv: (-kv[1], kv[0]))
    max_s, min_s = scores[0][1], scores[-1][1]
    rng = max_s - min_s
    confidence = min(max((max_s - min_s) / rng, 0.0), 1.0) if rng > 0 else 0.5
    return DetectionResult(scores[0][0], confidence,
                           [(c, s) for c, s in scores[1:4]])


def normalize_text(text: str, language: str) -> str:
    """Port of ``multilingual.rs:408-443``."""
    out = " ".join(text.split())
    if language == "ar":
        out = "".join(c for c in out if not (0x064B <= ord(c) <= 0x0652))
    elif language in ("zh", "ja"):
        out = "".join(chr(ord(c) - 0xFEE0) if 0xFF01 <= ord(c) <= 0xFF5E else c
                      for c in out)
    return out


def tokenize_lang(text: str, language: str) -> list[str]:
    """CJK character-level, else whitespace (``multilingual.rs:445-466``)."""
    if language in ("zh", "ja"):
        return [c for c in text if not c.isspace()]
    return text.split()


def process_text(text: str) -> dict:
    """detect → normalize → tokenize (``multilingual.rs:390-406``)."""
    det = detect_language_full(text)
    normalized = normalize_text(text, det.language)
    return {
        "language": det.language,
        "confidence": det.confidence,
        "normalized": normalized,
        "tokens": tokenize_lang(normalized, det.language),
    }
