"""Semantic chunking: embedding-similarity breakpoints.

Port of ``text/semantic_chunking.rs``:
- sentence split on ``.!?`` with blank-line flush (``:126-163``),
- distance[i] = 1 − cosine(emb[i], emb[i+buffer]) (``:179-192``),
- breakpoint strategies (``:211-254``): Percentile (default 95.0 — index
  ``int(n*p/100)`` clamped), StandardDeviation (mean + k·σ, population σ),
  Absolute (raw threshold),
- chunk assembly (``:260-305``): segments under ``min_chunk_size``
  sentences merge forward (the reference skips the breakpoint without
  advancing), segments over ``max_chunk_size`` split evenly.

Embeddings come from the deterministic hash embedder, so chunk boundaries
are reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .embedding import HashEmbedder

PERCENTILE, STDDEV, ABSOLUTE = "percentile", "stddev", "absolute"


@dataclass
class SemanticChunkerConfig:
    breakpoint_strategy: str = PERCENTILE
    threshold_amount: float = 95.0
    min_chunk_size: int = 1       # sentences
    max_chunk_size: int = 0       # sentences; 0 = unlimited
    buffer_size: int = 1


def split_sentences(text: str) -> list[str]:
    """Port of ``semantic_chunking.rs:126-163``."""
    sentences: list[str] = []
    current = ""
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            if current:
                sentences.append(current.strip())
                current = ""
            continue
        # split_inclusive on .!?
        part_start = 0
        for i, ch in enumerate(line):
            if ch in ".!?":
                part = line[part_start:i + 1].strip()
                part_start = i + 1
                if part:
                    current += part + " "
                    sentences.append(current.strip())
                    current = ""
        tail = line[part_start:].strip()
        if tail:
            current += tail + " "
    if current.strip():
        sentences.append(current.strip())
    return sentences


class SemanticChunker:
    def __init__(self, cfg: SemanticChunkerConfig | None = None,
                 embedder: HashEmbedder | None = None):
        self.cfg = cfg or SemanticChunkerConfig()
        self.embedder = embedder or HashEmbedder(dim=64)

    def _distances(self, embeddings: np.ndarray) -> np.ndarray:
        b = self.cfg.buffer_size
        n = embeddings.shape[0]
        if n <= b:
            return np.empty(0, dtype=np.float32)
        a = embeddings[: n - b]
        c = embeddings[b:]
        na = np.linalg.norm(a, axis=1)
        nc = np.linalg.norm(c, axis=1)
        dots = np.einsum("ij,ij->i", a, c)
        denom = na * nc
        sims = np.where(denom > 0, dots / np.maximum(denom, 1e-12), 0.0)
        return 1.0 - sims

    def _threshold(self, diffs: np.ndarray) -> float:
        cfg = self.cfg
        if cfg.breakpoint_strategy == PERCENTILE:
            s = np.sort(diffs)
            idx = min(int(len(s) * cfg.threshold_amount / 100.0), len(s) - 1)
            return float(s[idx])
        if cfg.breakpoint_strategy == STDDEV:
            mean = float(diffs.mean())
            std = float(diffs.std())          # population σ, as the reference
            return mean + cfg.threshold_amount * std
        return cfg.threshold_amount           # absolute

    def chunk(self, text: str) -> list[dict]:
        sentences = split_sentences(text)
        if not sentences:
            return []
        if len(sentences) == 1:
            return [{"text": sentences[0], "start_sentence": 0,
                     "end_sentence": 1, "sentence_count": 1}]
        emb = self.embedder.embed_many(sentences)
        diffs = self._distances(emb)
        breakpoints: list[int] = []
        if len(diffs):
            thr = self._threshold(diffs)
            breakpoints = [i + 1 for i, d in enumerate(diffs) if d > thr]
        breakpoints.append(len(sentences))

        cfg = self.cfg
        chunks: list[dict] = []
        start = 0
        for end in breakpoints:
            if end <= start:
                continue
            count = end - start
            if count < cfg.min_chunk_size:
                continue                       # merge forward (reference behavior)
            if cfg.max_chunk_size > 0 and count > cfg.max_chunk_size:
                sub = start
                while sub < end:
                    sub_end = min(sub + cfg.max_chunk_size, end)
                    chunks.append({"text": " ".join(sentences[sub:sub_end]),
                                   "start_sentence": sub, "end_sentence": sub_end,
                                   "sentence_count": sub_end - sub})
                    sub = sub_end
            else:
                chunks.append({"text": " ".join(sentences[start:end]),
                               "start_sentence": start, "end_sentence": end,
                               "sentence_count": count})
            start = end
        return chunks
