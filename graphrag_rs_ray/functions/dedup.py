"""Deduplication kernels: shingles, MinHash, SimHash, n-gram Jaccard.

Training-data extensions (the reference has only exact relationship dedup,
``entity/gleaning_extractor.rs:418-436``; these are the web-scale near-dup
operators a 100-TB pipeline needs).  All hashes are derived from BLAKE2b /
a splitmix-style mixer — deterministic across processes and machines (no
PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def _stable_hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def shingles(text: str, k: int = 5) -> set[str]:
    """Word k-shingles over the lowercased whitespace tokenization."""
    words = text.lower().split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def char_ngrams(text: str, n: int = 3) -> set[str]:
    s = " ".join(text.lower().split())
    if len(s) < n:
        return {s} if s else set()
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def ngram_jaccard(t1: str, t2: str, n: int = 3) -> float:
    return jaccard(char_ngrams(t1, n), char_ngrams(t2, n))


class MinHasher:
    """num_perm universal-hash MinHash over word shingles.

    h_i(x) = (a_i * x + b_i) mod p, p = 2^61-1; a/b drawn from a fixed
    PCG64 seed so signatures are reproducible everywhere."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 0x5EED):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.shingle_k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        xs = self._hash_shingles(sorted(sh))
        # wrap-around mod 2^64 is a fine universal-ish family for dedup
        prod = (self.a[:, None] * xs[None, :]) + self.b[:, None]
        return prod.min(axis=1)

    @staticmethod
    def _hash_shingles(sh: list[str]) -> np.ndarray:
        """Vectorized stable 64-bit hashes for a shingle list (pandas'
        C string hasher — stable within a run and across processes for a
        fixed hash_key, which is all MinHash needs)."""
        import pandas as pd
        return pd.util.hash_array(np.asarray(sh, dtype=object)).astype(np.uint64)

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) signatures with ONE vectorized hash pass and
        a segmented min (`np.minimum.reduceat`) — no per-shingle Python."""
        all_sh: list[str] = []
        offsets = [0]
        for t in texts:
            sh = sorted(shingles(t, self.shingle_k))
            all_sh.extend(sh)
            offsets.append(len(all_sh))
        out = np.full((len(texts), self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        if not all_sh:
            return out
        xs = self._hash_shingles(all_sh)                       # (S,)
        prod = (self.a[:, None] * xs[None, :]) + self.b[:, None]  # (P, S)
        starts = np.asarray(offsets[:-1])
        nonempty = np.asarray([offsets[i + 1] > offsets[i] for i in range(len(texts))])
        if nonempty.any():
            # empty segments share a start with their successor; dropping
            # them leaves a strictly-increasing partition of the array
            seg_starts = starts[nonempty]
            mins = np.minimum.reduceat(prod, seg_starts, axis=1)
            out[np.where(nonempty)[0]] = mins.T
        return out

    def bands(self, sig: np.ndarray, num_bands: int = 16) -> list[int]:
        """LSH band hashes: split the signature into ``num_bands`` rows and
        hash each band; equal band hash ⇒ candidate pair."""
        rows = self.num_perm // num_bands
        out = []
        for b in range(num_bands):
            band = sig[b * rows:(b + 1) * rows]
            out.append(_stable_hash64(band.tobytes() + bytes([b])))
        return out


def estimate_jaccard(sig1: np.ndarray, sig2: np.ndarray) -> float:
    return float(np.mean(sig1 == sig2))


class SimHasher:
    """64-bit SimHash over word unigrams (stable per-word hashes),
    vectorized via unpackbits over the word-hash bytes."""

    def signature(self, text: str) -> int:
        words = text.lower().split()
        if not words:
            return 0
        hs = np.fromiter((_stable_hash64(w.encode()) for w in words),
                         dtype=np.uint64, count=len(words))
        bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes = bits.astype(np.int32).sum(axis=0) * 2 - len(words)  # (64,)
        sig_bits = (votes > 0).astype(np.uint8)
        return int.from_bytes(np.packbits(sig_bits, bitorder="little").tobytes(), "little")


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
