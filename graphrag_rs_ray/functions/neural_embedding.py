"""Neural embedding provider seam — a real model-in-actor path.

The reference's embedding trait (``HOW_IT_WORKS.md:690-698``,
``embeddings/huggingface.rs``, ``embeddings/api_providers.rs``) loads a
neural encoder once and embeds batches; the sandbox has no network or
model downloads, so this module ships a SELF-CONTAINED numpy MLP
encoder with nontrivial state (a 65,536 × dim hashing-trick token
embedding matrix + two dense layers ≈ 17 MB at dim=64) that exercises
the exact seam a HuggingFace/API provider would use:

* weights come from an ``.npz`` CHECKPOINT on disk (or the deterministic
  ``fixed()`` initializer that writes one) — the load cost and memory
  are real, per actor;
* encoding is batched matrix math (hash-bucket token lookup → mean
  pool → tanh dense ×2 → L2 normalize), float32 end-to-end;
* the provider is deterministic, so distributed == local equality is
  testable.

Swapping in a real model is replacing ``TinyTextEncoder.load`` with a
framework load — the actor-pool stage (``stages/embed.NeuralEmbedStage``)
does not change.
"""

from __future__ import annotations

import numpy as np

from .dedup import stable_word_hashes


class TinyTextEncoder:
    """Fixed-weight numpy MLP text encoder (the in-repo stand-in for a
    neural provider)."""

    def __init__(self, emb: np.ndarray, w1: np.ndarray, b1: np.ndarray,
                 w2: np.ndarray, b2: np.ndarray):
        self.emb = np.ascontiguousarray(emb, np.float32)
        self.w1 = np.ascontiguousarray(w1, np.float32)
        self.b1 = np.ascontiguousarray(b1, np.float32)
        self.w2 = np.ascontiguousarray(w2, np.float32)
        self.b2 = np.ascontiguousarray(b2, np.float32)

    @property
    def dim(self) -> int:
        return self.w2.shape[1]

    @property
    def n_buckets(self) -> int:
        return self.emb.shape[0]

    def nbytes(self) -> int:
        return sum(a.nbytes for a in
                   (self.emb, self.w1, self.b1, self.w2, self.b2))

    # ---------------------------------------------------- weights io --
    @classmethod
    def fixed(cls, seed: int = 7, dim: int = 64,
              n_buckets: int = 65_536) -> "TinyTextEncoder":
        """Deterministic seeded weights (what a training run would have
        produced; ~``n_buckets × dim × 4`` bytes ≈ 16.8 MB at the
        defaults)."""
        rng = np.random.Generator(np.random.PCG64(seed))
        s = 1.0 / np.sqrt(dim)
        return cls(
            rng.normal(0, 1.0, size=(n_buckets, dim)).astype(np.float32),
            rng.normal(0, s, size=(dim, dim)).astype(np.float32),
            rng.normal(0, s, size=(dim,)).astype(np.float32),
            rng.normal(0, s, size=(dim, dim)).astype(np.float32),
            rng.normal(0, s, size=(dim,)).astype(np.float32))

    def save(self, path: str) -> None:
        np.savez(path, emb=self.emb, w1=self.w1, b1=self.b1,
                 w2=self.w2, b2=self.b2)

    @classmethod
    def load(cls, path: str) -> "TinyTextEncoder":
        """The checkpoint-load seam — a HuggingFace provider replaces
        exactly this call."""
        with np.load(path) as z:
            return cls(z["emb"], z["w1"], z["b1"], z["w2"], z["b2"])

    # ------------------------------------------------------ encoding --
    def encode_batch(self, texts: list[str]) -> np.ndarray:
        """(n, dim) float32, L2-normalized; all-zero row for empty/
        token-less text."""
        n = len(texts)
        out = np.zeros((n, self.dim), np.float32)
        word_lists = [(t or "").lower().split() for t in texts]
        flat = [w for ws in word_lists for w in ws]
        if not flat:
            return out
        buckets = (stable_word_hashes(flat)
                   % np.uint64(self.n_buckets)).astype(np.int64)
        vecs = self.emb[buckets]                      # (W, dim)
        pos = 0
        pooled = np.zeros((n, self.dim), np.float32)
        for i, ws in enumerate(word_lists):
            k = len(ws)
            if k:
                pooled[i] = vecs[pos:pos + k].mean(axis=0)
                pos += k
        # dense layers as PER-ROW matvecs: batched float32 GEMM kernels
        # pick different micro-kernels for tail rows, so a row's result
        # would depend on its batch position — matvec at a fixed shape
        # is deterministic, which the distributed==local equality gates
        # require (the layer is 64×64; vectorization loss is noise)
        h = np.empty_like(pooled)
        for i in range(n):
            h[i] = np.tanh(pooled[i] @ self.w1 + self.b1,
                           dtype=np.float32)
            h[i] = np.tanh(h[i] @ self.w2 + self.b2, dtype=np.float32)
        norms = np.linalg.norm(h, axis=1, keepdims=True)
        nz = norms[:, 0] > 0
        out[nz] = h[nz] / norms[nz]
        # rows with tokens but zero vector stay zero (degenerate case)
        has_tok = np.array([len(ws) > 0 for ws in word_lists])
        out[~has_tok] = 0.0
        return out
