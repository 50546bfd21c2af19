"""In-memory vector store (``vector/voy_store.rs``).

The reference wraps the Voy WASM k-d tree; the backend here is an exact
normalized-matrix cosine scan (numpy) — a backend swap like the hash
embedder (SURVEY §2.3 allowance): same API surface (add → build →
search, dimension/duplicate/not-built error paths, remove with index
compaction, statistics), exact instead of approximate results, ties
pinned by insertion order (the k-d tree's ordering is backend-defined).

This is the repo's canonical *shared mutable index* — the one shape the
Dataset API can't express — so it also ships as a Ray actor
(:func:`vector_store_actor`): one actor holds the index, any number of
tasks/stages call ``add_batch``/``search`` against it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["VectorStore", "vector_store_actor", "load_dataset_into_store"]


class VectorStore:
    """``voy_store.rs:38-320`` semantics."""

    def __init__(self, dimension: int = 384):
        self.dimension = dimension
        self.id_to_index: dict[str, int] = {}
        self.index_to_id: list[str] = []
        self.pending: list[np.ndarray] = []
        self.index_built = False
        self._matrix: np.ndarray | None = None

    def add_vector(self, vec_id: str, embedding) -> None:
        """``:88-112``: dimension check, duplicate-id rejection,
        invalidates a built index."""
        emb = np.asarray(embedding, dtype=np.float64)
        if emb.shape != (self.dimension,):
            raise ValueError(
                f"Embedding dimension mismatch: expected {self.dimension}, "
                f"got {emb.shape[-1] if emb.ndim else 0}")
        if vec_id in self.id_to_index:
            raise ValueError(f"Vector ID '{vec_id}' already exists")
        self.id_to_index[vec_id] = len(self.pending)
        self.index_to_id.append(vec_id)
        self.pending.append(emb)
        self.index_built = False

    def add_batch(self, vec_ids: list[str], embeddings) -> int:
        """Batched add for actor callers (one RPC per Arrow batch)."""
        for vec_id, emb in zip(vec_ids, embeddings):
            self.add_vector(vec_id, emb)
        return len(self.pending)

    def build_index(self) -> None:
        """``:122-149``: errors on empty; builds the normalized matrix."""
        if not self.pending:
            raise ValueError("No embeddings to build index from")
        m = np.vstack(self.pending)
        self._matrix = m / np.maximum(
            np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        self.index_built = True

    def search(self, query_embedding, top_k: int) -> list[tuple[str, float]]:
        """``:167-204``: not-built / dimension errors, descending
        cosine top-k (ties by insertion order — stable argsort)."""
        if not self.index_built:
            raise ValueError("Index not built. Call build_index() first.")
        q = np.asarray(query_embedding, dtype=np.float64)
        if q.shape != (self.dimension,):
            raise ValueError(
                f"Query dimension mismatch: expected {self.dimension}, "
                f"got {q.shape[-1] if q.ndim else 0}")
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        sims = self._matrix @ qn
        top = np.argsort(-sims, kind="stable")[:top_k]
        return [(self.index_to_id[i], float(sims[i])) for i in top]

    def remove_vector(self, vec_id: str) -> None:
        """``:246-279``: compacting removal, invalidates the index."""
        idx = self.id_to_index.pop(vec_id, None)
        if idx is None:
            raise ValueError(f"Vector ID '{vec_id}' not found")
        self.index_to_id.pop(idx)
        self.pending.pop(idx)
        for k, v in self.id_to_index.items():
            if v > idx:
                self.id_to_index[k] = v - 1
        self.index_built = False
        self._matrix = None

    def clear(self) -> None:
        self.id_to_index.clear()
        self.index_to_id.clear()
        self.pending.clear()
        self._matrix = None
        self.index_built = False

    def __len__(self) -> int:
        return len(self.index_to_id)

    def is_empty(self) -> bool:
        return not self.index_to_id

    def contains(self, vec_id: str) -> bool:
        return vec_id in self.id_to_index

    def get_vector(self, vec_id: str) -> np.ndarray | None:
        idx = self.id_to_index.get(vec_id)
        return None if idx is None else self.pending[idx]

    def ids(self) -> list[str]:
        return list(self.index_to_id)

    def statistics(self) -> dict:
        """``:288-320``: vector norms over the raw (pre-normalization)
        embeddings; inf min-norm on empty stores, faithful."""
        norms = [float(np.linalg.norm(e)) for e in self.pending]
        return {
            "vector_count": len(self.index_to_id),
            "dimension": self.dimension,
            "index_built": self.index_built,
            "min_norm": min(norms) if norms else float("inf"),
            "max_norm": max(norms) if norms else 0.0,
            "avg_norm": sum(norms) / len(norms) if norms else 0.0,
        }


def vector_store_actor(dimension: int, **actor_opts):
    """Create the shared-index actor (``@ray.remote`` applied lazily so
    the pure class stays importable without Ray)."""
    import ray
    return ray.remote(**actor_opts)(VectorStore).remote(dimension) \
        if actor_opts else ray.remote(VectorStore).remote(dimension)


def load_dataset_into_store(store_actor, ds, id_col: str, emb_col: str,
                            batch_size: int = 4096) -> int:
    """Stream a Dataset into the store actor — one ``add_batch`` RPC per
    Arrow batch, pipelined (the driver only forwards object refs)."""
    import ray
    total = 0
    pend = []
    for batch in ds.iter_batches(batch_size=batch_size,
                                 batch_format="pyarrow"):
        ids = [str(v) for v in batch.column(id_col).to_pylist()]
        vecs = np.asarray(batch.column(emb_col).to_pylist(),
                          dtype=np.float64)
        pend.append(store_actor.add_batch.remote(ids, vecs))
    for ref in pend:
        total = ray.get(ref)
    return total
