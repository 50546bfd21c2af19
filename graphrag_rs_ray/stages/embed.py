"""Deterministic hash-embedding stage (actor pool).

Adds an ``embedding: list<float32>`` column computed from a text column.
The word-vector memo lives in the actor (``functions/embedding.py``,
mirroring ``vector/mod.rs:562``), amortized across batches — the reason
this is a callable class, not a bare function.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.embedding import HashEmbedder


class EmbedStage:
    def __init__(self, text_column: str = "name", dim: int = 64):
        self.text_column = text_column
        self.embedder = HashEmbedder(dim=dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        mat = self.embedder.embed_many([t or "" for t in texts])
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), self.embedder.dim)
        return batch.append_column("embedding", emb)
