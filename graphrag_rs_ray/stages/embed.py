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


# per-worker-process load bookkeeping: proves (and tests) that model
# weights load once per ACTOR, never per batch
_NEURAL_LOADS = {"n": 0}


class NeuralEmbedStage:
    """Actor-pool stage holding a NEURAL provider — the model-in-
    ``__init__`` seam for the reference's embedding trait
    (``embeddings/huggingface.rs`` / ``api_providers.rs``;
    ``HOW_IT_WORKS.md:690-698``).  ``checkpoint`` (an ``.npz`` path) is
    loaded ONCE per actor — ~17 MB of weights at the defaults, so per-
    actor memory is ``17 MB + batch``; a real HuggingFace model swaps
    into ``TinyTextEncoder.load`` without touching this stage.  Use as

        ds.map_batches(NeuralEmbedStage,
                       fn_constructor_kwargs={"checkpoint": path},
                       batch_format="pyarrow", concurrency=N)
    """

    def __init__(self, text_column: str = "text",
                 checkpoint: str | None = None, seed: int = 7,
                 dim: int = 64, report_loads: bool = False):
        from ..functions.neural_embedding import TinyTextEncoder
        self.text_column = text_column
        self.report_loads = report_loads
        self.encoder = (TinyTextEncoder.load(checkpoint) if checkpoint
                        else TinyTextEncoder.fixed(seed=seed, dim=dim))
        _NEURAL_LOADS["n"] += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        mat = self.encoder.encode_batch(texts)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), self.encoder.dim)
        batch = batch.append_column("embedding", emb)
        if self.report_loads:      # test/diagnostic: init-once evidence
            batch = batch.append_column(
                "loads_in_worker",
                pa.array([_NEURAL_LOADS["n"]] * batch.num_rows,
                         pa.int64()))
        return batch
