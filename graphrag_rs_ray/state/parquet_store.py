"""Parquet graph persistence — port of
``graphrag-core/src/persistence/parquet.rs`` (entity table save/load
with the reference schema; relationships / chunks / documents are
warn-and-skip TODO stubs IN THE REFERENCE — pinned).  The repo's real
scale sink is ``pipelines/kg.write_graph`` (sharded parquet +
manifests); this module is the drop-in shape for users of the
reference API.

Semantics pinned:

- Entity schema (``:194-210``): id, name, entity_type, confidence
  (float32), mention_count (int64), embedding (list<float32>, written
  as ALL-NULL in the reference — pinned).
- ``save_entities`` skips writing entirely when the graph has no
  entities (warn path).
- ``load_entities`` (``:252-370``) reads only the first FOUR columns —
  loaded entities carry empty mentions and no embedding, and the
  mention_count column is dropped on load (quirk, pinned).
- ParquetConfig: snappy default, row_group_size 10000, dictionary
  encoding; compression mapped onto pyarrow codecs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

_COMPRESSION = {"uncompressed": "NONE", "snappy": "SNAPPY",
                "gzip": "GZIP", "lz4": "LZ4", "zstd": "ZSTD"}


@dataclass
class ParquetConfig:
    compression: str = "snappy"
    row_group_size: int = 10000
    dictionary_encoding: bool = True


class ParquetPersistence:
    def __init__(self, base_dir: str,
                 config: ParquetConfig | None = None):
        self.base_dir = base_dir
        self.config = config if config is not None else ParquetConfig()
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.base_dir, f"{table}.parquet")

    # ---------------------------------------------------- entities --

    def save_entities(self, entities: list[dict]):
        if not entities:
            return                        # reference warn-skip
        tbl = pa.table({
            "id": pa.array([e["entity_id"] for e in entities],
                           pa.string()),
            "name": pa.array([e["name"] for e in entities], pa.string()),
            "entity_type": pa.array([e["type"] for e in entities],
                                    pa.string()),
            "confidence": pa.array([e.get("conf", 0.0)
                                    for e in entities], pa.float32()),
            "mention_count": pa.array(
                [e.get("mention_count", 0) for e in entities],
                pa.int64()),
            # the reference writes an all-null embedding column
            "embedding": pa.array([None] * len(entities),
                                  pa.list_(pa.float32()))})
        pq.write_table(
            tbl, self._path("entities"),
            compression=_COMPRESSION[self.config.compression],
            row_group_size=self.config.row_group_size,
            use_dictionary=self.config.dictionary_encoding)

    def load_entities(self) -> list[dict]:
        path = self._path("entities")
        if not os.path.exists(path):
            raise FileNotFoundError(f"Entities file not found: {path}")
        tbl = pq.read_table(path)
        out = []
        for i in range(len(tbl)):
            out.append({
                "entity_id": tbl.column("id")[i].as_py(),
                "name": tbl.column("name")[i].as_py(),
                "type": tbl.column("entity_type")[i].as_py(),
                "conf": tbl.column("confidence")[i].as_py(),
                # reference quirk: mentions come back EMPTY (the
                # mention_count column is not read on load)
                "mentions": [],
                "embedding": None})
        return out

    # ------------------------------- reference TODO stubs (pinned) --

    def save_relationships(self, _graph=None):
        return None

    def load_relationships(self) -> list:
        return []

    def save_chunks(self, _graph=None):
        return None

    def load_chunks(self) -> list:
        return []

    def save_documents(self, _graph=None):
        return None

    def load_documents(self) -> list:
        return []

    # -------------------------------------------------- graph-level --

    def save_graph(self, graph: dict):
        """``:142-163`` — entities real, the rest TODO no-ops."""
        self.save_entities(graph.get("entities", []))
        self.save_relationships(graph)
        self.save_chunks(graph)
        self.save_documents(graph)

    def load_graph(self) -> dict:
        """``:165-205`` — documents/chunks/relationships come back
        empty (reference stubs)."""
        return {"documents": self.load_documents(),
                "chunks": self.load_chunks(),
                "entities": self.load_entities(),
                "relationships": self.load_relationships()}


__all__ = ["ParquetConfig", "ParquetPersistence"]
