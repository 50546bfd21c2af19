"""Parquet persistence vs ``persistence/parquet.rs`` semantics."""

import pyarrow.parquet as pq
import pytest

from graphrag_rs_ray.state.parquet_store import (
    ParquetConfig,
    ParquetPersistence,
)

ENTS = [
    {"entity_id": "e1", "name": "Alice", "type": "person", "conf": 0.9,
     "mention_count": 3},
    {"entity_id": "e2", "name": "Acme", "type": "organization",
     "conf": 0.8, "mention_count": 1},
]


def test_roundtrip_with_reference_quirks(tmp_path):
    p = ParquetPersistence(str(tmp_path))
    p.save_graph({"entities": ENTS})
    g = p.load_graph()
    assert [e["entity_id"] for e in g["entities"]] == ["e1", "e2"]
    assert g["entities"][0]["name"] == "Alice"
    assert abs(g["entities"][0]["conf"] - 0.9) < 1e-6   # float32
    # quirks: mentions come back empty, embedding None, and the
    # relationship/chunk/document tables are reference TODO stubs
    assert g["entities"][0]["mentions"] == []
    assert g["entities"][0]["embedding"] is None
    assert g["relationships"] == [] and g["chunks"] == []
    assert g["documents"] == []


def test_schema_matches_reference(tmp_path):
    p = ParquetPersistence(str(tmp_path))
    p.save_entities(ENTS)
    schema = pq.read_schema(str(tmp_path / "entities.parquet"))
    assert schema.names == ["id", "name", "entity_type", "confidence",
                            "mention_count", "embedding"]
    assert str(schema.field("confidence").type) == "float"
    assert str(schema.field("mention_count").type) == "int64"
    # the embedding column is written all-null (pinned)
    tbl = pq.read_table(str(tmp_path / "entities.parquet"))
    assert tbl.column("embedding").null_count == len(ENTS)


def test_empty_graph_skips_write(tmp_path):
    p = ParquetPersistence(str(tmp_path))
    p.save_entities([])
    with pytest.raises(FileNotFoundError, match="not found"):
        p.load_entities()


def test_compression_codecs(tmp_path):
    for codec in ("uncompressed", "snappy", "gzip", "zstd"):
        d = tmp_path / codec
        p = ParquetPersistence(str(d), ParquetConfig(compression=codec))
        p.save_entities(ENTS)
        assert len(p.load_entities()) == 2
