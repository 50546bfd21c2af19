"""LazyGraphRAG pipeline kernels vs the reference's own tests
(``lightrag/lazy_pipeline.rs:325-401``)."""

from graphrag_rs_ray.pipelines.lazy_pipeline import (
    chunk_text,
    normalize_concept,
)


def test_chunking_reference_case():
    # :381-397 — chunk_size 10, overlap 2
    chunks = chunk_text("This is a test document", "test_doc",
                        chunk_size=10, chunk_overlap=2)
    assert chunks
    assert len(chunks[0]["content"]) <= 10
    # boundary arithmetic: starts advance by size - overlap
    assert [c["start_offset"] for c in chunks] == [0, 8, 16]
    assert chunks[0]["content"] == "This is a "
    assert chunks[1]["content"] == "a test doc"
    assert chunks[2]["content"] == "ocument"
    assert [c["chunk_id"] for c in chunks] == [
        "test_doc_0", "test_doc_1", "test_doc_2"]


def test_chunking_exact_fit_breaks():
    # end == len on the first window → single chunk, no empty tail
    chunks = chunk_text("0123456789", "d", chunk_size=10, chunk_overlap=2)
    assert len(chunks) == 1
    assert chunks[0]["end_offset"] == 10


def test_chunking_empty():
    assert chunk_text("", "d") == []


def test_normalize_concept_quirk():
    # the alnum/underscore filter removes spaces BEFORE the space→_
    # replace, so multiword concepts concatenate (pinned quirk)
    assert normalize_concept("Machine Learning") == "machinelearning"
    assert normalize_concept("deep_learning") == "deep_learning"
    assert normalize_concept("C-3PO!") == "c3po"
