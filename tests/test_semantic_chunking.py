from graphrag_rs_ray.functions.semantic_chunking import (
    ABSOLUTE,
    PERCENTILE,
    STDDEV,
    SemanticChunker,
    SemanticChunkerConfig,
    split_sentences,
)

TEXT = ("The cat sat on the mat. The cat slept on the mat. "
        "Quantum entanglement defies classical physics! "
        "Particles correlate across distance? "
        "The cat woke up on the mat.")


def test_split_sentences():
    s = split_sentences(TEXT)
    assert len(s) == 5
    assert s[0] == "The cat sat on the mat."
    assert s[2].startswith("Quantum")
    assert split_sentences("") == []
    assert split_sentences("no terminal punctuation") == ["no terminal punctuation"]
    assert split_sentences("line one\n\nline two.") == ["line one", "line two."]


def test_chunking_deterministic_and_covers():
    for strategy, amount in ((PERCENTILE, 50.0), (STDDEV, 0.5), (ABSOLUTE, 0.3)):
        cfg = SemanticChunkerConfig(breakpoint_strategy=strategy, threshold_amount=amount)
        a = SemanticChunker(cfg).chunk(TEXT)
        b = SemanticChunker(cfg).chunk(TEXT)
        assert a == b
        assert a, strategy
        total = sum(c["sentence_count"] for c in a)
        assert total == 5  # every sentence lands in exactly one chunk


def test_absolute_low_threshold_splits_everywhere():
    cfg = SemanticChunkerConfig(breakpoint_strategy=ABSOLUTE, threshold_amount=0.0)
    chunks = SemanticChunker(cfg).chunk(TEXT)
    # distances are all > 0 between distinct sentences → one chunk per sentence
    assert len(chunks) == 5


def test_max_chunk_size_splits():
    cfg = SemanticChunkerConfig(breakpoint_strategy=ABSOLUTE, threshold_amount=2.0,
                                max_chunk_size=2)
    chunks = SemanticChunker(cfg).chunk(TEXT)
    assert all(c["sentence_count"] <= 2 for c in chunks)
    assert sum(c["sentence_count"] for c in chunks) == 5


def test_min_chunk_size_merges_forward():
    cfg = SemanticChunkerConfig(breakpoint_strategy=ABSOLUTE, threshold_amount=0.0,
                                min_chunk_size=2)
    chunks = SemanticChunker(cfg).chunk(TEXT)
    assert all(c["sentence_count"] >= 2 for c in chunks)


def test_single_sentence():
    chunks = SemanticChunker().chunk("Only one sentence here.")
    assert len(chunks) == 1 and chunks[0]["sentence_count"] == 1
