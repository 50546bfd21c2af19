"""Gates for the incremental fingerprint index: batch flags equal the
full-corpus derivation (path equality), ingest is idempotent per batch
id, chaining sees all prior batches, config mismatch aborts."""

import os

import numpy as np
import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.dedup import Winnower


def _ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


def _words(rng, n):
    return " ".join("".join(rng.choice(list("abcdefghijklmnop"), size=6))
                    for _ in range(n))


def _expected_flags(old: dict[int, str], new: dict[int, str], k=40, w=10):
    wn = Winnower(k=k, w=w)
    corpus_fps = set()
    for t in old.values():
        corpus_fps |= set(wn.fingerprints(t)[1].tolist())
    out = {}
    for d, t in new.items():
        fps = set(wn.fingerprints(t)[1].tolist())
        out[d] = (len(fps), len(fps & corpus_fps))
    return out


def test_incremental_equals_full(ray_session, tmp_path):
    from graphrag_rs_ray.state.fp_index import FingerprintIndex

    rng = np.random.Generator(np.random.PCG64(21))
    shared = _words(rng, 30)
    old = {1: _words(rng, 40), 2: _words(rng, 10) + " " + shared}
    new = {10: shared + " " + _words(rng, 10),   # dup of corpus doc 2
           11: _words(rng, 40),                  # novel
           12: old[1]}                           # exact copy of doc 1
    idx = FingerprintIndex(str(tmp_path / "fpi"))
    idx.ingest("b1", _ds(old))
    flags = (idx.ingest("b2", _ds(new))
             .to_pandas().set_index("doc_id").sort_index())
    exp = _expected_flags(old, new)
    for d, (nf, nsh) in exp.items():
        assert flags.loc[d].n_fps == nf
        assert flags.loc[d].n_shared_with_corpus == nsh
    assert bool(flags.loc[10].dup_of_corpus)
    assert bool(flags.loc[12].dup_of_corpus)
    assert not bool(flags.loc[11].dup_of_corpus)


def test_ingest_idempotent_and_chained(ray_session, tmp_path):
    from graphrag_rs_ray.state.fp_index import FingerprintIndex

    rng = np.random.Generator(np.random.PCG64(22))
    b1 = {1: _words(rng, 40)}
    b2 = {2: _words(rng, 40)}
    b3 = {3: b1[1], 4: b2[2], 5: _words(rng, 40)}
    idx = FingerprintIndex(str(tmp_path / "fpi"))
    idx.ingest("b1", _ds(b1))
    idx.ingest("b1", _ds(b1))          # re-run: no duplicate batch
    assert idx.batches() == ["b1"]
    idx.ingest("b2", _ds(b2))
    f3 = (idx.ingest("b3", _ds(b3))
          .to_pandas().set_index("doc_id"))
    assert bool(f3.loc[3].dup_of_corpus)   # matches batch 1
    assert bool(f3.loc[4].dup_of_corpus)   # matches batch 2
    assert not bool(f3.loc[5].dup_of_corpus)
    # first-batch flags against an EMPTY index: nothing is a corpus dup
    idx2 = FingerprintIndex(str(tmp_path / "fpi2"))
    f1 = idx2.ingest("b1", _ds(b1)).to_pandas()
    assert not f1.dup_of_corpus.any()


def test_config_mismatch_aborts(ray_session, tmp_path):
    from graphrag_rs_ray.state.fp_index import FingerprintIndex

    FingerprintIndex(str(tmp_path / "fpi"), k=40, w=10)
    with pytest.raises(ValueError, match="k=40"):
        FingerprintIndex(str(tmp_path / "fpi"), k=12, w=5)
