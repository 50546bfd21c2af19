"""Gates for MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken
2003): the vectorized ``Winnower`` kernel vs a naive pure-Python
re-derivation, the paper's detection guarantee, and the pair pipeline's
stop-gram cap semantics."""

import numpy as np
import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.dedup import Winnower


def _naive(text: str, k: int, w: int, base: int = 257):
    """Straight-from-the-paper reference: Python big-int polynomial hash
    mod 2^64 masked to 63 bits, rightmost-min selection per window."""
    s = "".join(c for c in text if c.isascii() and c.isalnum()).lower()
    n = len(s) - k + 1
    if n <= 0:
        return set()
    h = [sum(ord(s[i + j]) * pow(base, k - 1 - j, 1 << 64)
             for j in range(k)) % (1 << 64) & ((1 << 63) - 1)
         for i in range(n)]
    sel = set()
    for start in range(max(n - w + 1, 1)):
        win = h[start:start + w]
        m = min(win)
        # rightmost position attaining the window minimum
        sel.add(start + max(i for i, v in enumerate(win) if v == m))
    return {(p, h[p]) for p in sel}


@pytest.mark.parametrize("k,w", [(4, 3), (8, 4), (12, 5)])
def test_kernel_matches_naive(k, w):
    wn = Winnower(k=k, w=w)
    rng = np.random.Generator(np.random.PCG64(k * 100 + w))
    alphabet = list("abcdefg 123,.\nÉß日")  # non-ASCII must drop
    cases = ["", "a" * (k - 1), "a" * k, "a" * (k + w - 2),
             "the quick brown fox jumps over the lazy dog" * 3]
    cases += ["".join(rng.choice(alphabet, size=int(n)))
              for n in rng.integers(1, 200, size=20)]
    for text in cases:
        pos, fp = wn.fingerprints(text)
        got = set(zip(pos.tolist(), fp.tolist()))
        assert got == _naive(text, k, w), repr(text[:40])
        assert list(pos) == sorted(set(pos))  # distinct, position-sorted


def test_detection_guarantee():
    """Any shared substring of length >= k + w - 1 (normalized) must
    produce at least one shared fingerprint VALUE between the two docs."""
    wn = Winnower(k=8, w=4)
    rng = np.random.Generator(np.random.PCG64(9))
    letters = list("abcdefghijklmnopqrstuvwxyz")
    for trial in range(20):
        shared = "".join(rng.choice(letters, size=8 + 4 - 1 + int(trial)))
        pre_a = "".join(rng.choice(letters, size=int(rng.integers(0, 60))))
        pre_b = "".join(rng.choice(letters, size=int(rng.integers(0, 60))))
        _, fa = wn.fingerprints(pre_a + shared)
        _, fb = wn.fingerprints(pre_b + shared)
        assert set(fa) & set(fb), f"guarantee violated at trial {trial}"


def _docs_ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


PASSAGE = ("Winnowing selects the rightmost minimum hash in each sliding "
           "window of consecutive gram hashes, guaranteeing detection of "
           "sufficiently long shared substrings across documents.")


def test_dup_pairs_planted(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    texts = {
        1: "Unrelated preamble one. " + PASSAGE,
        2: PASSAGE + " Entirely different closing remarks follow here.",
        3: "Nothing in common with the others at all, a separate topic "
           "about rivers, mountains and weather patterns in the north.",
    }
    out = td.winnow_dup_pairs("/unused", docs_ds=_docs_ds(texts)).to_pandas()
    got = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in got
    assert all(3 not in pair for pair in got)
    n = out.set_index(["doc_a", "doc_b"]).n_shared[(1, 2)]
    assert n >= 4  # default min_shared


def test_stop_gram_cap(ray_session):
    """A fingerprint present in more than max_docs_per_fp docs is dropped;
    docs related ONLY through boilerplate produce no pairs."""
    from graphrag_rs_ray.pipelines import training_data as td

    texts = {i: f"unique lead-in number {i} distinct words. " + PASSAGE
             for i in range(1, 6)}
    capped = td.winnow_dup_pairs("/unused", max_docs_per_fp=4,
                                 docs_ds=_docs_ds(texts)).to_pandas()
    assert capped.empty  # every shared fp is in 5 > 4 docs
    uncapped = td.winnow_dup_pairs("/unused", max_docs_per_fp=16,
                                   docs_ds=_docs_ds(texts)).to_pandas()
    assert len(uncapped) == 10  # all C(5,2) pairs share the passage
