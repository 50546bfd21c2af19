"""Gates for duplicate-span removal: keep-first-occurrence rule, exact
splice arithmetic, identical-doc collapse, no-op on clean docs."""

import numpy as np
import pyarrow as pa


def _ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


def _norm(t: str) -> str:
    return "".join(c for c in t if c.isascii() and c.isalnum()).lower()


def _words(rng, n):
    return " ".join("".join(rng.choice(list("abcdefghijklmnop"), size=6))
                    for _ in range(n))


def test_keep_first_occurrence(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(11))
    shared = _words(rng, 30)
    pre, post = _words(rng, 15), _words(rng, 15)
    texts = {1: pre + " " + shared,          # first occurrence: kept whole
             2: shared + " " + post,         # later copy: span excised
             3: _words(rng, 40)}             # clean: untouched
    out = (td.remove_dup_spans("/unused", docs_ds=_ds(texts))
           .to_pandas().set_index("doc_id"))
    assert out.loc[1].cleaned_norm == _norm(texts[1])
    assert out.loc[1].removed_chars == 0
    assert out.loc[3].cleaned_norm == _norm(texts[3])
    # doc 2 lost a long prefix; the unshared tail survives as a suffix
    # (plus a boundary remnant of the shared region shorter than k+w —
    # fingerprints near the boundary see different context in each doc)
    c2 = out.loc[2].cleaned_norm
    assert out.loc[2].removed_chars > 100
    assert c2.endswith(_norm(post))
    assert len(c2) <= len(_norm(post)) + 40 + 10
    # splice arithmetic: len(cleaned) + removed == norm_len, everywhere
    assert ((out.cleaned_norm.str.len() + out.removed_chars)
            == out.norm_len).all()


def test_identical_docs_second_mostly_vanishes(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(12))
    t = _words(rng, 60)
    out = (td.remove_dup_spans("/unused", docs_ds=_ds({5: t, 9: t}))
           .to_pandas().set_index("doc_id"))
    assert out.loc[5].removed_chars == 0          # smaller id keeps all
    assert out.loc[9].removed_chars >= 0.8 * out.loc[9].norm_len
    assert out.loc[9].cleaned_norm == _norm(t)[len(_norm(t))
                                               - len(out.loc[9].cleaned_norm):] \
        or len(out.loc[9].cleaned_norm) < 0.2 * out.loc[9].norm_len


def test_no_dups_no_change(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(13))
    texts = {i: _words(rng, 30) for i in range(1, 5)}
    out = (td.remove_dup_spans("/unused", docs_ds=_ds(texts))
           .to_pandas().set_index("doc_id"))
    assert (out.removed_chars == 0).all()
    for d, t in texts.items():
        assert out.loc[d].cleaned_norm == _norm(t)
