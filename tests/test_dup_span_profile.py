"""Gates for duplicate-span profiling: detection guarantee on long
planted spans, interval-union arithmetic, clean docs untouched."""

import numpy as np
import pyarrow as pa


def _ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


def _rand_words(rng, n):
    return " ".join("".join(rng.choice(list("abcdefghijklmnop"), size=6))
                    for _ in range(n))


def test_planted_span_detected(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(3))
    shared = _rand_words(rng, 30)  # ~180 normalized chars >> k+w-1 = 49
    texts = {1: _rand_words(rng, 20) + " " + shared,
             2: shared + " " + _rand_words(rng, 20),
             3: _rand_words(rng, 50)}
    out = (td.dup_span_profile("/unused", docs_ds=_ds(texts))
           .to_pandas().set_index("doc_id"))
    assert set(out.index) == {1, 2, 3}
    # both carriers flag substantial coverage, the clean doc none
    assert out.loc[1].dup_chars >= 100 and out.loc[2].dup_chars >= 100
    assert out.loc[3].dup_chars == 0 and out.loc[3].n_dup_positions == 0
    assert not bool(out.loc[3].heavy_dup)
    # dup coverage never exceeds the normalized length
    assert (out.dup_chars <= out.norm_len).all()
    # heavy flag: >= 20% coverage
    for d in (1, 2):
        r = out.loc[d]
        assert bool(r.heavy_dup) == (5 * r.dup_chars >= r.norm_len)


def test_identical_docs_fully_covered(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(8))
    t = _rand_words(rng, 60)
    out = (td.dup_span_profile("/unused", docs_ds=_ds({1: t, 2: t}))
           .to_pandas().set_index("doc_id"))
    # identical docs: every fingerprint shared -> one island spanning
    # first..last selection; coverage is high though edges under w stay
    # unfingerprinted
    for d in (1, 2):
        assert bool(out.loc[d].heavy_dup)
        assert out.loc[d].dup_chars >= 0.8 * out.loc[d].norm_len


def test_empty_and_short_docs(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    out = (td.dup_span_profile("/unused",
                               docs_ds=_ds({1: "", 2: "tiny", 3: "tiny"}))
           .to_pandas().set_index("doc_id"))
    assert out.loc[1].norm_len == 0 and not bool(out.loc[1].heavy_dup)
    # docs shorter than k have no fingerprints at all
    assert (out.n_dup_positions == 0).all()
