"""Gates for DSIR importance scoring: naive re-derivation equality,
target-vocabulary docs selected, off-distribution docs rejected."""

import math

import numpy as np
import pyarrow as pa

from graphrag_rs_ray.functions.textstats import lm_tokenize


def _ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


def _naive(texts, mod=50, rem=3):
    fc, ft = {}, {}
    inst = []
    for d in sorted(texts):
        toks = lm_tokenize(texts[d])
        is_t = d % mod == rem
        for p, c in zip(toks, toks[1:]):
            fc[(p, c)] = fc.get((p, c), 0) + 1
            if is_t:
                ft[(p, c)] = ft.get((p, c), 0) + 1
            inst.append((d, is_t, (p, c)))
    n_raw = len(inst)
    n_t = sum(1 for _, t, _ in inst if t)
    v = len(fc)
    out = {}
    for d, is_t, f in inst:
        lq = (math.floor(math.log((ft.get(f, 0) + 1.0) / (n_t + v)) * 1e6)
              - math.floor(math.log((fc[f] + 1.0) / (n_raw + v)) * 1e6))
        n, s, _ = out.get(d, (0, 0, is_t))
        out[d] = (n + 1, s + lq, is_t)
    return {d: (n, s, int(np.floor_divide(s * 1000, n)), t)
            for d, (n, s, t) in out.items()}


def test_matches_naive(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(31))
    words = ["red", "blue", "green", "ochre", "teal", "mauve", "x1", "42!"]
    texts = {i: " ".join(rng.choice(words, size=int(rng.integers(0, 25))))
             for i in range(60)}
    texts[53] = "quantum flux capacitor resonance " * 5   # target (53%50==3)
    out = (td.dsir_scores("/unused", docs_ds=_ds(texts))
           .to_pandas().set_index("doc_id").sort_index())
    exp = _naive(texts)
    assert set(out.index) == set(exp)
    for d, (n, s, avg, is_t) in exp.items():
        row = out.loc[d]
        assert (row.n_feats, row.ratio_micro, row.avg_ratio_nano,
                row.is_target) == (n, s, avg, is_t)
        assert bool(row.selected) == (avg > 0)


def test_target_like_docs_selected(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(32))
    noise = lambda n: " ".join(
        "".join(rng.choice(list("abcdefgh"), size=5)) for _ in range(n))
    target_text = "neural scaling laws for language data selection " * 4
    texts = {3: target_text,                       # the target split doc
             10: target_text + " extra tail here",  # target-like -> selected
             11: noise(30)}                          # off-distribution
    out = (td.dsir_scores("/unused", docs_ds=_ds(texts))
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc[3].is_target) and bool(out.loc[3].selected)
    assert not bool(out.loc[10].is_target) and bool(out.loc[10].selected)
    assert not bool(out.loc[11].selected)
    assert out.loc[10].avg_ratio_nano > out.loc[11].avg_ratio_nano
