"""Gates for the CCNet-style bigram-LM perplexity scorer: the grouped
no-join pipeline vs a naive pure-Python bigram LM, monotonicity of the
score (repetitive text < novel text), and head/middle/tail bucket
semantics (per-language thirds, value ties share a bucket)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.textstats import lm_tokenize


def _docs_ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


def _naive(texts: dict[int, str]):
    bigr, ctx, vocab, seqs = {}, {}, set(), {}
    for d in sorted(texts):
        toks = lm_tokenize(texts[d])
        if not toks:
            continue
        seq = ["<s>"] + toks
        seqs[d] = seq
        for p, c in zip(seq, seq[1:]):
            bigr[(p, c)] = bigr.get((p, c), 0) + 1
            ctx[p] = ctx.get(p, 0) + 1
            vocab.add(c)
    v = len(vocab)
    out = {}
    for d, seq in seqs.items():
        lps = [math.floor(math.log((bigr[(p, c)] + 1.0) / (ctx[p] + v)) * 1e6)
               for p, c in zip(seq, seq[1:])]
        n, nll = len(lps), -sum(lps)
        out[d] = (n, nll, (nll * 1000) // n)
    return out


def test_pipeline_matches_naive(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(5))
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "Mixed",
             "punct,ed!", "UPPER", "123", "x"]
    texts = {i: " ".join(rng.choice(words, size=int(rng.integers(0, 30))))
             for i in range(1, 15)}
    texts[20] = "   "          # whitespace-only: no rows
    texts[21] = "!!! ???"      # tokens normalize to empty: no rows
    out = (td.lm_perplexity("/unused", docs_ds=_docs_ds(texts))
           .to_pandas().set_index("doc_id").sort_index())
    exp = _naive(texts)
    assert set(out.index) == set(exp)
    for d, (n, nll, avg) in exp.items():
        row = out.loc[d]
        assert (row.n_tokens, row.nll_micro, row.avg_nll_nano) == (n, nll, avg)
        assert row.ppl == round(math.exp(avg / 1e9), 6)
        assert row.lang == "xx"  # injected ds has no lang column


def test_repetitive_text_scores_lower(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    texts = {1: "spam ham " * 40,
             2: ("one two three four five six seven eight nine ten eleven "
                 "twelve thirteen fourteen fifteen sixteen seventeen")}
    out = (td.lm_perplexity("/unused", docs_ds=_docs_ds(texts))
           .to_pandas().set_index("doc_id"))
    assert out.loc[1].avg_nll_nano < out.loc[2].avg_nll_nano
    assert out.loc[1].ppl < out.loc[2].ppl


def test_buckets_thirds_and_ties(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rep = "spam ham " * 30
    mid = "walk trot walk canter trot walk gallop trot canter walk " * 4
    rare = ("quark meson lepton boson hadron gluon photon neutrino axion "
            "tachyon graviton curvature manifold spinor")
    texts = {1: rep, 2: rep, 3: mid, 4: rare}
    out = (td.perplexity_buckets("/unused", docs_ds=_docs_ds(texts))
           .to_pandas().set_index("doc_id"))
    # docs 1 and 2 are identical => identical score => SAME bucket; with
    # the head cutoff at the smallest value covering n/3 both land head
    assert out.loc[1].bucket == out.loc[2].bucket == "head"
    assert out.loc[4].bucket == "tail"
    assert set(out.bucket) == {"head", "middle", "tail"}
    assert (out.sort_values("avg_nll_nano").bucket.map(
        {"head": 0, "middle": 1, "tail": 2}).is_monotonic_increasing)
