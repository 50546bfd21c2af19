"""Gates for the HyperLogLog sketch: kernel rank arithmetic, reshard
invariance of the merged registers, and estimate accuracy vs the exact
distinct count (HLL standard error 1.04/sqrt(4096) ~ 1.6%)."""

import hashlib

import pyarrow as pa

from graphrag_rs_ray.pipelines.training_data import (
    HLL_M,
    _hll_bucket_rank,
    hll_estimate,
    hll_registers,
)


def test_kernel_rank():
    b, r = _hll_bucket_rank("hello")
    hx = hashlib.md5(b"hello").hexdigest()
    assert b == int(hx[:3], 16) and 0 <= b < HLL_M
    v = int(hx[3:13], 16)
    assert r == 41 - v.bit_length()
    assert 1 <= r <= 41


def _docs(n, words_per_doc=20):
    # ~n*words distinct tokens: token = f"w{i}" unique per position
    texts = [" ".join(f"w{i}_{j}" for j in range(words_per_doc))
             for i in range(n)]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_reshard_invariance_and_accuracy(ray_session):
    import ray.data as rd
    docs = _docs(2000)          # 40k distinct tokens
    a = (hll_registers("", docs_ds=rd.from_arrow(docs).repartition(1))
         .to_pandas().sort_values("bucket").reset_index(drop=True))
    b = (hll_registers("", docs_ds=rd.from_arrow(docs).repartition(13))
         .to_pandas().sort_values("bucket").reset_index(drop=True))
    assert a.equals(b)          # max-merge is order/shard free

    est = hll_estimate("", docs_ds=rd.from_arrow(docs))
    exact = 2000 * 20
    got = est["est_x10k"].iloc[0] / 10000.0
    assert abs(got - exact) / exact < 0.05    # ~3 sigma for m=4096
    # duplicated corpus -> identical registers (sketch counts DISTINCT)
    dup = pa.concat_tables([docs, docs])
    c = (hll_registers("", docs_ds=rd.from_arrow(dup))
         .to_pandas().sort_values("bucket").reset_index(drop=True))
    assert a.equals(c)


# ------------------------------------------------ Count-Min gates --

def test_cms_guarantee_and_invariance(ray_session):
    import ray.data as rd

    from graphrag_rs_ray.pipelines.training_data import (
        CMS_W,
        cms_heavy_hitters,
        cms_registers,
    )

    docs = _docs(300)
    # plant one genuinely heavy token
    heavy = pa.table({"doc_id": pa.array([9999], pa.int64()),
                      "text": pa.array([("hot " * 500).strip()],
                                       pa.string())})
    corpus = pa.concat_tables([docs, heavy])

    hh = cms_heavy_hitters("", k=5,
                           docs_ds=rd.from_arrow(corpus)).set_index("token")
    assert hh.index[0] == "hot" and hh.loc["hot", "n_exact"] == 500
    # the CMS one-sided error guarantee: never underestimates
    assert (hh["overestimate"] >= 0).all()
    assert (hh["est"] >= hh["n_exact"]).all()

    a = (cms_registers("", docs_ds=rd.from_arrow(corpus).repartition(1))
         .to_pandas().sort_values(["row", "cell"]).reset_index(drop=True))
    b = (cms_registers("", docs_ds=rd.from_arrow(corpus).repartition(17))
         .to_pandas().sort_values(["row", "cell"]).reset_index(drop=True))
    assert a.equals(b)          # sum-merge is shard free
    assert (a["cell"] < CMS_W).all() and a["row"].isin([0, 1, 2, 3]).all()
    # total mass per row == total token instances
    per_row = a.groupby("row")["cnt"].sum()
    assert per_row.nunique() == 1


# ---------------------------------------------------- Bloom gates --

def test_bloom_no_false_negatives(ray_session):
    import ray.data as rd

    from graphrag_rs_ray.pipelines.training_data import (
        BLOOM_M,
        bloom_bits,
        bloom_membership,
    )

    corpus = _docs(400)
    mem = bloom_membership("", docs_ds=rd.from_arrow(corpus))
    present = mem[mem["in_corpus"]]
    absent = mem[~mem["in_corpus"]]
    assert len(present) > 0 and len(present) == len(absent)
    assert present["hit"].all()              # NEVER a false negative
    fp_rate = absent["hit"].mean()
    assert fp_rate < 0.05                    # k=7, m=2^18, n~8k -> tiny

    a = (bloom_bits("", docs_ds=rd.from_arrow(corpus).repartition(1))
         .to_pandas().sort_values("bit").reset_index(drop=True))
    b = (bloom_bits("", docs_ds=rd.from_arrow(corpus).repartition(11))
         .to_pandas().sort_values("bit").reset_index(drop=True))
    assert a.equals(b)                       # union-merge is shard free
    assert a["bit"].is_unique and (a["bit"] < BLOOM_M).all()
