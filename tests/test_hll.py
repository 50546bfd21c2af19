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
