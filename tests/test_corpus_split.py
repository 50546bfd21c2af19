"""Gates for the deterministic hash split: growth stability (adding docs
never moves an existing one), threshold arithmetic, approximate rates."""

import hashlib

import pyarrow as pa


def _ds(ids):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array([f"s{d % 3}" for d in ids], pa.string())}))


def test_growth_stable_and_thresholds(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    small = (td.corpus_split("/unused", docs_ds=_ds(list(range(200))))
             .to_pandas().set_index("doc_id"))
    big = (td.corpus_split("/unused", docs_ds=_ds(list(range(500))))
           .to_pandas().set_index("doc_id"))
    # adding 300 docs moved nothing
    assert (big.loc[small.index].split == small.split).all()
    # threshold arithmetic is exactly the documented slot rule
    for d, row in big.iterrows():
        slot = int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16)
        assert row.slot == slot
        exp = "val" if slot < 655 else "test" if slot < 1310 else "train"
        assert row.split == exp
    assert set(big.split) == {"train", "val", "test"} or \
        (big.split == "train").mean() > 0.9  # tiny splits may be empty


def test_rates_with_custom_pcts(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    out = (td.corpus_split("/unused", val_pct=10, test_pct=10,
                           docs_ds=_ds(list(range(3000))))
           .to_pandas())
    frac_val = (out.split == "val").mean()
    frac_test = (out.split == "test").mean()
    assert 0.07 < frac_val < 0.13 and 0.07 < frac_test < 0.13
