"""Property test: bucketed_join ≡ pandas merge on randomized inputs
(missing keys, duplicate keys, skewed keys)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bucketed_join_matches_pandas(ray_session, seed):
    import ray.data as rd
    from graphrag_rs_ray.stages.hashagg import bucketed_join

    rng = np.random.default_rng(seed)
    n_l, n_r = 4000, 1500
    left = pd.DataFrame({
        "k": rng.integers(0, 800, n_l),             # dup + missing keys
        "lv": rng.integers(0, 1000, n_l),
    })
    # skew: 25% of left rows share one hot key
    left.loc[: n_l // 4, "k"] = 7
    right = pd.DataFrame({
        "k": rng.integers(0, 1000, n_r),
        "rv": rng.integers(0, 1000, n_r),
    })

    lds = rd.from_pandas(left).map_batches(lambda t: t, batch_format="pyarrow",
                                           batch_size=500)
    rds = rd.from_pandas(right).map_batches(lambda t: t, batch_format="pyarrow",
                                            batch_size=300)
    got = (bucketed_join(lds, rds, on=["k"], num_buckets=16)
           .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    want = (left.merge(right, on="k", how="inner")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    assert len(got) == len(want)
    for c in ("k", "lv", "rv"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()


def test_bucketed_join_rejects_ambiguous_columns(ray_session):
    import ray.data as rd
    from graphrag_rs_ray.stages.hashagg import bucketed_join
    a = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    b = rd.from_pandas(pd.DataFrame({"k": [1], "v": [3]}))
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_join(a, b, on=["k"])
