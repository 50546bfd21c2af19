"""Path equality for the concept-edge vocabulary encoding: the driver-
broadcast int32-dictionary fast path and the bucketed string-pair scale
path (vocab_broadcast_limit=0 forces it) must produce identical edges —
including bit-equal float64 Jaccard confidences (same op order)."""

import pyarrow as pa


def _lists_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "chunk_id": pa.array([r[0] for r in rows], pa.string()),
        "concepts": pa.array([sorted(set(r[1])) for r in rows],
                             pa.list_(pa.string())),
    })).repartition(3)


ROWS = [
    ("c1", ["alpha", "beta", "gamma"]),
    ("c2", ["alpha", "beta"]),
    ("c3", ["beta", "gamma", "delta"]),
    ("c4", ["alpha", "gamma"]),
    ("c5", ["delta", "epsilon"]),
    ("c6", ["delta", "epsilon", "alpha"]),
    ("c7", ["zeta"]),
    ("c8", []),
]


def _norm(ds):
    import pandas as pd
    df = ds.to_pandas()
    if df.empty:        # empty Ray blocks carry no columns (known quirk)
        return pd.DataFrame()
    return (df.sort_values(["concept_a", "concept_b"])
            .reset_index(drop=True))


def test_concept_edge_paths_equal(ray_session):
    from graphrag_rs_ray.pipelines.concepts import concept_edges_from_lists

    lists = _lists_ds(ROWS).materialize()
    fast = _norm(concept_edges_from_lists(lists, 2))
    slow = _norm(concept_edges_from_lists(lists, 2,
                                          vocab_broadcast_limit=0))
    assert len(fast) > 0
    assert fast.equals(slow)        # includes bit-equal confidences

    # planted spot checks: (alpha,beta) in c1+c2 → count 2,
    # jaccard = 2 / (4 + 3 - 2)
    row = fast[(fast.concept_a == "alpha") & (fast.concept_b == "beta")]
    assert int(row["count"].iloc[0]) == 2
    assert abs(float(row["confidence"].iloc[0]) - 2 / 5) < 1e-12
    # below-threshold pairs are absent on both paths
    assert ((fast.concept_a == "epsilon") & (fast.concept_b == "zeta")).sum() == 0


def test_concept_edge_paths_equal_empty(ray_session):
    from graphrag_rs_ray.pipelines.concepts import concept_edges_from_lists

    lists = _lists_ds([("c1", ["solo"]), ("c2", [])]).materialize()
    fast = _norm(concept_edges_from_lists(lists, 2))
    slow = _norm(concept_edges_from_lists(lists, 2,
                                          vocab_broadcast_limit=0))
    assert len(fast) == 0 and len(slow) == 0
