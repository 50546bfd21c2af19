"""Gates for neighborhood-overlap link prediction: hand-computed CN /
Jaccard / Adamic-Adar values, existing-edge exclusion, and the hub cap."""

import math

import pyarrow as pa

from graphrag_rs_ray.pipelines.graph_ops import link_prediction


def _tri(pairs):
    return pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "pred": pa.array(["r"] * len(pairs), pa.string()),
        "obj": pa.array([p[1] for p in pairs], pa.string()),
    })


def test_hand_computed_scores(ray_session):
    import ray.data as rd
    # star center x—{a,b,c}, plus existing edge a—b (and a self loop +
    # a duplicate edge that must not change anything)
    tri = _tri([("x", "a"), ("x", "b"), ("x", "c"), ("a", "b"),
                ("b", "a"), ("x", "x")])
    out = (link_prediction(rd.from_arrow(tri).repartition(2))
           .to_pandas().set_index(["node_a", "node_b"]).sort_index())
    # (a,b) is an existing edge -> excluded; (a,c) and (b,c) predicted
    assert set(out.index) == {("a", "c"), ("b", "c")}
    aa_x = math.floor(1_000_000 / math.log(3.0))   # x has degree 3
    for key, deg_left in ((("a", "c"), 2), (("b", "c"), 2)):
        r = out.loc[key]
        assert r["cn"] == 1
        assert r["aa_micro"] == aa_x
        # deg(c) = 1 -> jaccard = 1e6 * 1 // (2 + 1 - 1)
        assert r["jaccard_micro"] == 500_000


def test_hub_cap_excludes_center(ray_session):
    import ray.data as rd
    hub = _tri([("h", f"n{i}") for i in range(10)])
    # with the cap below the hub degree no wedge survives
    assert link_prediction(rd.from_arrow(hub),
                           max_center_degree=5).count() == 0
    # with a generous cap every neighbor pair appears: C(10,2) = 45
    assert link_prediction(rd.from_arrow(hub),
                           max_center_degree=64).count() == 45
