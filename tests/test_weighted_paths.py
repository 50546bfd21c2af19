"""Weighted path dataflows (``pipelines/paths.py``): the sharded twins
(Bellman-Ford SSSP rounds, frontier-expansion all-paths) must equal the
local kernels (Dijkstra, DFS) on the same graph — ``small_graph_limit=0``
forces the distributed path (``analytics.rs:272-404`` semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from graphrag_rs_ray.pipelines.paths import all_paths, shortest_paths


def _random_edges(seed: int, n: int, m: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    src = [f"N{int(a):03d}" for a in rng.integers(0, n, m)]
    dst = [f"N{int(b):03d}" for b in rng.integers(0, n, m)]
    w = np.round(0.5 + rng.integers(0, 1000, m) / 400.0, 6)
    return pa.table({"src": pa.array(src, pa.string()),
                     "dst": pa.array(dst, pa.string()),
                     "w": pa.array(w, pa.float64())})


@pytest.fixture(scope="module")
def edges():
    return _random_edges(11, 60, 150)


def _ds(tbl):
    import ray.data as rd
    return rd.from_arrow(tbl)


def _rows(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def test_sssp_sharded_equals_local(ray_session, edges):
    loc = shortest_paths(_ds(edges), "N000")
    shd = shortest_paths(_ds(edges), "N000", small_graph_limit=0,
                         num_buckets=8)
    cols = ("node", "dist", "pred")
    assert _rows(loc, cols) == _rows(shd, cols)
    assert len(_rows(loc, cols)) > 1


def test_sssp_semantics_hand_graph(ray_session):
    # A-B 10, A-C 1, C-B 1 (undirected): dist(B) = 2 via C, pred rules
    tbl = pa.table({"src": ["A", "A", "C"], "dst": ["B", "C", "B"],
                    "w": pa.array([10.0, 1.0, 1.0], pa.float64())})
    rows = {r["node"]: (r["dist"], r["pred"])
            for r in shortest_paths(_ds(tbl), "A").take_all()}
    assert rows == {"A": (0.0, ""), "B": (2.0, "C"), "C": (1.0, "A")}


def test_sssp_omits_unreachable(ray_session):
    tbl = pa.table({"src": ["A", "X"], "dst": ["B", "Y"],
                    "w": pa.array([1.0, 1.0], pa.float64())})
    nodes = {r["node"] for r in shortest_paths(_ds(tbl), "A").take_all()}
    assert nodes == {"A", "B"}


def test_all_paths_sharded_equals_local(ray_session, edges):
    loc = all_paths(_ds(edges), "N000", "N007", max_depth=4)
    shd = all_paths(_ds(edges), "N000", "N007", max_depth=4,
                    small_graph_limit=0, num_buckets=8)
    cols = ("path", "n_nodes", "weight")
    assert _rows(loc, cols) == _rows(shd, cols)


def test_all_paths_semantics(ray_session):
    # reference test graph (analytics.rs:492-520), unit weights
    tbl = pa.table({"src": ["A", "A", "B", "B", "C"],
                    "dst": ["B", "C", "C", "D", "D"],
                    "w": pa.array([1.0] * 5, pa.float64())})
    got = {r["path"] for r in
           all_paths(_ds(tbl), "A", "D", max_depth=4).take_all()}
    # end node is terminal: no path continues past D; ≤4 nodes
    assert got == {"A|B|D", "A|C|D", "A|B|C|D", "A|C|B|D"}
    d3 = {r["path"] for r in
          all_paths(_ds(tbl), "A", "D", max_depth=3).take_all()}
    assert d3 == {"A|B|D", "A|C|D"}
    same = all_paths(_ds(tbl), "A", "A", max_depth=3).take_all()
    assert [(r["path"], r["n_nodes"], r["weight"]) for r in same] == \
        [("A", 1, 0.0)]
