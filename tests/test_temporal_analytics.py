"""Ported reference tests for the temporal analytics half of
``graph/temporal.rs`` (:432-595), replayed over the injected Rust test
graph via ``edges_ds`` — plus exact hand-computed window values (stronger
than the reference's non-empty assertions)."""

import pyarrow as pa


def _edges_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "dst": pa.array([r[1] for r in rows], pa.string()),
        "fs": pa.array([r[2] for r in rows], pa.int64()),
        "ls": pa.array([r[3] for r in rows], pa.int64())}))


# temporal.rs:432-467 create_test_temporal_graph
REF_GRAPH = [("A", "B", 100, 200), ("B", "C", 150, 250), ("A", "C", 200, 300)]


def test_evolution_metrics_exact(ray_session):
    from graphrag_rs_ray.pipelines.training_data import temporal_evolution

    out = temporal_evolution("/unused", granularity=50,
                             edges_ds=_edges_ds(REF_GRAPH)).to_pandas()
    out = out.sort_values("window_start").reset_index(drop=True)
    # while t <= 300 step 50 → windows at 100..300 (temporal.rs:273-291)
    assert out["window_start"].tolist() == [100, 150, 200, 250, 300]
    assert out["edge_count"].tolist() == [2, 3, 3, 2, 1]
    assert out["node_count"].tolist() == [3, 3, 3, 3, 2]
    assert out["density"].tolist() == [2 / 3, 1.0, 1.0, 2 / 3, 1.0]
    assert out["avg_degree"].tolist() == [4 / 3, 2.0, 2.0, 4 / 3, 1.0]
    # reference assertions (test_evolution_metrics): non-empty, in range
    assert len(out) and out["window_start"].between(100, 300).all()


def test_node_churn_reference(ray_session):
    from graphrag_rs_ray.pipelines.training_data import temporal_node_churn

    # temporal.rs:533-571 test_node_churn — point edges AB@100, BC@200
    rows = [("A", "B", 100, 100), ("B", "C", 200, 200)]
    out = temporal_node_churn("/unused", edges_ds=_edges_ds(rows)).to_pandas()
    st = dict(zip(out["node"], out["status"]))
    assert st == {"A": "removed", "B": "stable", "C": "added"}


def test_node_churn_interval_graph(ray_session):
    from graphrag_rs_ray.pipelines.training_data import temporal_node_churn

    # REF_GRAPH endpoints: at 100 only AB active → {A,B}; at 300 only AC
    out = temporal_node_churn("/unused",
                              edges_ds=_edges_ds(REF_GRAPH)).to_pandas()
    st = dict(zip(out["node"], out["status"]))
    assert st == {"A": "stable", "B": "removed", "C": "added"}


def test_top_growing_nodes(ray_session):
    from graphrag_rs_ray.pipelines.training_data import temporal_top_growing

    # g=50: start [100,150] degrees A1 B2 C1; end [250,300] is AC + BC
    # (BC's ls=250 ≥ window start — inclusive overlap): A1 B1 C2
    # growth: C (2-1)/1=1, A (1-1)/1=0, B (1-2)/2=-0.5
    out = temporal_top_growing("/unused", top_k=10, granularity=50,
                               edges_ds=_edges_ds(REF_GRAPH)).to_pandas()
    assert out["node"].tolist() == ["C", "A", "B"]
    assert out["growth"].tolist() == [1.0, 0.0, -0.5]
    # a genuinely growing node: D absent early, degree 2 late → growth 2.0
    # (C also reaches 2.0 — (3−1)/1 — tie broken node asc: C before D)
    rows = REF_GRAPH + [("D", "C", 260, 300), ("D", "A", 260, 300)]
    out2 = temporal_top_growing("/unused", top_k=3, granularity=50,
                                edges_ds=_edges_ds(rows)).to_pandas()
    assert out2["node"].tolist() == ["C", "D", "A"]
    assert out2["growth"].tolist() == [2.0, 2.0, 1.0]


def test_temporal_centrality_exact(ray_session):
    from graphrag_rs_ray.pipelines.training_data import temporal_centrality

    out = temporal_centrality("/unused", granularity=50,
                              edges_ds=_edges_ds(REF_GRAPH)).to_pandas()
    got = {(r.node, r.window_start): r.centrality for r in out.itertuples()}
    # window [100,150]: E={AB,BC}, N=3 → deg/(N-1): A=0.5, B=1.0, C=0.5
    assert got[("A", 100)] == 0.5
    assert got[("B", 100)] == 1.0
    assert got[("C", 100)] == 0.5
    # window [300,350]: E={AC}, N=2 → A=1.0, C=1.0; B absent (omitted)
    assert got[("A", 300)] == 1.0 and got[("C", 300)] == 1.0
    assert ("B", 300) not in got


def test_events_table_end_to_end(ray_session):
    """The sf-path derivation (events → interval edges) composes with all
    four analytics without error and produces sane shapes."""
    from graphrag_rs_ray.pipelines.training_data import (
        temporal_evolution, temporal_node_churn, temporal_top_growing,
        temporal_centrality)

    sf = "/root/testdata/sf0.001"
    ev = temporal_evolution(sf).to_pandas()
    assert len(ev) >= 8 and (ev["edge_count"] >= 0).all()
    ch = temporal_node_churn(sf).to_pandas()
    assert set(ch["status"]) <= {"added", "removed", "stable"}
    tg = temporal_top_growing(sf, top_k=5).to_pandas()
    assert len(tg) <= 5
    tc = temporal_centrality(sf).to_pandas()
    assert ((tc["centrality"] >= 0) & (tc["centrality"] <= 1)).all()
