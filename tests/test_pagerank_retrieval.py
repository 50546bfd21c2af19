"""PageRank-based retrieval (``retrieval/pagerank_retrieval.rs`` +
``graph/pagerank.rs``): kernel gates, the dense-path quirk pin, the
local == sharded PPR equality gate, and an end-to-end hand-graph check
against an independent naive replica."""

import numpy as np
import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.pagerank_retrieval import (
    PageRankRetrievalConfig,
    build_reset,
    dense_ppr_quirk,
    jaccard_entity_score,
    ppr_weighted_local,
    quick_entity_search,
    vector_scores_local,
)
from graphrag_rs_ray.pipelines.pagerank_retrieval import (
    ppr_weighted,
    search_with_pagerank,
    weighted_edges,
)


def test_jaccard_entity_score():
    # qwords duplicates count twice in the intersection (list semantics,
    # pagerank_retrieval.rs:246-252)
    q = ["alpha", "alpha", "university"]
    #  entity words: [alpha, university, org] → ic = 3 (both 'alpha's hit)
    assert jaccard_entity_score(q, "Alpha University", "org") == 3 / (3 + 3 - 3)
    # no overlap → None
    assert jaccard_entity_score(["zeta"], "Alpha", "org") is None
    # sim below 0.1 → None: 1 common word, huge entity word list
    long_name = " ".join(f"w{i}" for i in range(20)) + " alpha"
    assert jaccard_entity_score(["alpha"], long_name, "org") is None


def test_quick_entity_search():
    ents = [("E2", "Berlin", "LOC"), ("E1", "berlin", "LOC"),
            ("E3", "East Berlin", "LOC"), ("E4", "Tokyo", "LOC")]
    out = quick_entity_search("Berlin", ents, max_results=10)
    # exact (case-insensitive) = 1.0, substring = 0.8; ties by id
    assert out == [("E1", 1.0), ("E2", 1.0), ("E3", 0.8)]
    assert quick_entity_search("Berlin", ents, max_results=2) == [
        ("E1", 1.0), ("E2", 1.0)]


def test_dense_ppr_quirk_dag_fixed_point():
    """The reference's small-graph dense path (pagerank.rs:221-246) skips
    out-degree normalization; on a DAG (nilpotent A) it still converges —
    to the fixed point s = (I - d·A)⁻¹ (1-d) r."""
    nodes = ["A", "B", "C"]
    edges = [("A", "B", 1.0), ("B", "C", 1.0), ("A", "C", 1.0)]
    reset = np.full(3, 1 / 3)
    got = dense_ppr_quirk(edges, nodes, reset, damping=0.85,
                          max_iterations=200, tolerance=1e-12)
    a = np.zeros((3, 3))
    a[0, 1] = a[1, 2] = a[0, 2] = 1.0
    expect = np.linalg.solve(np.eye(3) - 0.85 * a, 0.15 * reset)
    for i, n in enumerate(nodes):
        assert got[n] == pytest.approx(expect[i], abs=1e-9)


def _naive_ppr(edges, nodes, reset, cfg):
    """Independent replica of the production recurrence (dict loops, no
    numpy) — pagerank.rs:300-358 semantics."""
    n = len(nodes)
    wsum = {u: 0.0 for u in nodes}
    for s, _t, w in edges:
        wsum[s] += w
    d = cfg.damping_factor
    score = {u: 1.0 / n for u in nodes}
    for _ in range(cfg.max_iterations):
        new = {u: (1.0 - d) * reset[u] for u in nodes}
        dang = sum(score[u] for u in nodes if wsum[u] == 0.0)
        for s, t, w in edges:
            new[t] += d * score[s] * w / wsum[s]
        dm = d * dang / n
        new = {u: round(v + dm, cfg.round_digits) for u, v in new.items()}
        score = new
    return score


def test_ppr_weighted_local_vs_naive():
    nodes = ["A", "B", "C", "D"]
    edges = [("A", "B", 1.0), ("B", "C", 0.5), ("C", "D", 0.4),
             ("C", "A", 0.6)]                       # D dangling
    vscores = {"A": 1.26666667, "C": 0.3}
    reset_arr = build_reset(vscores, nodes)
    reset = dict(zip(nodes, reset_arr))
    cfg = PageRankRetrievalConfig(max_iterations=6)
    got = ppr_weighted_local(edges, nodes, reset_arr, cfg)
    want = _naive_ppr(edges, nodes, reset, cfg)
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=2e-8)
    # reset default 1/n for nodes without a vector score
    assert reset["B"] == 0.25 and reset["D"] == 0.25
    # overridden entries are normalized by the vector-score total
    assert reset["A"] == pytest.approx(1.26666667 / 1.56666667)


def _tri_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float64())}))


def _ents_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "entity_id": pa.array([r[0] for r in rows], pa.string()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "type": pa.array([r[2] for r in rows], pa.string())}))


ENTS = [("E_a", "Alpha University", "ORGANIZATION"),
        ("E_b", "Beta Corp", "ORGANIZATION"),
        ("E_c", "Gamma", "PERSON"),
        ("E_d", "Delta", "PERSON"),
        # passes on Jaccard but has NO chunks → exercises the
        # entity_<id> fallback row (pagerank_retrieval.rs:195-215)
        ("E_e", "Alpha University Institute", "ORGANIZATION")]
MENTIONS = [("E_a", "c1", 2), ("E_b", "c2", 1), ("E_c", "c1", 1),
            ("E_a", "c2", 1)]
CHUNKS = [("c1", "Alpha University is in town"), ("c2", "beta corp hq")]
TRIPLES = [("E_a", "related_to", "E_b", 0.8),
           ("E_a", "related_to", "E_b", 0.2),     # parallel edge — summed
           ("E_b", "related_to", "E_c", 0.5),
           ("E_c", "related_to", "E_d", 0.4)]     # E_d dangling


def _mentions_ds():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "entity_id": pa.array([m[0] for m in MENTIONS], pa.string()),
        "chunk_id": pa.array([m[1] for m in MENTIONS], pa.string()),
        "mention_count": pa.array([m[2] for m in MENTIONS], pa.int64())}))


def _chunks_ds():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "chunk_id": pa.array([c[0] for c in CHUNKS], pa.string()),
        "text": pa.array([c[1] for c in CHUNKS], pa.string())}))


def test_ppr_local_equals_sharded(ray_session):
    edges = weighted_edges(_tri_ds(TRIPLES), num_buckets=4).materialize()
    vs = {"E_a": 0.9, "E_c": 0.3}
    cfg = PageRankRetrievalConfig(max_iterations=5)
    fast = {r["node"]: r["score"]
            for r in ppr_weighted(edges, _ents_ds(ENTS), vs, cfg,
                                  num_buckets=4).take_all()}
    sharded = {r["node"]: r["score"]
               for r in ppr_weighted(edges, _ents_ds(ENTS), vs, cfg,
                                     num_buckets=4,
                                     small_graph_limit=0).take_all()}
    assert fast.keys() == sharded.keys() and len(fast) == 5
    for k in fast:
        assert fast[k] == pytest.approx(sharded[k], abs=2e-8)


def test_search_with_pagerank_hand_graph(ray_session):
    cfg = PageRankRetrievalConfig(max_iterations=4)
    out = search_with_pagerank(_ents_ds(ENTS), _mentions_ds(), _chunks_ds(),
                               _tri_ds(TRIPLES), "alpha university", cfg,
                               num_buckets=4).to_pandas()

    # ---- independent replica --------------------------------------
    qw = ["alpha", "university"]
    vs = vector_scores_local(
        "alpha university", ENTS,
        {"E_a": ["c1", "c1", "c2"], "E_b": ["c2"], "E_c": ["c1"]},
        dict(CHUNKS), cfg)
    # E_a: jaccard 2/(2+3-2)=2/3, bonus 2 mentions in matching c1 → +0.6
    assert vs["E_a"] == pytest.approx(round(2 / 3 + 0.6, 8))
    # E_c: bonus only (no name overlap)
    assert vs["E_c"] == pytest.approx(0.3)
    assert "E_b" not in vs and "E_d" not in vs
    del qw

    nodes = sorted(e[0] for e in ENTS)
    edges = [("E_a", "E_b", 1.0), ("E_b", "E_c", 0.5), ("E_c", "E_d", 0.4)]
    reset = dict(zip(nodes, build_reset(vs, nodes)))
    pr = _naive_ppr(edges, nodes, reset, cfg)
    expect_rows = set()
    chunk_map = {"E_a": {"c1", "c2"}, "E_b": {"c2"}, "E_c": {"c1"}}
    for eid in nodes:
        comb = round(cfg.vector_weight * vs.get(eid, 0.0)
                     + cfg.pagerank_weight * pr[eid], 8)
        if comb < cfg.min_score_threshold:
            continue
        for cid in sorted(chunk_map.get(eid, {f"entity_{eid}"})):
            expect_rows.add((eid, cid, comb, vs.get(eid, 0.0), pr[eid]))

    got_rows = {(r.entity_id, r.chunk_id, r.score, r.vector_score,
                 r.pagerank_score) for r in out.itertuples()}
    assert got_rows == expect_rows
    # the chunk-less passing entity fell back to its synthetic chunk row
    assert any(r[0] == "E_e" and r[1] == "entity_E_e" for r in got_rows)
    # E_a passes on jaccard+bonus; expansion emits one row per chunk
    assert {r[1] for r in got_rows if r[0] == "E_a"} == {"c1", "c2"}
    # rank is 1..k in (score desc, entity_id, chunk_id) order
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert list(out["score"]) == sorted(out["score"], reverse=True)


def test_search_empty_vector_scores(ray_session):
    cfg = PageRankRetrievalConfig(max_iterations=2)
    out = search_with_pagerank(_ents_ds(ENTS), _mentions_ds(), _chunks_ds(),
                               _tri_ds(TRIPLES), "zzz qqq", cfg,
                               num_buckets=4).to_pandas()
    assert len(out) == 0
