"""RRF fusion math (``HOW_IT_WORKS.md:880-905``, k=60) + hybrid search."""

from graphrag_rs_ray.pipelines.training_data import rrf_fuse


def test_rrf_math():
    fused = rrf_fuse([["a", "b", "c"], ["b", "a", "d"]], k=60)
    scores = dict(fused)
    assert abs(scores["a"] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(scores["b"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(scores["c"] - 1 / 63) < 1e-12
    # a and b tie exactly → deterministic id tie-break
    assert [d for d, _ in fused[:2]] == ["a", "b"]
    assert fused[-1][0] in ("c", "d")


def test_rrf_single_ranker_preserves_order():
    fused = rrf_fuse([["x", "y", "z"]])
    assert [d for d, _ in fused] == ["x", "y", "z"]


def test_hybrid_search_runs(ray_session):
    from graphrag_rs_ray.pipelines.training_data import hybrid_search
    t = hybrid_search("/root/testdata/sf0.001", query="fast hash join", top_k=5)
    assert t.num_rows == 5
    assert t.column("rank").to_pylist() == [1, 2, 3, 4, 5]
    scores = t.column("rrf_score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    # deterministic
    t2 = hybrid_search("/root/testdata/sf0.001", query="fast hash join", top_k=5)
    assert t.equals(t2)
