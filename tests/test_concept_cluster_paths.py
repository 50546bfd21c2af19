"""Two-path gate for concept cluster ids: the driver collect (≤ limit)
and the distributed lexicographic-rank path must assign IDENTICAL
cluster_<k> ids."""

import pyarrow as pa


def _concepts_ds(n):
    import ray.data as rd
    rows = {k: [] for k in ("doc_id", "concept_id", "text", "pattern_idx",
                            "start")}
    words = ["alpha", "beta", "Gamma", "delta phrase", "épsilon", "beta",
             "zeta", "alpha", "Ωmega", "beta  "]
    for i in range(n):
        rows["doc_id"].append(f"d{i % 7}")
        rows["concept_id"].append(f"d{i % 7}_c{i}")
        rows["text"].append(words[i % len(words)] + ("" if i % 3 else " x"))
        rows["pattern_idx"].append(i % 4)
        rows["start"].append(i * 3)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.string()),
        "concept_id": pa.array(rows["concept_id"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "pattern_idx": pa.array(rows["pattern_idx"], pa.int64()),
        "start": pa.array(rows["start"], pa.int64())})).repartition(6)


def test_concept_cluster_rank_paths_equal(ray_session):
    from graphrag_rs_ray.pipelines.corpus import concept_cluster_table

    ds = _concepts_ds(200)
    fast = (concept_cluster_table(ds, collect_limit=10**6).to_pandas()
            .sort_values("cluster_id").reset_index(drop=True))
    slow = (concept_cluster_table(ds, collect_limit=0).to_pandas()
            .sort_values("cluster_id").reset_index(drop=True))
    assert len(fast) > 3
    assert fast.equals(slow)
