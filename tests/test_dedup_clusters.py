"""Planted-data gates for transitive near-dup clustering
(``training_data.dedup_clusters``): verified pairs → connected
components → min-member representative.  The key semantic difference vs
``corpus_curation``'s per-pair drop-larger rule is transitivity: a
duplicate CHAIN collapses to one survivor even when the endpoints never
formed a verified pair themselves."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

BASE = ("the quick brown fox jumps over a lazy dog while the patient "
        "owl watches from a tall tree and the river runs past the old "
        "mill towards a distant sea under a pale morning sky")


def _write_docs(tmp_path, docs):
    sf_dir = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }), os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _chain_corpus(tmp_path):
    """Docs 1 and 2 are both near-dups of 3 but less similar to each
    other — the transitive chain 1–3–2."""
    d1 = BASE.replace("quick brown", "swift umber")
    d2 = BASE.replace("distant sea", "faraway bay")
    d3 = BASE
    other = ("a completely different story about the ships that sail "
             "across the sea carrying spice to the harbours of the west")
    return _write_docs(tmp_path, [(1, d1), (2, d2), (3, d3), (9, other)])


def _chain_threshold(sf_dir):
    """Pick a verify threshold that accepts (1,3) and (2,3) but rejects
    (1,2) — computed from the planted texts so the gate is robust to
    wording tweaks."""
    import pandas as pd

    from graphrag_rs_ray.functions.dedup import ngram_jaccard

    df = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    tx = dict(zip(df.doc_id, df.text))
    s13 = ngram_jaccard(tx[1], tx[3], 3)
    s23 = ngram_jaccard(tx[2], tx[3], 3)
    s12 = ngram_jaccard(tx[1], tx[2], 3)
    assert s12 < min(s13, s23), "planted corpus must form a chain"
    return (s12 + min(s13, s23)) / 2


def test_transitive_chain_collapses_to_one_survivor(ray_session, tmp_path):
    from graphrag_rs_ray.pipelines import training_data as td

    sf_dir = _chain_corpus(tmp_path)
    th = _chain_threshold(sf_dir)
    out = (td.dedup_clusters(sf_dir, threshold=th)
           .to_pandas().set_index("doc_id").sort_index())
    # per-pair drop-larger would keep {1, 2}; transitive CC keeps only 1
    assert list(out.index) == [1, 2, 3, 9]
    assert list(out["cluster"]) == [1, 1, 1, 9]
    assert list(out["cluster_size"]) == [3, 3, 3, 1]
    assert list(out["is_kept"]) == [1, 0, 0, 1]


def test_scale_paths_equal_broadcast_path(ray_session, tmp_path):
    """Two-path discipline: forcing the distributed CC AND the bucketed
    join-back (no broadcast map) must reproduce the default output."""
    from graphrag_rs_ray.pipelines import training_data as td

    sf_dir = _chain_corpus(tmp_path)
    th = _chain_threshold(sf_dir)
    cols = ["doc_id", "cluster", "cluster_size", "is_kept"]
    fast = (td.dedup_clusters(sf_dir, threshold=th)
            .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    sharded = (td.dedup_clusters(sf_dir, threshold=th,
                                 small_graph_limit=0, small_map_limit=0)
               .to_pandas()[cols].sort_values("doc_id")
               .reset_index(drop=True))
    assert fast.equals(sharded)


def test_no_duplicates_all_singletons(ray_session, tmp_path):
    from graphrag_rs_ray.pipelines import training_data as td

    docs = [(i, f"document number {i} " + " ".join(
        f"unique{i}w{j}" for j in range(25))) for i in range(1, 6)]
    sf_dir = _write_docs(tmp_path, docs)
    out = td.dedup_clusters(sf_dir).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3, 4, 5]
    assert (out["cluster"] == out["doc_id"]).all()
    assert (out["cluster_size"] == 1).all()
    assert (out["is_kept"] == 1).all()
