"""SemDeDup (Abbas+ 2023) semantics gates on planted vectors: transitive
duplicate chains inside a cluster, the keep-least-central rule, exact-dup
vec_id tie-break, and singleton self-keep.  Engine parity (assignment
argmax, closure, keep rule vs DuckDB) is swept by driver_sim; this file
pins the TRUE branches the sf embeddings may not exercise."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graphrag_rs_ray.pipelines import training_data as td


@pytest.fixture()
def planted_dir(tmp_path):
    th = math.acos(0.9)
    a = [1.0, 0.0, 0.0]
    b = [math.cos(th), 0.0, math.sin(th)]          # a·b = 0.9
    c = [math.cos(2 * th), 0.0, math.sin(2 * th)]  # b·c = 0.9, a·c = 0.62
    d = [0.5, 0.0, -math.sqrt(1 - 0.25)]           # singleton in cluster 0
    e = [0.0, 1.0, 0.0]                            # exact dups in cluster 1
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "embedding": pa.array([a, b, c, d, e, e],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_planted(ray_session, planted_dir):
    cent = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = td.semdedup(planted_dir, threshold=0.8, cent=cent).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    rows = {r.vec_id: r for r in out.itertuples()}

    # chain 1-2-3 is one transitive group even though cos(1,3) < 0.8
    assert rows[1].grp == rows[2].grp == rows[3].grp == 1
    # keep = least similar to the centroid (vec 3: csim 0.62)
    assert (rows[1].keep, rows[2].keep, rows[3].keep) == (False, False, True)
    # singleton keeps itself
    assert rows[4].grp == 4 and bool(rows[4].keep)
    # exact dups: csim tie → min vec_id kept
    assert rows[5].grp == rows[6].grp == 5
    assert (rows[5].keep, rows[6].keep) == (True, False)
    # cluster assignment: 1-4 → centroid 0, 5-6 → centroid 1
    assert list(out["cluster"]) == [0, 0, 0, 0, 1, 1]


def test_semdedup_auto_k(ray_session, tmp_path):
    """n_centroids=None auto-scales k = max(8, n_vecs // target_cluster_size)
    so per-cluster work stays bounded as the corpus grows (the paper's
    k-grows-with-corpus device, now enforced by default)."""
    rng = np.random.Generator(np.random.PCG64(5))
    n = 640
    vecs = rng.normal(size=(n, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    out = td.semdedup(str(tmp_path), threshold=0.95,
                      target_cluster_size=40).to_pandas()
    # k = max(8, 640 // 40) = 16 clusters; every vec assigned exactly once
    assert len(out) == n and out["vec_id"].is_unique
    n_clusters = out["cluster"].nunique()
    assert 8 < n_clusters <= 16          # some centroids may end empty
    assert out["cluster"].value_counts().max() < n  # genuinely blocked


def test_semdedup_auto_k_driver_guard(ray_session, tmp_path):
    """Auto-k REFUSES loudly past the driver k-means bound (ADVICE r04):
    the centroid build is O(k*sample*dim*iters) on the driver, so a
    corpus whose auto-k exceeds _SEMDEDUP_MAX_DRIVER_K must error with
    the explicit escapes (cent=, target_cluster_size) instead of
    silently burning driver hours — and the widened sample is capped."""
    rng = np.random.Generator(np.random.PCG64(7))
    n = 64
    vecs = rng.normal(size=(n, 4))
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    # shrink the bound so a tiny table trips it (64 // 2 = 32 > 16)
    orig = td._SEMDEDUP_MAX_DRIVER_K
    td._SEMDEDUP_MAX_DRIVER_K = 16
    try:
        with pytest.raises(ValueError, match="driver k-means bound"):
            td.semdedup(str(tmp_path), target_cluster_size=2)
    finally:
        td._SEMDEDUP_MAX_DRIVER_K = orig
    # sample widening is capped at _SEMDEDUP_SAMPLE_CAP
    assert td._SEMDEDUP_SAMPLE_CAP == 262_144
    out = td.semdedup(str(tmp_path), target_cluster_size=8).to_pandas()
    assert len(out) == n
