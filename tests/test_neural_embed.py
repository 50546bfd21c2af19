"""Neural-provider seam gates: checkpoint round-trip, load-once-per-
actor (NOT per batch), determinism under batching, and the zero-vector
degenerate cases."""

import numpy as np
import pyarrow as pa


def test_encoder_checkpoint_roundtrip(tmp_path):
    from graphrag_rs_ray.functions.neural_embedding import TinyTextEncoder

    enc = TinyTextEncoder.fixed(seed=3, dim=32, n_buckets=1024)
    p = str(tmp_path / "ckpt.npz")
    enc.save(p)
    enc2 = TinyTextEncoder.load(p)
    texts = ["hello world", "a b c", "", "   ", "hello world"]
    a, b = enc.encode_batch(texts), enc2.encode_batch(texts)
    assert np.array_equal(a, b)
    assert a.dtype == np.float32 and a.shape == (5, 32)
    # identical text → identical vector; unit norm for non-empty
    assert np.array_equal(a[0], a[4])
    assert abs(float(np.linalg.norm(a[0])) - 1.0) < 1e-5
    # empty / whitespace-only → zero vector
    assert not a[2].any() and not a[3].any()
    # state size is real (the actor-memory claim)
    full = TinyTextEncoder.fixed()
    assert full.nbytes() > 16_000_000


def test_loads_once_per_actor_not_per_batch(ray_session, tmp_path):
    import ray.data as rd

    from graphrag_rs_ray.stages.embed import NeuralEmbedStage

    from graphrag_rs_ray.functions.neural_embedding import TinyTextEncoder
    p = str(tmp_path / "w.npz")
    TinyTextEncoder.fixed(seed=1, dim=16, n_buckets=512).save(p)

    n = 400
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"tok{i % 37} alpha beta" for i in range(n)],
                         pa.string()),
    }))
    out = ds.map_batches(
        NeuralEmbedStage,
        fn_constructor_kwargs={"checkpoint": p, "report_loads": True},
        batch_format="pyarrow", batch_size=20, concurrency=2,
    ).to_pandas()
    assert len(out) == n
    # ≥ 20 batches ran, but NO worker process ever loaded twice —
    # weights live in actor __init__, not per batch
    assert out["loads_in_worker"].max() == 1


def test_distributed_equals_local(ray_session):
    import ray.data as rd

    from graphrag_rs_ray.functions.neural_embedding import TinyTextEncoder
    from graphrag_rs_ray.stages.embed import NeuralEmbedStage

    texts = [f"word{i} shared tail" for i in range(100)] + ["", "x"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = (ds.map_batches(NeuralEmbedStage,
                          fn_constructor_kwargs={"seed": 7, "dim": 64},
                          batch_format="pyarrow", batch_size=9,
                          concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    local = TinyTextEncoder.fixed(seed=7, dim=64).encode_batch(texts)
    got = np.stack(out["embedding"].to_numpy())
    assert np.array_equal(got.astype(np.float32), local)
