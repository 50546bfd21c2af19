"""Multimodal column stages (image/audio/video as opaque binary).

The decode kernels themselves are STUBS — the image/audio libraries are
not in this container — but the Ray-side plumbing (schemas, actor-pool
signatures, batch sizing, output layout) is real and tested:

- payloads are ``binary`` columns with typed metadata (``media_type``,
  ``n_bytes``),
- decode/feature stages are actor-pool ``map_batches`` classes with
  model/codec setup in ``__init__``,
- batch sizes stay SMALL for binary payloads (blocks are bounded by
  payload bytes, not row count — the same discipline as dropping the
  ``html`` column early).

``DeterministicFakeDecoder`` stands in for a real codec: features are a
pure function of the bytes, so tests freeze goldens.  ``StrictDecoder``
raises ``NotImplementedError`` to mark the real-codec boundary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("n_bytes", pa.int64()),
])

FEATURES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("feature", pa.list_(pa.float32())),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


class StrictDecoder:
    """Real-codec boundary: construction succeeds (so pool plumbing is
    exercised) but decoding raises until a codec library is available."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; use DeterministicFakeDecoder for plumbing tests")


class DeterministicFakeDecoder:
    """Deterministic stand-in: features = normalized bytes of
    BLAKE2b(payload); width/height derived from the digest.  Exercises the
    exact actor-pool/batch/schema path a real decoder uses."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def _decode_one(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        digest = hashlib.blake2b(payload or b"", digest_size=self.feature_dim + 2).digest()
        feat = (np.frombuffer(digest[:self.feature_dim], dtype=np.uint8)
                .astype(np.float32) / 255.0)
        return feat, 16 + digest[-2] % 240, 16 + digest[-1] % 240

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, widths, heights = [], [], []
        for p in payloads:
            f, w, h = self._decode_one(p)
            feats.append(f.tolist()); widths.append(w); heights.append(h)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        })


def decode_features(media_ds, decoder_cls=DeterministicFakeDecoder,
                    concurrency: int | tuple[int, int] = 2,
                    batch_size: int = 64, feature_dim: int = 16):
    """Actor-pool decode: small batches (binary payloads), setup in
    ``__init__`` once per actor."""
    return media_ds.map_batches(decoder_cls, fn_constructor_args=(feature_dim,),
                                batch_format="pyarrow", batch_size=batch_size,
                                concurrency=concurrency)


class ResizeStage:
    """Image resize plumbing (binary → binary): the real pixel resample
    sits behind the codec boundary, so the fake transform derives the
    output payload deterministically from (payload, target size) while
    the schema/actor/batch discipline is the real one.  Target dims are
    actor state (set once in ``__init__``)."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = [hashlib.blake2b((p or b"") + bytes([self.width % 256,
                                                   self.height % 256]),
                               digest_size=32).digest() for p in payloads]
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(out, pa.binary()),
            "width": pa.array([self.width] * len(ids), pa.int32()),
            "height": pa.array([self.height] * len(ids), pa.int32()),
        })


class FrameSampler:
    """Video frame sampling (1 video row → ≤``max_frames`` frame rows —
    the flat-map explosion every video pipeline needs).  The container
    probe is faked deterministically (duration_s = n_bytes // 1000 + 1;
    a real probe reads the header behind the codec boundary); frame
    timestamps are evenly spaced over the duration.  Frame payloads are
    a pure function of (payload, frame_idx) so goldens freeze."""

    def __init__(self, max_frames: int = 8):
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_t, out_payload = [], [], [], []
        for mid, mtype, payload, n_bytes in zip(
                batch.column("media_id").to_pylist(),
                batch.column("media_type").to_pylist(),
                batch.column("payload").to_pylist(),
                batch.column("n_bytes").to_pylist()):
            if mtype != "video":
                continue
            dur = n_bytes // 1000 + 1
            n = min(self.max_frames, dur)
            for i in range(n):
                out_id.append(mid)
                out_idx.append(i)
                out_t.append(i * (dur * 1.0 / n))
                out_payload.append(hashlib.blake2b(
                    (payload or b"") + bytes([i]), digest_size=32).digest())
        return pa.table({
            "media_id": pa.array(out_id, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int64()),
            "t_offset_s": pa.array(out_t, pa.float64()),
            "frame": pa.array(out_payload, pa.binary()),
        })


def sample_frames(media_ds, max_frames: int = 8,
                  concurrency: int | tuple[int, int] = 2,
                  batch_size: int = 64):
    """Actor-pool frame sampling; small batches (binary payloads)."""
    return media_ds.map_batches(FrameSampler,
                                fn_constructor_args=(max_frames,),
                                batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)


def media_from_documents(sf_dir: str):
    """Deterministic synthetic media table derived from the documents
    text bytes (no external data): payload = UTF-8 bytes, type by doc_id."""
    import os
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        types = ["image", "audio", "video"]
        return pa.table({
            "media_id": pa.array([f"m{i}" for i in ids], pa.string()),
            "media_type": pa.array([types[i % 3] for i in ids], pa.string()),
            "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
            "n_bytes": pa.array([len(t.encode("utf-8")) for t in texts], pa.int64()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow")
