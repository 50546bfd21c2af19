"""Training-data operators over the local test tables (documents /
embeddings / events) — the web-scale data-prep extensions: dedup families,
similarity search, text analysis, windowed aggregates.

Every operator takes ``sf_dir`` and returns a lazy ``ray.data.Dataset``
(aggregates are small; heavy stages are vectorized map_batches).  Operators
with an exact SQL equivalent carry a DuckDB oracle in
``__ray_entry__.oracle_sql`` with IDENTICAL column names.
"""

from __future__ import annotations

import hashlib
import math
import os

from ..stages.hashagg import auto_pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import MinHasher, SimHasher
from ..functions.textstats import (
    STOP_WORDS,
    bm25_tokenize,
    detect_language,
    fingerprint,
    lm_tokenize,
    quality_stats,
)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=list(columns))


# ---------------------------------------------------------------- dedup --

def exact_dedup(sf_dir: str):
    """Exact dedup groups: one row per distinct md5(text) with the
    representative (min) doc_id and group size.  Hash-partitioned groupby;
    md5 matches DuckDB's ``md5()`` so the oracle is exact."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def add_fp(batch: pa.Table) -> pa.Table:
        # project to (fp, doc_id) BEFORE the exchange: the aggregate
        # never needs the text column, and shipping it through the sort
        # was ~20x the exchange volume (the 20M-doc out-of-disk)
        fps = [fingerprint(t) for t in batch.column("text").to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string()),
                         "doc_id": batch.column("doc_id")})

    return hash_grouped_aggregate(
        _docs(sf_dir).map_batches(add_fp, batch_format="pyarrow"),
        ["fp"],
        grouped_arrow_agg(["fp"], [("doc_id", "min"), ("doc_id", "count")],
                          rename=["fp", "doc_id", "n_dups"]))


def minhash_signatures(sf_dir: str, num_perm: int = 64, shingle_k: int = 3,
                       docs_ds=None):
    """Per-doc MinHash signature + LSH band hashes (flat band rows).
    Scale path for near-dedup: equal (band, band_hash) ⇒ candidate pair.

    ``docs_ds`` (optional) supplies the (doc_id, text) stream — the
    curation pipeline feeds its quality-filtered exact-dedup survivors
    here instead of the raw corpus."""
    class MinHashStage:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ids = np.asarray(batch.column("doc_id").to_pylist(),
                             dtype=np.int64)
            sigs = self.mh.signatures_batch(texts)   # vectorized, one hash pass
            bh = self.mh.bands_batch(sigs, num_bands=16)   # (n, 16)
            n_bands = bh.shape[1]
            return pa.table({
                "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32),
                                         len(ids)), pa.int32()),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            })

    from ..stages.memo import memoized_stage
    fn = memoized_stage(("minhash", num_perm, shingle_k), MinHashStage)
    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(fn, batch_format="pyarrow", batch_size=None)


def minhash_lsh_candidates(sf_dir: str, num_perm: int = 64, shingle_k: int = 3,
                           bands_ds=None,
                           hot_broadcast_limit: int = 1_000_000):
    """Candidate near-dup pairs (shingle→minhash→band→bucket groupby).

    Two-phase to dodge per-group Python overhead: (1) a native vectorized
    groupby counts bucket occupancy; only COLLIDING buckets (n>1) are
    kept, and (2) the band rows filtered to those buckets go through the
    pair-emitting map_groups.  On mostly-unique corpora this reduces the
    Python-group count from |docs|×bands to ~|duplicates|.

    Hot-bucket filter, two paths: the hot-key set is ~|duplicate
    buckets| — UNBOUNDED in corpus size — so it broadcasts only below
    ``hot_broadcast_limit`` keys, packed to one uint64 per key
    (``(band_hash << 4) ^ band``) and matched with a vectorized
    ``pc.is_in``.  The pack drops band_hash's top 4 bits, so distinct
    keys may alias — harmless: the filter only PRE-selects rows, the
    downstream groupby re-groups exactly on (band, band_hash) and a
    false-positive singleton group emits no pairs.  No false negatives
    (the pack is a pure function of the key).  Above the limit the hot
    keys stay a Dataset and the filter becomes a bucketed semi-join —
    nothing ships whole.

    ``bands_ds`` (optional) supplies pre-computed band rows — the query
    layer stages them to Parquet so the band→candidate derivation is
    DuckDB-oracle-checked (the signature math itself is unit-gated)."""
    import pandas as pd
    import ray
    from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                  hash_grouped_aggregate)

    bands = (bands_ds if bands_ds is not None
             else minhash_signatures(sf_dir, num_perm, shingle_k)).materialize()
    counts = hash_grouped_aggregate(
        bands, ["band", "band_hash"],
        grouped_arrow_agg(["band", "band_hash"], [("doc_id", "count")],
                          rename=["band", "band_hash", "n"]))
    hot = counts.filter(expr="n > 1").materialize()
    n_hot = hot.count()

    def _packed(band_arr, hash_arr) -> pa.UInt64Array:
        b = band_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = hash_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((h << np.uint64(4)) ^ b, pa.uint64())

    if n_hot <= hot_broadcast_limit:
        chunks = [_packed(b.column("band"), b.column("band_hash"))
                  for b in hot.iter_batches(batch_format="pyarrow")
                  if b.num_rows]          # empty blocks carry no columns
        hot_ref = ray.put(pa.concat_arrays(chunks) if chunks
                          else pa.array([], pa.uint64()))

        def only_hot(batch: pa.Table) -> pa.Table:
            packed = _packed(batch.column("band"),
                             batch.column("band_hash"))
            return batch.filter(pc.is_in(packed,
                                         value_set=ray.get(hot_ref)))

        hot_bands = bands.map_batches(only_hot, batch_format="pyarrow")
    else:
        hot_keys = hot.map_batches(
            lambda t: t.select(["band", "band_hash"]),
            batch_format="pyarrow")
        hot_bands = bucketed_join(bands, hot_keys, ["band", "band_hash"])

    def pairs(group: pd.DataFrame) -> pa.Table:
        ids = sorted(set(group["doc_id"]))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i]); b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    # native groupby is safe HERE (exception to the hashagg rule): the
    # hot-bucket filter leaves ~|duplicates| groups, not |docs|×bands
    cand = (hot_bands
            .groupby(["band", "band_hash"])
            .map_groups(pairs, batch_format="pandas"))
    return hash_grouped_aggregate(
        cand, ["doc_a", "doc_b"],
        grouped_arrow_agg(["doc_a", "doc_b"], [("doc_a", "count")],
                          rename=["doc_a", "doc_b", "n_bands"]))


def minhash_lsh_candidates_disk(sf_dir: str, num_perm: int = 64,
                                shingle_k: int = 3, docs_ds=None,
                                stage_dir: str | None = None,
                                num_shards: int = 64):
    """Disk-shuffle twin of :func:`minhash_lsh_candidates` for band
    volumes beyond the object-store/spill budget (the round-4 20M-doc
    attempt died at the in-store band exchange against the host's
    ~50 GB effective spill budget — CLAUDE.md).

    Same discipline as ``write_graph(disk_shuffle=True)``: the band rows
    stream MAP-ONLY into hash-partitioned Parquet
    (``stage_dir/shard=K/``, shard = band_hash % num_shards — a pure
    function of the group key, so every (band, band_hash) bucket lands
    whole in one shard), then one Ray task per shard reads its files and
    emits that shard's candidate pairs locally (numpy lexsort + bucket
    boundaries; the per-bucket Python pair loop only ever touches
    COLLIDING buckets).  The only object-store exchange left is the
    final (doc_a, doc_b) aggregate over the pair table, which is
    ~|duplicates|-sized by construction.  A pair colliding in several
    bands can surface in several shards (band_hash differs per band), so
    per-shard counts are partial and the small global aggregate sums
    them — output (doc_a, doc_b, n_bands) identical to the in-store path
    (equality-gated in tests/test_dedup_disk.py).

    Resumable: each shard's pair file is written once; a crashed run
    re-reduces only shards without an output file."""
    import glob as _glob
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    if stage_dir is None:
        stage_dir = os.path.join("/tmp", "graft_minhash_disk",
                                 os.path.basename(os.path.normpath(sf_dir)))
    bands_dir = os.path.join(stage_dir, "bands")
    pairs_dir = os.path.join(stage_dir, "pairs")

    if not os.path.exists(os.path.join(stage_dir, "_BANDS_DONE")):
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        os.makedirs(bands_dir)
        sigs = minhash_signatures(sf_dir, num_perm, shingle_k,
                                  docs_ds=docs_ds)

        def add_shard(batch: pa.Table) -> pa.Table:
            bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "shard", pa.array((bh % np.uint64(num_shards))
                                  .astype(np.int32), pa.int32()))

        (sigs.map_batches(add_shard, batch_format="pyarrow")
             .write_parquet(bands_dir, partition_cols=["shard"]))
        open(os.path.join(stage_dir, "_BANDS_DONE"), "w").write("1")

    os.makedirs(pairs_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def reduce_shard(k: int) -> int:
        out_path = os.path.join(pairs_dir, f"pairs-{k:04d}.parquet")
        if os.path.exists(out_path):          # crash-resume: done shard
            return 0
        files = _glob.glob(os.path.join(bands_dir, f"shard={k}",
                                        "*.parquet"))
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if not files:
            pq.write_table(empty, out_path)
            return 0
        t = pads.dataset(files).to_table(
            columns=["doc_id", "band", "band_hash"])
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bh, band))
        band, bh, did = band[order], bh[order], did[order]
        n = len(band)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        hot = np.nonzero(sizes >= 2)[0]       # colliding buckets only
        pair_n: dict = {}
        for gi in hot.tolist():
            ids = sorted(set(did[starts[gi]:ends[gi]].tolist()))
            m = len(ids)
            for i in range(m):
                a = ids[i]
                for j in range(i + 1, m):
                    key = (a, ids[j])
                    pair_n[key] = pair_n.get(key, 0) + 1
        if not pair_n:
            pq.write_table(empty, out_path)
            return 0
        keys = sorted(pair_n)
        out = pa.table({
            "doc_a": pa.array([k0 for k0, _ in keys], pa.int64()),
            "doc_b": pa.array([k1 for _, k1 in keys], pa.int64()),
            "n": pa.array([pair_n[k2] for k2 in keys], pa.int64())})
        pq.write_table(out, out_path)
        return out.num_rows

    ray.get([reduce_shard.remote(k) for k in range(num_shards)])

    pairs = rd.read_parquet(pairs_dir)
    return hash_grouped_aggregate(
        pairs, ["doc_a", "doc_b"],
        grouped_arrow_agg(["doc_a", "doc_b"], [("n", "sum")],
                          rename=["doc_a", "doc_b", "n_bands"]))


def simhash_signatures(sf_dir: str):
    """64-bit SimHash per document."""
    class SimHashStage:
        def __init__(self):
            self.sh = SimHasher()

        def __call__(self, batch: pa.Table) -> pa.Table:
            sigs = self.sh.signatures_batch(batch.column("text").to_pylist())
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(sigs, pa.uint64()),
            })

    from ..stages.memo import memoized_stage
    fn = memoized_stage("simhash", SimHashStage)
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no
    bitwise_count; unpackbits on the byte view is vectorized)."""
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                         axis=1).sum(axis=1).astype(np.int64)


def _collision_pairs(rows_ds, key_cols: list[str], pack_fn):
    """Shared exact-recall collision-pair generation for the simhash
    family: ONE hash-bucketed exchange on ``key_cols``; inside each
    bucket the rows are sorted by their uint64-packed key
    (``pack_fn(table)``) and pairs are emitted for runs of length > 1 —
    run detection is vectorized, Python touches only COLLIDING runs.
    A second (doc_a, doc_b) exchange dedups pairs found under multiple
    keys.  (Fused from the earlier occupancy-count + hot-broadcast +
    native-groupby three-exchange shape: same output, one exchange and
    zero broadcasts fewer — at sf scale the stages were pure fixed
    overhead, at web scale the hot-key broadcast was the bound.)"""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        packed = pack_fn(t)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, packed))
        k, d = packed[order], ids[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.concatenate((starts[1:], [len(k)]))
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):      # colliding runs only
            if e - s > 1:
                run = np.unique(d[s:e])
                if len(run) > 1:
                    i, j = np.triu_indices(len(run), 1)
                    a_parts.append(run[i])
                    b_parts.append(run[j])
        if not a_parts:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(a_parts), pa.int64()),
            "doc_b": pa.array(np.concatenate(b_parts), pa.int64())})

    return hash_grouped_aggregate(
        hash_grouped_aggregate(rows_ds, key_cols, bucket_pairs),
        ["doc_a", "doc_b"],
        grouped_arrow_agg(["doc_a", "doc_b"], [("doc_a", "count")],
                          rename=["doc_a", "doc_b", "n_keys"]),
    ).map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                  batch_format="pyarrow").materialize()


def _hamming_verify(cand, sigs, max_hamming: int, small_cand_limit: int):
    """Exact popcount verify of candidate (doc_a, doc_b) pairs against
    the signature table: broadcast candidate-doc signatures below
    ``small_cand_limit``, bucketed joins above (two-path, same as
    ``ngram_dedup_pairs``)."""
    import ray

    from ..stages.hashagg import bucketed_join

    def _verify_arrays(da, db, sa, sb):
        h = _popcount64(np.bitwise_xor(sa, sb))
        keep = h <= max_hamming
        return pa.table({
            "doc_a": pa.array(da[keep], pa.int64()),
            "doc_b": pa.array(db[keep], pa.int64()),
            "hamming": pa.array(h[keep], pa.int64())})

    n_cand = cand.count()
    if n_cand == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64()),
                                       "hamming": pa.array([], pa.int64())}))

    if n_cand <= small_cand_limit:
        # small fast path: candidate-doc signatures only (never the full
        # table at scale; here candidates bound the broadcast)
        ids: set[int] = set()
        for b in cand.iter_batches(batch_format="pyarrow"):
            ids.update(b.column("doc_a").to_pylist())
            ids.update(b.column("doc_b").to_pylist())
        sig_map: dict[int, int] = {}
        idarr = pa.array(sorted(ids), pa.int64())
        for b in sigs.iter_batches(batch_format="pyarrow"):
            f = b.filter(pc.is_in(b.column("doc_id"), value_set=idarr))
            sig_map.update(zip(f.column("doc_id").to_pylist(),
                               f.column("simhash").to_pylist()))
        sref = ray.put(sig_map)

        def verify_small(batch: pa.Table) -> pa.Table:
            sm = ray.get(sref)
            da = batch.column("doc_a").to_numpy(zero_copy_only=False)
            db = batch.column("doc_b").to_numpy(zero_copy_only=False)
            sa = np.array([sm[x] for x in da], np.uint64)
            sb = np.array([sm[x] for x in db], np.uint64)
            return _verify_arrays(da, db, sa, sb)

        return cand.map_batches(verify_small, batch_format="pyarrow")

    def sigs_as(key: str):
        return sigs.map_batches(
            lambda t, k=key: t.rename_columns([k, f"sig_{k[-1]}"]),
            batch_format="pyarrow")

    n_buckets = max(8, min(64, n_cand // 50_000 + 1))
    with_a = bucketed_join(cand, sigs_as("doc_a"), on=["doc_a"],
                           num_buckets=n_buckets
                           ).repartition(n_buckets).materialize()
    with_ab = bucketed_join(with_a, sigs_as("doc_b"), on=["doc_b"],
                            num_buckets=n_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        sa = batch.column("sig_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        sb = batch.column("sig_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        return _verify_arrays(da, db, sa, sb)

    return with_ab.map_batches(verify, batch_format="pyarrow")


def simhash_dup_pairs_manku(sf_dir: str, max_hamming: int = 3,
                            n_blocks: int = 6, sigs_ds=None,
                            small_cand_limit: int = 10_000):
    """SimHash near-dup pairs via Manku/Jain/Sarma 2007 (WWW) permuted
    prefix tables — the WEB-SCALE member of the simhash family.

    The 64-bit signature splits into ``n_blocks`` blocks; any two
    signatures within Hamming distance ≤ ``max_hamming`` agree exactly
    on at least ``n_blocks - max_hamming`` blocks (pigeonhole), so each
    of the C(n_blocks, n_blocks-max_hamming) block subsets becomes one
    "permuted table" whose sort key is the subset's concatenated bits.
    With the defaults (6 blocks → 20 tables, ~32-bit keys) bucket
    occupancy is ~N²/2³² per table instead of the 4×16-bit banding's
    ~N²/2¹⁶ — candidates stay linear far past the banding's ~1M-doc
    wall, at the cost of 20 key rows/doc on the wire instead of 4.
    Same guaranteed recall (exact for distance ≤ max_hamming), same
    exact popcount verify, so output is IDENTICAL to the banding path
    (path-equality gated in tests)."""
    from itertools import combinations

    sigs = (sigs_ds if sigs_ds is not None
            else simhash_signatures(sf_dir)).materialize()
    if not 0 < n_blocks - max_hamming:
        raise ValueError("need n_blocks > max_hamming for pigeonhole "
                         "recall")
    base, rem = divmod(64, n_blocks)
    widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    offsets = np.cumsum([0] + widths[:-1])
    subsets = list(combinations(range(n_blocks), n_blocks - max_hamming))

    def to_keys(t: pa.Table) -> pa.Table:
        s = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        for ti, subset in enumerate(subsets):
            key = np.zeros_like(s)
            for b in subset:
                blockval = ((s >> np.uint64(offsets[b]))
                            & np.uint64((1 << widths[b]) - 1))
                key = (key << np.uint64(widths[b])) | blockval
            parts.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "tbl": pa.array(np.full(len(ids), ti, np.int64)),
                "key": pa.array(key, pa.uint64())}))
        return pa.concat_tables(parts)

    rows = sigs.map_batches(to_keys, batch_format="pyarrow")

    # pack (tbl < C(n_blocks, ·) ≤ 64 → 6 bits, key ≤ 64-max_hamming·base
    # bits) into one uint64 run key
    def pack(t: pa.Table) -> np.ndarray:
        tb = t.column("tbl").to_numpy(zero_copy_only=False).astype(np.uint64)
        kv = t.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (kv << np.uint64(6)) | tb

    cand = _collision_pairs(rows, ["tbl", "key"], pack)
    return _hamming_verify(cand, sigs, max_hamming, small_cand_limit)


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3, n_bands: int = 4,
                      sigs_ds=None, small_cand_limit: int = 10_000):
    """SimHash near-dup pairs: 64-bit signatures → pigeonhole banding →
    exact Hamming verify.

    The 64-bit signature is sliced into ``n_bands`` equal bands; any two
    signatures within Hamming distance < ``n_bands`` agree exactly on at
    least one band (pigeonhole), so band-equality buckets have guaranteed
    recall for ``max_hamming ≤ n_bands - 1`` (the classic simhash dedup
    layout: 4 × 16-bit bands for distance ≤ 3).  Candidates then get an
    exact vectorized popcount verify.

    Same two-phase bucket discipline as ``minhash_lsh_candidates``
    (vectorized occupancy count first, per-group Python only on colliding
    buckets) and the same two-path verify as ``ngram_dedup_pairs``
    (broadcast the candidate signatures below ``small_cand_limit``,
    bucketed joins above — the signature table is 16 bytes/doc, but at
    web scale even that never ships whole).

    Scale regimes (both exact-recall): band-bucket occupancy grows
    ~N²/2¹⁶ on uniform signatures — fine to ~1M docs; above that,
    ``simhash_dup_pairs_manku`` (permuted-prefix tables, ~N²/2³²
    occupancy) is the web-scale twin producing the IDENTICAL verified
    pair set (path-equality gated in tests).

    ``sigs_ds`` lets the query layer stage the signature rows so the
    band→candidate→verify derivation is DuckDB-oracle-checked
    (``bit_count(xor(...))``); the signature hashing itself stays
    unit-gated via the staged-vocab ``simhash_signatures`` oracle."""
    sigs = (sigs_ds if sigs_ds is not None
            else simhash_signatures(sf_dir)).materialize()
    band_width = 64 // n_bands
    mask = np.uint64((1 << band_width) - 1)

    def to_bands(t: pa.Table) -> pa.Table:
        s = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        for b in range(n_bands):
            parts.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(np.full(len(ids), b, np.int64())),
                "band_val": pa.array((s >> np.uint64(band_width * b)) & mask,
                                     pa.uint64())}))
        return pa.concat_tables(parts)

    bands = sigs.map_batches(to_bands, batch_format="pyarrow")

    # pack (band, band_val) into one uint64 run key
    pack_shift = np.uint64(band_width)

    def pack(t: pa.Table) -> np.ndarray:
        b = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t.column("band_val").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (b << pack_shift) | v

    cand = _collision_pairs(bands, ["band", "band_val"], pack)
    return _hamming_verify(cand, sigs, max_hamming, small_cand_limit)


def simhash_vocab(sf_dir: str):
    """Distinct (word, h) rows over the corpus's lowercased whitespace
    tokens, h = the stable 64-bit word hash SimHash votes on.  Staged for
    the simhash oracle: the word hash is not available in SQL, so the
    hashes are an input table and DuckDB re-derives the
    tokenize→vote→pack pipeline."""
    from ..functions.dedup import stable_word_hashes
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def words(batch: pa.Table) -> pa.Table:
        out = set()
        for t in batch.column("text").to_pylist():
            out.update(t.lower().split())
        ws = sorted(out)
        return pa.table({"word": pa.array(ws, pa.string())})

    distinct = hash_grouped_aggregate(
        _docs(sf_dir).map_batches(words, batch_format="pyarrow"),
        ["word"], grouped_arrow_agg(["word"], [("word", "count")],
                                    rename=["word", "n"]))

    def hashed(batch: pa.Table) -> pa.Table:
        hs = stable_word_hashes(batch.column("word").to_pylist())
        return pa.table({"word": batch.column("word"),
                         "h": pa.array(hs, pa.uint64())})

    return distinct.map_batches(hashed, batch_format="pyarrow")


def ngram_dedup_pairs(sf_dir: str, threshold: float = 0.8, n: int = 3,
                      cand_ds=None, small_cand_limit: int = 10_000):
    """LSH candidates verified by character n-gram Jaccard ≥ threshold.

    Round-2 rework (VERDICT r01 task 5): the candidate pairs are joined
    back to the documents table TWICE via ``bucketed_join`` (doc_a side,
    then doc_b side) instead of broadcasting the whole corpus text into
    the verify stage — at web scale the candidate set is tiny next to the
    corpus, and the join ships only candidate rows + matching texts.
    The documents side is semi-join-pruned first: the candidate doc-id
    KEY SET (small by construction — LSH collisions) is broadcast once
    via ``ray.put`` and each batch keeps only ``is_in`` rows, so the two
    join shuffles move candidate texts, not the corpus (the repo's
    broadcast-key-set join discipline)."""
    import ray

    from ..stages.hashagg import bucketed_join

    cand = (cand_ds if cand_ds is not None
            else minhash_lsh_candidates(sf_dir)).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]),
        batch_format="pyarrow").materialize()
    ids: set[int] = set()
    n_cand = 0
    for b in cand.iter_batches(batch_format="pyarrow"):
        n_cand += b.num_rows
        ids.update(b.column("doc_a").to_pylist())
        ids.update(b.column("doc_b").to_pylist())
    idref = ray.put(pa.array(sorted(ids), pa.int64()))
    # bucket count sized to the candidate set: 64 buckets on a few
    # hundred pairs is pure exchange overhead (measured ~4.7 s of fixed
    # shuffle cost at sf0.1); target ~50k pairs per bucket
    n_buckets = max(8, min(64, n_cand // 50_000 + 1))

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("doc_id"),
                                 value_set=ray.get(idref)))

    # ONE corpus read feeds both join sides (the pruned table is
    # candidate-sized, so materializing it is cheap)
    pruned = _docs(sf_dir).map_batches(prune,
                                       batch_format="pyarrow").materialize()

    if n_cand <= small_cand_limit:
        # small fast path (two-path discipline, equality-tested): below
        # the limit the candidate TEXTS (≤ 2×n_cand docs — never the
        # corpus) are broadcast once and verified in one stateless pass;
        # the two bucketed joins below are pure exchange overhead at
        # this size (measured ~8 s of fixed shuffle cost at sf0.1 for a
        # few hundred pairs)
        texts: dict[int, str] = {}
        for b in pruned.iter_batches(batch_format="pyarrow"):
            texts.update(zip(b.column("doc_id").to_pylist(),
                             b.column("text").to_pylist()))
        tref = ray.put(texts)

        def verify_small(batch: pa.Table) -> pa.Table:
            from ..functions.dedup import ngram_jaccard
            tx = ray.get(tref)
            keep_a, keep_b, sims = [], [], []
            for x, y in zip(batch.column("doc_a").to_pylist(),
                            batch.column("doc_b").to_pylist()):
                s = ngram_jaccard(tx[x], tx[y], n)
                if s >= threshold:
                    keep_a.append(x); keep_b.append(y); sims.append(round(s, 4))
            return pa.table({"doc_a": pa.array(keep_a, pa.int64()),
                             "doc_b": pa.array(keep_b, pa.int64()),
                             "jaccard": pa.array(sims, pa.float64())})

        return cand.map_batches(verify_small, batch_format="pyarrow")

    def docs_as(key: str):
        return pruned.map_batches(
            lambda t, k=key: t.rename_columns([k, f"text_{k[-1]}"]),
            batch_format="pyarrow")

    # cut between the joins: the second join's schema probe would re-run
    # the first join's full sort on a lazy input, and two all-to-alls in
    # one streaming plan throttle the executor (see dedup_clusters note)
    with_a = bucketed_join(cand, docs_as("doc_a"), on=["doc_a"],
                           num_buckets=n_buckets
                           ).repartition(n_buckets).materialize()
    with_ab = bucketed_join(with_a, docs_as("doc_b"), on=["doc_b"],
                            num_buckets=n_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        from ..functions.dedup import ngram_jaccard
        keep_a, keep_b, sims = [], [], []
        for x, y, ta, tb in zip(batch.column("doc_a").to_pylist(),
                                batch.column("doc_b").to_pylist(),
                                batch.column("text_a").to_pylist(),
                                batch.column("text_b").to_pylist()):
            s = ngram_jaccard(ta, tb, n)
            if s >= threshold:
                keep_a.append(x); keep_b.append(y); sims.append(round(s, 4))
        return pa.table({"doc_a": pa.array(keep_a, pa.int64()),
                         "doc_b": pa.array(keep_b, pa.int64()),
                         "jaccard": pa.array(sims, pa.float64())})

    return with_ab.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------------------- corpus curation --

def curation_survivors(sf_dir: str, min_tokens: int = 20,
                       max_punct: float = 0.2, min_stopword: float = 0.01,
                       lang: str | None = "en"):
    """Annotate → quality-filter → exact-dedup: the first half of the
    webtext curation pipeline.  One vectorized-per-batch annotate pass
    computes language, token/char counts, punct/stopword ratios and the
    md5 fingerprint; quality gates filter inline (no shuffle); exact
    dedup keeps the min-doc_id row per fingerprint via the hash-bucketed
    aggregate (the repo's only-shuffle-when-grouping discipline).

    Returns survivor rows carrying ``text`` (the near-dedup stage still
    needs it) + ``n_exact_dups`` (exact-duplicate group size)."""
    from ..stages.hashagg import hash_grouped_aggregate

    def dedup_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["fp", "doc_id"])
        first = df.drop_duplicates("fp", keep="first").set_index("fp")
        first["n_exact_dups"] = df.groupby("fp").size().astype("int64")
        return pa.Table.from_pandas(first.reset_index(drop=True),
                                    preserve_index=False)

    annotated = _curation_annotated(sf_dir, min_tokens, max_punct,
                                    min_stopword, lang)
    return hash_grouped_aggregate(annotated, ["fp"], dedup_bucket)


def _curation_annotated(sf_dir: str, min_tokens: int = 20,
                        max_punct: float = 0.2, min_stopword: float = 0.01,
                        lang: str | None = "en"):
    """Annotated + quality-gated doc rows (with text and fp) — the
    shared no-shuffle front half of both survivor paths."""

    def annotate(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        rows = [quality_stats(t) for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": batch.column("text"),
            "lang_pred": pa.array([detect_language(t) for t in texts],
                                  pa.string()),
            "n_tokens": pa.array([r["n_words"] for r in rows], pa.int64()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            # raw IEEE f64 divisions — bit-identical to DuckDB's k*1.0/n
            "punct_ratio": pa.array([r["punct_ratio"] for r in rows],
                                    pa.float64()),
            "stopword_ratio": pa.array([r["stopword_ratio"] for r in rows],
                                       pa.float64()),
            "fp": pa.array([fingerprint(t) for t in texts], pa.string()),
        })

    def keep(batch: pa.Table) -> pa.Table:
        lang_ok = (pc.equal(batch.column("lang_pred"), lang)
                   if lang is not None
                   else pa.array([True] * batch.num_rows, pa.bool_()))
        mask = pc.and_(
            pc.and_(lang_ok,
                    pc.greater_equal(batch.column("n_tokens"),
                                     pa.scalar(min_tokens, pa.int64()))),
            pc.and_(pc.less_equal(batch.column("punct_ratio"), max_punct),
                    pc.greater_equal(batch.column("stopword_ratio"),
                                     min_stopword)))
        return batch.filter(mask)

    return (_docs(sf_dir)
            .map_batches(annotate, batch_format="pyarrow")
            .map_batches(keep, batch_format="pyarrow"))


def curation_survivors_skinny(sf_dir: str, ann_dir: str,
                              min_tokens: int = 20, max_punct: float = 0.2,
                              min_stopword: float = 0.01,
                              lang: str | None = "en",
                              dup_broadcast_limit: int = 20_000_000):
    """Skinny-exchange twin of :func:`curation_survivors` for corpora
    whose text volume exceeds the exchange budget (the 10M-docs/batch
    ingest ladder: shipping annotated TEXT through the exact-dedup sort
    produced ~200 GB of transient spill+fallback).  Identical output
    (equality-gated via the corpus_curation disk-mode test):

    1. the annotated+gated rows stream ONCE to ``ann_dir`` Parquet
       (map-only, no exchange; texts only ever live map-side or on
       disk);
    2. the only exchange is over projected (fp, doc_id) rows — a
       per-fp (rep=min doc_id, n) aggregate;
    3. groups with n > 1 (the duplicate groups — small relative to the
       corpus; bounded by ``dup_broadcast_limit`` rows, above which
       this path REFUSES and the sorted-exchange path must be used)
       broadcast via ``ray.put``, and a final stateless map filters
       non-representative dup members and attaches ``n_exact_dups``
       (1 for every fp not in the broadcast)."""
    import shutil

    import ray
    import ray.data as rd

    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    if not os.path.exists(os.path.join(ann_dir, "_ANN_DONE")):
        if os.path.exists(ann_dir):
            shutil.rmtree(ann_dir)
        os.makedirs(ann_dir)
        _curation_annotated(sf_dir, min_tokens, max_punct, min_stopword,
                            lang).write_parquet(ann_dir)
        open(os.path.join(ann_dir, "_ANN_DONE"), "w").write("1")
    ann = rd.read_parquet(ann_dir)

    groups = hash_grouped_aggregate(
        ann.map_batches(lambda t: t.select(["fp", "doc_id"]),
                        batch_format="pyarrow"),
        ["fp"],
        grouped_arrow_agg(["fp"], [("doc_id", "min"), ("doc_id", "count")],
                          rename=["fp", "rep", "n"]))
    dups = groups.filter(expr="n > 1").materialize()
    n_dup_groups = dups.count()
    if n_dup_groups > dup_broadcast_limit:
        raise ValueError(
            f"curation_survivors_skinny: {n_dup_groups:,} duplicate "
            f"fp groups exceed dup_broadcast_limit="
            f"{dup_broadcast_limit:,}; use the sorted-exchange "
            "curation_survivors path (or raise the limit if the "
            "driver/workers have the memory).")
    chunks = [b for b in dups.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    dup_tbl = (pa.concat_tables(chunks) if chunks
               else pa.table({"fp": pa.array([], pa.string()),
                              "rep": pa.array([], pa.int64()),
                              "n": pa.array([], pa.int64())}))
    dup_ref = ray.put(dup_tbl)
    _dup_cache: dict = {}

    def finalize(t: pa.Table) -> pa.Table:
        d = _dup_cache.get("m")
        if d is None:
            dt = ray.get(dup_ref)
            d = dict(zip(dt.column("fp").to_pylist(),
                         zip(dt.column("rep").to_pylist(),
                             dt.column("n").to_pylist())))
            _dup_cache["m"] = d
        fps = t.column("fp").to_pylist()
        ids = t.column("doc_id").to_pylist()
        keep_m, n_out = [], []
        for f, i in zip(fps, ids):
            rn = d.get(f)
            if rn is None:
                keep_m.append(True)
                n_out.append(1)
            else:
                keep_m.append(i == rn[0])
                n_out.append(rn[1])
        t = t.append_column("n_exact_dups", pa.array(n_out, pa.int64()))
        return t.filter(pa.array(keep_m, pa.bool_())).drop_columns(["fp"])

    return ann.map_batches(finalize, batch_format="pyarrow")


def corpus_curation(sf_dir: str, min_tokens: int = 20,
                    max_punct: float = 0.2, min_stopword: float = 0.01,
                    jaccard_threshold: float = 0.8,
                    survivors_ds=None, bands_ds=None,
                    keep_text: bool = False, lang: str | None = "en",
                    disk_shuffle: bool = False,
                    stage_dir: str | None = None):
    """End-to-end webtext curation over ``documents``: language-ID +
    quality gates → exact dedup (md5 groups, keep min doc_id) →
    MinHash-LSH near-dedup (banded candidates → char-trigram Jaccard
    verify ≥ threshold → drop the LARGER doc_id of every verified pair —
    the deterministic keep-first policy; no transitive clustering, so the
    decision is per-pair and SQL-replayable).

    Composition of the individually-oracle-checked pieces into the
    pipeline a 100-TB pre-training corpus actually runs: every stage
    streams; the only shuffles are the fp-group and the LSH band group;
    the verified-pair drop set is broadcast (near-dup pairs are tiny next
    to the corpus by construction).

    ``survivors_ds`` / ``bands_ds`` let the query layer stage the band
    rows so the whole composition is DuckDB-oracle-checked.

    ``disk_shuffle=True`` (corpus volumes beyond the object-store/spill
    budget — the 20M-doc curation leg ENOSPC'd the in-store path):
    survivors stream to a Parquet stage instead of materializing in the
    store (their text column is the corpus — the dominant volume), and
    candidates come from :func:`minhash_lsh_candidates_disk`.  Output
    identical (equality-gated in tests/test_dedup_disk.py)."""
    import ray

    if disk_shuffle and survivors_ds is None:
        import shutil
        import ray.data as rd
        stage_dir = stage_dir or os.path.join(
            "/tmp", "graft_curation_stage",
            os.path.basename(os.path.normpath(sf_dir)))
        surv_dir = os.path.join(stage_dir, "survivors")
        if not os.path.exists(os.path.join(stage_dir, "_SURV_DONE")):
            if os.path.exists(stage_dir):
                shutil.rmtree(stage_dir)
            os.makedirs(surv_dir)
            # skinny twin: annotated rows stage once to Parquet; only
            # (fp, doc_id) is exchanged; dup groups broadcast — the
            # text column never enters a shuffle (equality-gated)
            curation_survivors_skinny(
                sf_dir, os.path.join(stage_dir, "annotated"),
                min_tokens, max_punct, min_stopword,
                lang=lang).write_parquet(surv_dir)
            open(os.path.join(stage_dir, "_SURV_DONE"), "w").write("1")
        surv = rd.read_parquet(surv_dir)
        cand = minhash_lsh_candidates_disk(
            sf_dir, docs_ds=surv.map_batches(
                lambda t: t.select(["doc_id", "text"]),
                batch_format="pyarrow"),
            stage_dir=os.path.join(stage_dir, "minhash"),
            num_shards=128).materialize()
    else:
        surv = (survivors_ds if survivors_ds is not None
                else curation_survivors(sf_dir, min_tokens, max_punct,
                                        min_stopword, lang=lang)
                .materialize())
        bands = bands_ds if bands_ds is not None else minhash_signatures(
            sf_dir, docs_ds=surv.map_batches(
                lambda t: t.select(["doc_id", "text"]),
                batch_format="pyarrow"))
        cand = minhash_lsh_candidates(sf_dir, bands_ds=bands).materialize()

    drop: set[int] = set()
    if cand.count() > 0:
        verified = ngram_dedup_pairs(sf_dir, threshold=jaccard_threshold,
                                     cand_ds=cand)
        for b in verified.iter_batches(batch_format="pyarrow"):
            drop.update(b.column("doc_b").to_pylist())
    drop_ref = ray.put(pa.array(sorted(drop), pa.int64()))

    cols = ["doc_id", "lang_pred", "n_tokens", "n_chars", "punct_ratio",
            "stopword_ratio", "n_exact_dups"] + (["text"] if keep_text
                                                 else [])

    def final(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch.column("doc_id"),
                                  value_set=ray.get(drop_ref)))
        return batch.filter(keep).select(cols)

    return surv.map_batches(final, batch_format="pyarrow")


def dedup_clusters(sf_dir: str, threshold: float = 0.8, n: int = 3,
                   cand_ds=None, verified_ds=None,
                   small_graph_limit: int = 2_000_000,
                   small_map_limit: int = 5_000_000):
    """Transitive near-dup clustering: LSH candidates → char-trigram
    Jaccard verify → connected components over the verified-pair graph →
    one representative (min ``doc_id``) per cluster.

    This is the cluster keep-policy a web-scale curation run actually
    wants (one survivor per duplicate *cluster*, the RefinedWeb/CCNet
    shape) and it genuinely differs from ``corpus_curation``'s per-pair
    drop-larger rule: verified pairs (1,3),(2,3) keep {1,2} per-pair but
    only {1} transitively — duplicate chains collapse to one survivor.

    Scale shape: the verified-pair graph is tiny next to the corpus by
    construction (only LSH-colliding, Jaccard-verified docs appear);
    component labeling reuses the two-path CC machinery
    (``pipelines.communities.connected_components``: driver union-find
    ≤ ``small_graph_limit`` edges, hash-to-min label propagation with
    pointer doubling above).  Assignments flow back onto ``documents``
    via one broadcast map (≤ ``small_map_limit`` clustered docs) or a
    bucketed left join — the corpus itself is never materialized.

    Output per document: ``doc_id``, ``cluster`` (representative =
    smallest member doc_id; singletons map to themselves),
    ``cluster_size``, ``is_kept`` (1 for the representative, else 0 —
    BIGINT per the no-NULL/no-bool oracle column discipline)."""
    import ray

    from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                  hash_grouped_aggregate)
    from .communities import connected_components

    # ``verified_ds`` lets a pipeline that already ran the Jaccard
    # verify (corpus_curation, the scale scripts) feed its pairs in
    # without recomputing the two corpus joins
    verified = (verified_ds if verified_ds is not None
                else ngram_dedup_pairs(sf_dir, threshold=threshold, n=n,
                                       cand_ds=cand_ds))

    # CC labels are strings with a lexicographic-min rule; zero-pad the
    # int64 doc ids to a fixed width so lexicographic min == numeric min
    pad = 20

    def to_edges(t: pa.Table) -> pa.Table:
        a = [str(x).zfill(pad) for x in t.column("doc_a").to_pylist()]
        b = [str(x).zfill(pad) for x in t.column("doc_b").to_pylist()]
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    edges = verified.map_batches(to_edges,
                                 batch_format="pyarrow").materialize()
    docs = _docs(sf_dir, columns=("doc_id",))

    def singletons(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        ones = pa.array([1] * batch.num_rows, pa.int64())
        return pa.table({"doc_id": ids, "cluster": ids,
                         "cluster_size": ones, "is_kept": ones})

    if edges.count() == 0:
        return docs.map_batches(singletons, batch_format="pyarrow")

    comp = connected_components(edges, small_graph_limit=small_graph_limit)

    def decode(t: pa.Table) -> pa.Table:
        nodes = [int(v) for v in t.column("node").to_pylist()]
        comps = [int(v) for v in t.column("component").to_pylist()]
        return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                         "cluster": pa.array(comps, pa.int64())})

    assign = comp.map_batches(decode, batch_format="pyarrow").materialize()

    if assign.count() <= small_map_limit:
        # small fast path (two-path discipline, equality-tested): the
        # assignment is clustered-docs-only, broadcast ONCE via ray.put
        amap: dict[int, int] = {}
        for b in assign.iter_batches(batch_format="pyarrow"):
            amap.update(zip(b.column("doc_id").to_pylist(),
                            b.column("cluster").to_pylist()))
        sizes: dict[int, int] = {}
        for c in amap.values():
            sizes[c] = sizes.get(c, 0) + 1
        aref = ray.put((amap, sizes))

        def attach(batch: pa.Table) -> pa.Table:
            m, s = ray.get(aref)
            ids = batch.column("doc_id").to_pylist()
            cl = [m.get(i, i) for i in ids]
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "cluster_size": pa.array([s.get(c, 1) for c in cl],
                                         pa.int64()),
                "is_kept": pa.array(
                    [1 if c == i else 0 for i, c in zip(ids, cl)],
                    pa.int64())})

        return docs.map_batches(attach, batch_format="pyarrow")

    # scale path: cluster sizes via the hash-bucketed aggregate, then two
    # bucketed joins (assignment×sizes, documents×assignment) — no
    # driver-side or broadcast copy of the assignment.  MATERIALIZE (and
    # coalesce) between the joins: chaining three all-to-all sorts in
    # one streaming plan throttles the executor to near-idle (measured
    # at 10M docs: load ~0.2, 20+ min stalled; split plans run in
    # normal sort time), and the coalesce is the tiny-block sort-fan
    # rule from communities.connected_components
    sizes_ds = hash_grouped_aggregate(
        assign, ["cluster"],
        grouped_arrow_agg(["cluster"], [("doc_id", "count")],
                          rename=["cluster", "cluster_size"]),
    ).repartition(64).materialize()
    with_size = bucketed_join(assign, sizes_ds,
                              on=["cluster"]).repartition(64).materialize()
    joined = bucketed_join(docs, with_size, on=["doc_id"], how="left")

    def finish(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        # the left join pads misses with nulls, which promotes the int64
        # columns to float64 in the pandas merge — cast back before use
        cl = pc.coalesce(pc.cast(t.column("cluster"), pa.int64()), ids)
        cs = pc.coalesce(pc.cast(t.column("cluster_size"), pa.int64()),
                         pa.scalar(1, pa.int64()))
        kept = pc.cast(pc.equal(cl, ids), pa.int64())
        return pa.table({"doc_id": ids, "cluster": cl,
                         "cluster_size": cs, "is_kept": kept})

    return joined.map_batches(finish, batch_format="pyarrow")


def write_curated_corpus(curated_ds, out_dir: str, num_shards: int = 16,
                         fingerprint_parts: tuple = ()):
    """Resumable curated-corpus sink: ``docs/shard=K/`` partitioned by
    ``hash(doc_id) % num_shards``, one manifest per shard + a top-level
    rollup (same partition-granularity resume discipline as
    ``pipelines/kg.write_graph``).  A rerun with an unchanged fingerprint
    returns the existing manifest without rewriting — never one giant
    file, and a failed run skips finished output."""
    import shutil

    import pyarrow.dataset as pads

    from ..state.manifests import (fingerprint_config, read_manifest,
                                   stage_complete, write_manifest)

    fp = fingerprint_config("curated_corpus", num_shards, *fingerprint_parts)
    if stage_complete(out_dir, fp):
        return read_manifest(out_dir)

    docs_dir = os.path.join(out_dir, "docs")
    if os.path.exists(docs_dir):        # write_parquet APPENDS
        shutil.rmtree(docs_dir)
    os.makedirs(docs_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array((ids % num_shards).astype("int32")))

    (curated_ds.map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(docs_dir, partition_cols=["shard"]))

    shard_counts = {}
    for name in sorted(os.listdir(docs_dir)):
        shard_dir = os.path.join(docs_dir, name)
        if os.path.isdir(shard_dir) and name.startswith("shard="):
            n = pads.dataset(shard_dir).count_rows()
            shard_counts[name] = n
            write_manifest(shard_dir, "curated_shard",
                           fingerprint_config("curated_corpus", num_shards,
                                              name, *fingerprint_parts),
                           rows=n)
    total = sum(shard_counts.values())
    return write_manifest(out_dir, "curated_corpus", fp, rows=total,
                          extra={"n_docs": total, "num_shards": num_shards,
                                 "shard_rows": shard_counts})


# ---------------------------------------------------- similarity search --

def _lowest_vec_rows(path: str, n: int) -> pa.Table:
    """The ``n`` rows with the smallest vec_ids, ascending — the
    deterministic query/sample selector every ANN entry point uses.
    Distributed partial min-k (per-block smallest-n, driver merge of
    blocks × n candidate rows), never a whole-table driver read: the
    old ``pq.read_table`` of the full embeddings table is a driver OOM
    at corpus scale."""
    import ray.data as rd

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def smallest(t: pa.Table) -> pa.Table:
        return t.take(pc.sort_indices(t.column("vec_id"))[:n])

    parts = [b for b in ds.map_batches(
        smallest, batch_format="pyarrow",
        batch_size=None).iter_batches(batch_format="pyarrow")
        if b.num_rows]
    if not parts:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "embedding": pa.array([], pa.list_(pa.float32()))})
    merged = pa.concat_tables(parts, promote_options="permissive")
    return merged.take(pc.sort_indices(merged.column("vec_id"))[:n])


def knn_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Brute-force cosine top-k: the first ``n_queries`` vectors (by vec_id)
    are the query set, broadcast once (``ray.put``); each batch computes a
    numpy matmul partial; global top-k via sort+limit per query."""
    import ray
    import ray.data as rd
    import pandas as pd

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    head = _lowest_vec_rows(path, n_queries)
    qids = head.column("vec_id").to_pylist()
    qmat = np.array(head.column("embedding").to_pylist(), dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put((qids, qmat))

    def score(batch: pa.Table) -> pa.Table:
        ids_, qm = ray.get(qref)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = vecs @ qm.T                      # (n, nq)
        vid = batch.column("vec_id").to_pylist()
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids_):
            col = sims[:, qi]
            top = np.argsort(-col)[:k]          # per-batch partial top-k
            for t in top:
                out_q.append(qid); out_v.append(vid[t]); out_s.append(col[t])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partial = ds.map_batches(score, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].tolist(), pa.int64()),
            "vec_id": pa.array(g["vec_id"].tolist(), pa.int64()),
            "rank": pa.array(range(1, len(g) + 1), pa.int64()),
        })

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def cosine_dup_pairs(sf_dir: str, threshold: float = 0.8):
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cosine ≥ threshold).
    Small side (full matrix) broadcast once; per-batch matmul against it.
    Scale path: replace broadcast with LSH bucketing (`lsh_buckets`)."""
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as pq
    all_tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    all_ids = np.asarray(all_tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(all_tbl.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((all_ids, mat))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m = ray.get(ref)
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = vecs @ m.T
        rows_a, rows_b = [], []
        for i in range(len(vid)):
            hits = np.where(sims[i] >= threshold)[0]
            for j in hits:
                if vid[i] < ids_all[j]:
                    rows_a.append(int(vid[i])); rows_b.append(int(ids_all[j]))
        return pa.table({"vec_a": pa.array(rows_a, pa.int64()),
                         "vec_b": pa.array(rows_b, pa.int64())})

    return ds.map_batches(pairs, batch_format="pyarrow")


def cosine_dup_pairs_bucketed(sf_dir: str, threshold: float = 0.8,
                              n_bands: int = 32, band_bits: int = 4):
    """Embedding near-dup pairs via hyperplane-LSH blocking
    (``stages/ann.py``) — the scale path for ``cosine_dup_pairs``: no
    full-matrix broadcast, no all-pairs; within-bucket exact cosine, then
    band dedup.  Recall vs the exact op is 1-(1-p^bits)^bands with
    p = 1 - acos(threshold)/π (≈ 1-6e-8 at 0.8 with the defaults);
    ``test_ann_bucketed`` pins exact-path equality on the test corpus."""
    import ray.data as rd
    from ..stages.ann import lsh_cosine_candidates

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    pairs = lsh_cosine_candidates(ds, "vec_id", "embedding",
                                  threshold=threshold, n_bands=n_bands,
                                  band_bits=band_bits)
    return pairs.map_batches(
        lambda t: t.rename_columns(["vec_a", "vec_b", "sim"]),
        batch_format="pyarrow")


def ivf_index(sf_dir: str, n_queries: int = 5, n_centroids: int = 32,
              nprobe: int = 8, seed: int = 11, sample_size: int = 512,
              kmeans_iters: int = 8):
    """Driver-side IVF index build (deterministic): spherical k-means
    centroids from a fixed sample + per-query probe lists.  Split out of
    ``ivf_topk`` so the assignments/probes can be staged for the oracle."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _lowest_vec_rows(path, max(sample_size, n_queries))
    sample = np.array(head.column("embedding")[:sample_size].to_pylist(),
                      dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(seed))
    n_centroids = min(n_centroids, len(sample))
    cent = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(kmeans_iters):                    # spherical k-means
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_centroids):
            m = sample[assign == c]
            if len(m):
                v = m.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    qids = head.column("vec_id")[:n_queries].to_pylist()
    qmat = np.array(head.column("embedding")[:n_queries].to_pylist(),
                    dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    return qids, qmat, cent, probe


def ivf_assignments(sf_dir: str, cent: np.ndarray):
    """(vec_id, cluster) inverted-list assignment — the stateless
    vectorized map every IVF lookup relies on."""
    import ray
    import ray.data as rd

    cref = ray.put(cent)
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        ce = ray.get(cref)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        cid = np.argmax(vecs @ ce.T, axis=1)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "cluster": pa.array(cid, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
             n_centroids: int = 32, nprobe: int = 8, seed: int = 11,
             sample_size: int = 512, kmeans_iters: int = 8):
    """IVF approximate nearest neighbour — the index-structured scale path
    for similarity search (complements the LSH candidate path): spherical
    k-means centroids trained on a deterministic sample (driver-side, the
    sample is tiny), every vector assigned to its nearest centroid
    (vectorized map = the inverted lists), queries probe only the
    ``nprobe`` nearest lists.  Same output schema as ``knn_bruteforce``
    (query_id, vec_id, rank); recall vs the exact op is gated by
    ``test_ivf_recall``.  At scale the assignment is a stateless map and
    each probe touches nprobe/n_centroids of the corpus."""
    import ray
    import ray.data as rd
    import pandas as pd

    qids, qmat, cent, probe = ivf_index(
        sf_dir, n_queries=n_queries, n_centroids=n_centroids, nprobe=nprobe,
        seed=seed, sample_size=sample_size, kmeans_iters=kmeans_iters)
    ref = ray.put((qids, qmat, cent, probe))
    path = os.path.join(sf_dir, "embeddings.parquet")

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def probe_score(batch: pa.Table) -> pa.Table:
        ids_, qm, ce, pr = ray.get(ref)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        cid = np.argmax(vecs @ ce.T, axis=1)         # inverted-list id
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        sims = vecs @ qm.T                           # (n, nq)
        for qi, qid in enumerate(ids_):
            mask = np.isin(cid, pr[qi])              # probed lists only
            if not mask.any():
                continue
            col = sims[mask, qi]
            sub_vid = vid[mask]
            top = np.argsort(-col)[:k]               # per-batch partial
            out_q.extend([qid] * len(top))
            out_v.extend(sub_vid[top].tolist())
            out_s.extend(col[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partial = ds.map_batches(probe_score, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].tolist(), pa.int64()),
            "vec_id": pa.array(g["vec_id"].tolist(), pa.int64()),
            "rank": pa.array(range(1, len(g) + 1), pa.int64()),
        })

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def hnsw_shard_candidates(sf_dir: str, n_queries: int = 5,
                          num_shards: int = 4, m: int = 8,
                          ef_construction: int = 64, ef_search: int = 48):
    """Per-shard HNSW candidate pools (query_id, vec_id, score).

    The distributed-ANN shape the reference's HNSW store
    (``vector/mod.rs:54-178``, feature-gated to ``instant_distance``)
    needs at scale: vectors hash-shard by id, each shard builds its own
    navigable-small-world graph INSIDE the shard's task
    (``functions/hnsw.py`` — deterministic levels, so the graph is
    reproducible under any partitioning), every query fans out to all
    shards, and each shard returns its ef_search layer-0 pool.  Build
    cost is per-shard, so shard count is the memory/build knob; the
    low-cardinality shard groupby is one exchange of the vector table."""
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _lowest_vec_rows(path, n_queries)
    qids = head.column("vec_id").to_pylist()
    qmat = np.array(head.column("embedding").to_pylist(), dtype=np.float64)
    qref = ray.put((qids, qmat))
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def shard_col(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        return batch.append_column(
            "shard", pa.array(vid % num_shards, pa.int64()))

    def build_search(group: pa.Table) -> pa.Table:
        from ..functions.hnsw import HNSWIndex
        ids_, qm = ray.get(qref)
        keys = group.column("vec_id").to_pylist()
        vecs = np.array(group.column("embedding").to_pylist(),
                        dtype=np.float64)
        index = HNSWIndex(m=m, ef_construction=ef_construction).build(
            keys, vecs)
        oq, ov, osc = [], [], []
        for qid, q in zip(ids_, qm):
            for key, s in index.candidates(q, ef_search=ef_search):
                oq.append(qid)
                ov.append(key)
                osc.append(s)
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "score": pa.array(osc, pa.float64())})

    return (ds.map_batches(shard_col, batch_format="pyarrow")
              .groupby("shard")          # low-cardinality: num_shards keys
              .map_groups(lambda g: build_search(g.drop_columns(["shard"])),
                          batch_format="pyarrow"))


def hnsw_topk(sf_dir: str, n_queries: int = 5, k: int = 10, cand_ds=None,
              **kw):
    """HNSW ANN top-k: global exact rerank of the per-shard candidate
    pools.  Same output schema as ``knn_bruteforce`` / ``ivf_topk``
    (query_id, vec_id, rank); recall gated by ``test_hnsw_recall``."""
    import pandas as pd

    cand = (cand_ds if cand_ds is not None
            else hnsw_shard_candidates(sf_dir, n_queries=n_queries, **kw))

    def final_topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["score", "vec_id"],
                              ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].tolist(), pa.int64()),
            "vec_id": pa.array(g["vec_id"].tolist(), pa.int64()),
            "rank": pa.array(range(1, len(g) + 1), pa.int64()),
        })

    return cand.groupby("query_id").map_groups(final_topk,
                                               batch_format="pandas")


def lsh_planes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    """The fixed random-hyperplane matrix used by ``lsh_buckets`` —
    exposed so its rows can be staged for the DuckDB oracle
    (sign(list_dot_product) repacked in SQL)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(size=(n_planes, dim))


def lsh_buckets(sf_dir: str, n_planes: int = 12, seed: int = 7):
    """Random-hyperplane LSH bucket id per vector — the IVF/LSH scale path
    for ANN (bucket co-membership ⇒ candidate)."""
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    planes_cache = {}

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = lsh_planes(dim, n_planes, seed)
        bits = (vecs @ planes_cache[dim].T) > 0
        ids = np.packbits(bits, axis=1, bitorder="little")
        buckets = np.zeros(len(vecs), dtype=np.int64)
        for i in range(ids.shape[1]):
            buckets |= ids[:, i].astype(np.int64) << (8 * i)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(buckets, pa.int64())})

    return ds.map_batches(bucket, batch_format="pyarrow")


# ------------------------------------------------------- text analysis --

def language_id(sf_dir: str):
    """Accent-heuristic language id (reference ``text/mod.rs:525-545``)."""
    def lang(batch: pa.Table) -> pa.Table:
        preds = [detect_language(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_pred": pa.array(preds, pa.string())})
    return _docs(sf_dir).map_batches(lang, batch_format="pyarrow")


def token_stats(sf_dir: str):
    """Whitespace token count + char count per doc (vectorized Arrow)."""
    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        # count whitespace-separated tokens via split_pattern lengths
        toks = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), r"\s+"))
        empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0)
        toks = pc.if_else(empty, pa.scalar(0, pa.int32()), toks)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(toks, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })
    return _docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def quality_scores(sf_dir: str):
    """Per-doc quality features (length / punct / stopword ratios)."""
    def q(batch: pa.Table) -> pa.Table:
        rows = [quality_stats(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
            # raw IEEE f64 divisions — bit-identical to DuckDB's k*1.0/n,
            # so the oracle hash matches without rounding
            "punct_ratio": pa.array([r["punct_ratio"] for r in rows], pa.float64()),
            "stopword_ratio": pa.array([r["stopword_ratio"] for r in rows], pa.float64()),
        })
    return _docs(sf_dir).map_batches(q, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str):
    """md5 fingerprint per doc (oracle-exact vs DuckDB md5())."""
    def fp(batch: pa.Table) -> pa.Table:
        fps = [fingerprint(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})
    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")


def winnow_fingerprints(sf_dir: str, k: int = 12, w: int = 5, docs_ds=None):
    """MOSS-style winnowing fingerprints (rolling k-gram hash + rightmost-
    min window selection; ``functions.dedup.Winnower``): one row per
    distinct selected gram, columns (doc_id, pos, fp).

    Zero-staging DuckDB oracle — the whole kernel (normalize, polynomial
    hash mod 2^64, window selection) is re-derived in SQL straight from
    ``documents.text``.  Stateless vectorized map over the docs; at scale
    the output is ~2/(w+1) fingerprints per normalized char, emitted
    block-local with no shuffle."""
    from ..functions.dedup import Winnower

    wn = Winnower(k=k, w=w)

    def fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        out_id, out_pos, out_fp = [], [], []
        for d, t in zip(ids, batch.column("text").to_pylist()):
            p, h = wn.fingerprints(t)
            out_id.append(np.full(p.size, d, np.int64))
            out_pos.append(p)
            out_fp.append(h)
        cat = (lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64))
        return pa.table({"doc_id": pa.array(cat(out_id), pa.int64()),
                         "pos": pa.array(cat(out_pos), pa.int64()),
                         "fp": pa.array(cat(out_fp), pa.int64())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(fps, batch_format="pyarrow")


def winnow_dup_pairs(sf_dir: str, k: int = 12, w: int = 5,
                     min_shared: int = 4, max_docs_per_fp: int = 16,
                     docs_ds=None, hot_broadcast_limit: int = 1_000_000):
    """Near-dup candidate pairs from shared winnowing fingerprints: docs
    sharing ≥ ``min_shared`` distinct fingerprint values, with the shared
    count.  Fingerprints held by more than ``max_docs_per_fp`` docs are
    dropped as stop-grams (ubiquitous substrings are non-discriminative —
    and at web scale a hot fingerprint bucket is a quadratic pair bomb);
    the cap is part of the operator contract and the oracle replays it.

    Same two-PATH hot-key filter as ``minhash_lsh_candidates``: the hot
    set is ~|fps shared by 2..max_docs_per_fp docs| — unbounded in corpus
    dup mass — so it is collected + broadcast (vectorized ``pc.is_in`` on
    the single int64 key) only below ``hot_broadcast_limit``; above, the
    hot keys stay a Dataset and the filter is a bucketed semi-join
    (``stages/hashagg.bucketed_join``) — nothing ships to the driver.
    Path equality is gated by
    ``tests/test_winnow_paths.py::test_winnow_broadcast_and_join_paths_equal``."""
    import ray
    from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                  hash_grouped_aggregate)

    fps = hash_grouped_aggregate(
        winnow_fingerprints(sf_dir, k, w, docs_ds=docs_ds), ["doc_id", "fp"],
        grouped_arrow_agg(["doc_id", "fp"], [("pos", "count")],
                          rename=["doc_id", "fp", "_n"])
    ).select_columns(["doc_id", "fp"]).materialize()
    counts = hash_grouped_aggregate(
        fps, ["fp"],
        grouped_arrow_agg(["fp"], [("doc_id", "count")], rename=["fp", "nd"]))
    hot = counts.filter(expr=f"nd > 1 and nd <= {max_docs_per_fp}")
    # stream the hot set to the driver ONCE, aborting the collect the
    # moment it crosses the broadcast limit (the common ≤-limit case
    # costs exactly what the old single-path collect did — no extra
    # materialize barrier); above the limit, re-derive it lazily for the
    # bucketed semi-join (the giant-corpus path, where a recompute of
    # the counts exchange is the acceptable price of never holding the
    # set driver-side)
    chunks, n_hot, oversize = [], 0, False
    for b in hot.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            n_hot += b.num_rows
            if n_hot > hot_broadcast_limit:
                oversize = True
                break
            chunks.append(b.column("fp").combine_chunks().cast(pa.int64()))
    if oversize:
        hot_keys = hot.map_batches(lambda t: t.select(["fp"]),
                                   batch_format="pyarrow")
        hot_fps = bucketed_join(fps, hot_keys, ["fp"]).materialize()
    else:
        hot_ref = ray.put(pa.concat_arrays(chunks) if chunks
                          else pa.array([], pa.int64()))

        def only_hot(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("fp"),
                                         ray.get(hot_ref)))

        hot_fps = fps.map_batches(only_hot, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # whole BUCKET of colliding fps at once: sort, slice contiguous
        # fp-runs (≤ max_docs_per_fp each), emit i<j pairs per run — the
        # Python loop is per RUN, never a per-group Ray dispatch (at 1M
        # docs the native map_groups variant paid ~0.3 ms × millions of
        # colliding fps; measured 977 s -> this shape)
        df = t.to_pandas().sort_values(["fp", "doc_id"])
        fp = df["fp"].to_numpy()
        ids = df["doc_id"].to_numpy()
        starts = np.nonzero(np.concatenate([[True], fp[1:] != fp[:-1]]))[0]
        ends = np.concatenate([starts[1:], [fp.size]])
        a, b = [], []
        for s, e in zip(starts, ends):
            run = ids[s:e]
            for i in range(run.size):
                for j in range(i + 1, run.size):
                    a.append(run[i]); b.append(run[j])
        return pa.table({"doc_a": pa.array(np.array(a, np.int64)),
                         "doc_b": pa.array(np.array(b, np.int64))})

    cand = hash_grouped_aggregate(hot_fps, ["fp"], bucket_pairs)
    shared = hash_grouped_aggregate(
        cand, ["doc_a", "doc_b"],
        grouped_arrow_agg(["doc_a", "doc_b"], [("doc_a", "count")],
                          rename=["doc_a", "doc_b", "n_shared"]))
    return shared.filter(expr=f"n_shared >= {min_shared}")


def _lm_bigram_instances(sf_dir: str, docs_ds=None):
    """One row per token: (doc_id, lang, prev, cur) with a '<s>' BOS
    prefix per document (BOS never collides — real tokens are
    alnum-only).  ``lang`` rides along so scoring needs no join back to
    ``documents`` (injected test datasets without a lang column get
    'xx')."""

    def bigrams(batch: pa.Table) -> pa.Table:
        langs = (batch.column("lang").to_pylist() if "lang" in
                 batch.column_names else ["xx"] * len(batch))
        ids, lgs, prevs, curs = [], [], [], []
        for d, g, t in zip(batch.column("doc_id").to_pylist(), langs,
                           batch.column("text").to_pylist()):
            toks = lm_tokenize(t)
            if not toks:
                continue
            ids.extend([d] * len(toks))
            lgs.extend([g] * len(toks))
            prevs.append("<s>")
            prevs.extend(toks[:-1])
            curs.extend(toks)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "lang": pa.array(lgs, pa.string()),
                         "prev": pa.array(prevs, pa.string()),
                         "cur": pa.array(curs, pa.string())})

    docs = (docs_ds if docs_ds is not None else
            _docs(sf_dir, columns=("doc_id", "text", "lang")))
    return docs.map_batches(bigrams, batch_format="pyarrow")


def lm_perplexity(sf_dir: str, docs_ds=None):
    """CCNet-style LM quality score (Wenzek+ 2020, PAPERS.md) with a
    corpus-trained bigram model instead of the paper's pretrained KenLM
    (no model downloads): add-1-smoothed P(cur|prev) = (c(prev,cur)+1) /
    (c(prev)+V), per-document mean negative log-likelihood.

    Float discipline for the DuckDB oracle: per-token log-probs are
    FLOOR-quantized to integer micro-nats (``floor(ln(p)*1e6)``) so the
    per-doc sum is order-free integer arithmetic; the mean is integer
    floor-division to nano-nats.  ``ppl = round(exp(avg/1e9), 6)`` is the
    only trailing float (one op per doc; ``math.log``/``math.exp`` are
    libm, same as DuckDB's ``ln``/``exp`` — np.log's SIMD polynomial is
    deliberately avoided, computed once per DISTINCT (cb,cctx) pair).

    Scale shape: NO model table and NO joins.  Grouping token instances
    by ``prev`` makes both counts bucket-local facts (cctx = the prev
    group's size, cb = the within-group (prev,cur) count), so scoring is
    one instance shuffle emitting per-(doc,bucket) integer partials, plus
    a tiny pre-deduped vocabulary count and a small per-doc reduce.  Hub
    prev-tokens (stopwords) concentrate their bucket exactly as they
    would the build side of a join — salt hot prevs and pre-merge their
    cb/cctx if a real corpus makes one bucket dominate."""
    import pandas as pd
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    bg = _lm_bigram_instances(sf_dir, docs_ds).materialize()

    def distinct_cur(batch: pa.Table) -> pa.Table:
        return pa.table({"cur": pc.unique(batch.column("cur"))})

    n_vocab = hash_grouped_aggregate(
        bg.map_batches(distinct_cur, batch_format="pyarrow"), ["cur"],
        grouped_arrow_agg(["cur"], [("cur", "count")],
                          rename=["cur", "_c"])).count()

    def lp_partial(t: pa.Table) -> pa.Table:
        prev_c, _ = pd.factorize(t.column("prev").to_pandas())
        cur_c, _ = pd.factorize(t.column("cur").to_pandas())
        cctx = np.bincount(prev_c)  # every row of each prev is co-bucketed
        pair = prev_c.astype(np.int64) * (cur_c.max() + 1) + cur_c
        pu, pinv = np.unique(pair, return_inverse=True)
        cb = np.bincount(pinv)
        lpu = np.array(
            [math.floor(math.log((c + 1.0) / (x + n_vocab)) * 1e6)
             for c, x in zip(cb, cctx[(pu // (cur_c.max() + 1))])],
            dtype=np.int64)
        lpq = lpu[pinv]
        dl = pd.DataFrame({"doc_id": t.column("doc_id").to_numpy()})
        doc_c, doc_u = pd.factorize(dl["doc_id"])
        n_part = np.bincount(doc_c).astype(np.int64)
        s_part = np.zeros(len(doc_u), np.int64)
        np.add.at(s_part, doc_c, lpq)
        lang_first = (pd.Series(t.column("lang").to_pandas().values)
                      .groupby(doc_c).first())
        return pa.table({"doc_id": pa.array(doc_u, pa.int64()),
                         "lang": pa.array(lang_first.to_numpy(), pa.string()),
                         "n_part": pa.array(n_part, pa.int64()),
                         "s_part": pa.array(s_part, pa.int64())})

    partials = hash_grouped_aggregate(bg, ["prev"], lp_partial)
    per_doc = hash_grouped_aggregate(
        partials, ["doc_id"],
        grouped_arrow_agg(["doc_id", "lang"],
                          [("n_part", "sum"), ("s_part", "sum")],
                          rename=["doc_id", "lang", "n_tokens", "_sum"]))

    def fin(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy()
        nll = -batch.column("_sum").to_numpy()
        avg = (nll * 1000) // n  # positive ints: floor == trunc both sides
        ppl = np.array([round(math.exp(a / 1e9), 6) for a in avg], np.float64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
            "nll_micro": pa.array(nll.astype(np.int64), pa.int64()),
            "avg_nll_nano": pa.array(avg.astype(np.int64), pa.int64()),
            "ppl": pa.array(ppl, pa.float64())})

    return per_doc.map_batches(fin, batch_format="pyarrow")


def perplexity_buckets(sf_dir: str, docs_ds=None):
    """CCNet head/middle/tail corpus split: per-language thirds by the
    integer ``avg_nll_nano`` score (head = lowest perplexity).  Cutoffs
    are VALUE-based (smallest score whose per-language cumulative count
    ×3 ≥ n, resp. ≥ 2n) so ties share a bucket — no global row-number.

    Scale shape: the cutoff input is a (lang, score) histogram — at most
    one row per distinct score value per language, aggregated
    distributed; only the tiny per-language cumulative walk happens on
    the driver (CCNet itself computes cutoffs from percentiles of a
    sample; at 10⁹+ docs, coarsen the histogram by quantizing the score
    before the walk)."""
    import ray
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    scores = lm_perplexity(sf_dir, docs_ds).materialize()
    hist = hash_grouped_aggregate(
        scores, ["lang", "avg_nll_nano"],
        grouped_arrow_agg(["lang", "avg_nll_nano"], [("doc_id", "count")],
                          rename=["lang", "v", "c"])).to_pandas()
    cuts: dict[str, tuple[int, int]] = {}
    for lang, grp in hist.groupby("lang"):
        grp = grp.sort_values("v")
        cum = grp["c"].cumsum().to_numpy()
        n = int(cum[-1])
        vs = grp["v"].to_numpy()
        cut1 = int(vs[np.argmax(cum * 3 >= n)])
        cut2 = int(vs[np.argmax(cum * 3 >= 2 * n)])
        cuts[lang] = (cut1, cut2)
    cuts_ref = ray.put(cuts)

    def assign(batch: pa.Table) -> pa.Table:
        cd = ray.get(cuts_ref)
        langs = batch.column("lang").to_pylist()
        v = batch.column("avg_nll_nano").to_numpy()
        bucket = ["head" if x <= cd[g][0] else
                  "middle" if x <= cd[g][1] else "tail"
                  for g, x in zip(langs, v)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "avg_nll_nano": batch.column("avg_nll_nano"),
                         "bucket": pa.array(bucket, pa.string())})

    return scores.map_batches(assign, batch_format="pyarrow")


def dup_span_profile(sf_dir: str, k: int = 40, w: int = 10, docs_ds=None):
    """Duplicate-span profiling (the detection half of Lee+ 2021 exact
    substring dedup): per doc, how many normalized chars are covered by
    winnowing fingerprints SHARED with at least one other document —
    interval union of the [pos, pos+k) spans (islands merged when gaps
    close under k, so overlap and adjacency both collapse; total length
    is rule-independent for adjacency, documented).  Defaults k=40/w=10
    ≈ Lee+'s 50-token bar scaled to normalized chars: any shared
    substring ≥ 49 normalized chars is guaranteed caught; at k=12 the
    corpus's ubiquitous 2-word grams mark 99% of docs (measured), at
    k=40 exactly the planted near-dup family (47/500 at sf0.01).

    Output (all integers): doc_id, norm_len, n_dup_positions, dup_chars,
    heavy_dup (= norm_len > 0 AND dup_chars ≥ 20% of norm_len, as 5·dup ≥
    norm_len).

    Scale shape: fingerprint instances → distinct (doc,fp) → per-fp doc
    counts (hash agg), shared instances via ``bucketed_join`` on fp
    (never a shared-fp broadcast — at web scale the shared set is not
    small), then ONE grouped pass per doc over a union of tagged
    norm-length rows and shared-position rows (no left join, no NaN
    dtype drift)."""
    import pandas as pd
    from ..functions.dedup import Winnower
    from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                  hash_grouped_aggregate)

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    fps = winnow_fingerprints(sf_dir, k, w, docs_ds=docs).materialize()

    shared = None
    if fps.schema() is not None:  # every doc shorter than k => no fps
        dfp = hash_grouped_aggregate(
            fps, ["doc_id", "fp"],
            grouped_arrow_agg(["doc_id", "fp"], [("pos", "count")],
                              rename=["doc_id", "fp", "_n"])
        ).select_columns(["doc_id", "fp"])
        counts = hash_grouped_aggregate(
            dfp, ["fp"],
            grouped_arrow_agg(["fp"], [("doc_id", "count")],
                              rename=["fp", "nd"])).materialize()
        if counts.schema() is not None:  # empty agg yields no schema
            shared = (bucketed_join(fps, counts.filter(expr="nd > 1"),
                                    on=["fp"])
                      .map_batches(lambda t: pa.table(
                          {"doc_id": t.column("doc_id"),
                           "pos": t.column("pos"),
                           "nl": pa.array([0] * len(t), pa.int64())}),
                          batch_format="pyarrow"))

    wn = Winnower(k=k, w=w)

    def norm_rows(batch: pa.Table) -> pa.Table:
        nls = [wn.norm_len(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pos": pa.array([-1] * len(batch), pa.int64()),
                         "nl": pa.array(nls, pa.int64())})

    tagged = docs.map_batches(norm_rows, batch_format="pyarrow")
    if shared is not None:
        tagged = tagged.union(shared)

    def profile(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["doc_id", "pos"])
        out = {"doc_id": [], "norm_len": [], "n_dup_positions": [],
               "dup_chars": []}
        for did, grp in df.groupby("doc_id", sort=False):
            nl = int(grp["nl"].max())
            pos = grp.loc[grp["pos"] >= 0, "pos"].to_numpy()
            pos = np.unique(pos)
            if pos.size:
                brk = np.nonzero(np.diff(pos) > k)[0]
                starts = np.concatenate([[0], brk + 1])
                ends = np.concatenate([brk, [pos.size - 1]])
                dup = int((pos[ends] - pos[starts] + k).sum())
            else:
                dup = 0
            out["doc_id"].append(int(did))
            out["norm_len"].append(nl)
            out["n_dup_positions"].append(int(pos.size))
            out["dup_chars"].append(dup)
        res = pa.table({c: pa.array(v, pa.int64()) for c, v in out.items()})
        heavy = [n > 0 and 5 * d >= n
                 for n, d in zip(out["norm_len"], out["dup_chars"])]
        return res.append_column("heavy_dup", pa.array(heavy, pa.bool_()))

    return hash_grouped_aggregate(tagged, ["doc_id"], profile)


def remove_dup_spans(sf_dir: str, k: int = 40, w: int = 10, docs_ds=None):
    """Duplicate-span REMOVAL (the transform half of Lee+ 2021): excise
    from each doc's NORMALIZED text every [pos, pos+k) span whose winnow
    fingerprint also appears in a SMALLER doc_id — the first occurrence
    in doc-id order is the one kept, every later copy is cut.  Output:
    (doc_id, norm_len, removed_chars, cleaned_norm).

    Operating in normalized space keeps the oracle exact: DuckDB
    re-derives the fingerprints, the keeper rule (per-fp min doc_id),
    the interval union, and splices ``cleaned_norm`` back together with
    ordered ``string_agg``+``substr`` — byte-for-byte.  (Raw-text
    surgery needs the normalized→raw index map, which SQL can't replay;
    the normalized transform is the oracle-honest variant and the raw
    map is a mechanical extension inside the same kernel.)

    Scale shape mirrors ``dup_span_profile``: per-fp min via hash agg,
    cut positions via ``bucketed_join`` on fp, one per-doc grouped
    reduce over a tagged union carrying the normalized string."""
    from ..functions.dedup import Winnower
    from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                  hash_grouped_aggregate)

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    fps = winnow_fingerprints(sf_dir, k, w, docs_ds=docs).materialize()

    cuts = None
    if fps.schema() is not None:
        fpm = hash_grouped_aggregate(
            fps, ["fp"],
            grouped_arrow_agg(["fp"], [("doc_id", "min")],
                              rename=["fp", "mdoc"])).materialize()
        if fpm.schema() is not None:
            joined = bucketed_join(fps, fpm, on=["fp"])

            def later_only(t: pa.Table) -> pa.Table:
                m = pc.greater(t.column("doc_id"), t.column("mdoc"))
                kept = t.filter(m)
                return pa.table({"doc_id": kept.column("doc_id"),
                                 "pos": kept.column("pos"),
                                 "s": pa.array([""] * len(kept),
                                               pa.string())})

            cuts = joined.map_batches(later_only, batch_format="pyarrow")

    wn = Winnower(k=k, w=w)

    def norm_rows(batch: pa.Table) -> pa.Table:
        lut = wn.lut
        ss = []
        for t in batch.column("text").to_pylist():
            raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            mapped = lut[raw]
            ss.append(mapped[mapped != 255].tobytes().decode("ascii"))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pos": pa.array([-1] * len(batch), pa.int64()),
                         "s": pa.array(ss, pa.string())})

    tagged = docs.map_batches(norm_rows, batch_format="pyarrow")
    if cuts is not None:
        tagged = tagged.union(cuts)

    def splice(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = {"doc_id": [], "norm_len": [], "removed_chars": [],
               "cleaned_norm": []}
        for did, grp in df.groupby("doc_id", sort=True):
            s = grp.loc[grp["pos"] < 0, "s"].iloc[0]
            n = len(s)
            pos = np.unique(grp.loc[grp["pos"] >= 0, "pos"].to_numpy())
            if pos.size:
                diff = np.zeros(n + 1, np.int64)
                np.add.at(diff, pos, 1)
                np.add.at(diff, np.minimum(pos + k, n), -1)
                covered = np.cumsum(diff[:n]) > 0
                arr = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
                cleaned = arr[~covered].tobytes().decode("ascii")
                removed = int(covered.sum())
            else:
                cleaned, removed = s, 0
            out["doc_id"].append(int(did))
            out["norm_len"].append(n)
            out["removed_chars"].append(removed)
            out["cleaned_norm"].append(cleaned)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "norm_len": pa.array(out["norm_len"], pa.int64()),
            "removed_chars": pa.array(out["removed_chars"], pa.int64()),
            "cleaned_norm": pa.array(out["cleaned_norm"], pa.string())})

    return hash_grouped_aggregate(tagged, ["doc_id"], splice)


def dsir_scores(sf_dir: str, target_mod: int = 50, target_rem: int = 3,
                docs_ds=None):
    """DSIR-style importance scoring (Xie+ 2023, Data Selection with
    Importance Resampling): per-doc mean log importance ratio between a
    TARGET distribution and the RAW corpus over bigram features, both
    add-1-smoothed unigram-of-bigrams models.  The target split is
    deterministic (``doc_id % target_mod == target_rem``) so tests and
    the oracle replay it; ``selected`` = ratio > 0 (more target-like
    than raw).

    Same float discipline as ``lm_perplexity``: each log is
    FLOOR-quantized to integer micro-nats (libm ``math.log`` per
    DISTINCT count pair), sums/means are integer arithmetic.  Same
    no-join scale shape: grouping instances by feature makes BOTH counts
    bucket-local (c_raw = group size, c_target = target-flagged rows in
    the group); scalars N_target/N_raw/V are tiny driver values.

    Output: (doc_id, is_target, n_feats, ratio_micro, avg_ratio_nano,
    selected)."""
    import pandas as pd
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def feats(batch: pa.Table) -> pa.Table:
        ids, tgt, prevs, curs = [], [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = lm_tokenize(t)
            if len(toks) < 2:
                continue
            n = len(toks) - 1
            ids.extend([d] * n)
            tgt.extend([d % target_mod == target_rem] * n)
            prevs.extend(toks[:-1])
            curs.extend(toks[1:])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "is_t": pa.array(tgt, pa.bool_()),
                         "prev": pa.array(prevs, pa.string()),
                         "cur": pa.array(curs, pa.string())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    bg = docs.map_batches(feats, batch_format="pyarrow").materialize()
    if bg.schema() is None or bg.count() == 0:
        return bg  # no docs with >= 2 tokens: empty result

    def partial_tot(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_raw": pa.array([len(batch)], pa.int64()),
            "n_t": pa.array([int(pc.sum(pc.cast(
                batch.column("is_t"), pa.int64())).as_py() or 0)],
                pa.int64())})

    tot = bg.map_batches(partial_tot, batch_format="pyarrow").to_pandas()
    n_raw_tot, n_t_tot = int(tot["n_raw"].sum()), int(tot["n_t"].sum())
    v = hash_grouped_aggregate(
        bg, ["prev", "cur"],
        grouped_arrow_agg(["prev", "cur"], [("doc_id", "count")],
                          rename=["prev", "cur", "_c"])).count()

    def ratio_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        key = pd.factorize(df["prev"] + "\x1f" + df["cur"])[0]
        c_raw = np.bincount(key)
        c_t = np.bincount(key, weights=df["is_t"].to_numpy()
                          .astype(np.int64)).astype(np.int64)
        pairs = np.stack([c_t[key], c_raw[key]], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        lr = np.array(
            [math.floor(math.log((ct + 1.0) / (n_t_tot + v)) * 1e6)
             - math.floor(math.log((cr + 1.0) / (n_raw_tot + v)) * 1e6)
             for ct, cr in uniq], dtype=np.int64)
        lrq = lr[inv]
        doc_c, doc_u = pd.factorize(df["doc_id"])
        n_part = np.bincount(doc_c).astype(np.int64)
        s_part = np.zeros(len(doc_u), np.int64)
        np.add.at(s_part, doc_c, lrq)
        is_t_first = (pd.Series(df["is_t"].to_numpy())
                      .groupby(doc_c).first())
        return pa.table({
            "doc_id": pa.array(doc_u.astype(np.int64), pa.int64()),
            "is_t": pa.array(is_t_first.to_numpy(), pa.bool_()),
            "n_part": pa.array(n_part, pa.int64()),
            "s_part": pa.array(s_part, pa.int64())})

    partials = hash_grouped_aggregate(bg, ["prev", "cur"], ratio_partial)
    per_doc = hash_grouped_aggregate(
        partials, ["doc_id"],
        grouped_arrow_agg(["doc_id", "is_t"],
                          [("n_part", "sum"), ("s_part", "sum")],
                          rename=["doc_id", "is_target", "n_feats",
                                  "_sum"]))

    def fin(batch: pa.Table) -> pa.Table:
        n = batch.column("n_feats").to_numpy()
        s = batch.column("_sum").to_numpy()
        # floor division toward -inf for possibly-negative sums, exact in
        # SQL as well via a CASE (// truncates toward zero in numpy? no:
        # numpy // floors; DuckDB // floors for integers too on negatives
        # — but pin it with an explicit floor-div identity both sides)
        avg = np.floor_divide(s * 1000, n)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "is_target": batch.column("is_target"),
            "n_feats": pa.array(n.astype(np.int64), pa.int64()),
            "ratio_micro": pa.array(s.astype(np.int64), pa.int64()),
            "avg_ratio_nano": pa.array(avg.astype(np.int64), pa.int64()),
            "selected": pa.array((avg > 0).tolist(), pa.bool_())})

    return per_doc.map_batches(fin, batch_format="pyarrow")


def sequence_pack(sf_dir: str, seq_len: int = 2048, docs_ds=None):
    """GPT-style sequence-packing manifest: concatenate every doc's
    tokens in doc_id order and chop into fixed ``seq_len`` windows
    (docs straddle boundaries, as in standard LM pre-training packing).
    Output per doc: (doc_id, n_tokens, cum_before, start_seq, start_off,
    end_seq) — ``end_seq`` is the inclusive last occupied sequence, and
    ``start_seq - 1`` for an empty doc (documented sentinel, never NULL).

    Scale shape — a DISTRIBUTED PREFIX SCAN, no global sort: docs bucket
    by ``doc_id // B`` (contiguous id ranges), per-bucket token sums
    aggregate distributed, the driver walks the ~N/B bucket sums into
    base offsets (broadcast), and one grouped pass per bucket computes
    exact intra-bucket prefixes.  Two passes over (doc_id, n_tokens)
    rows, never over text twice."""
    import ray
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    B = 4096

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        nw = [len(t.split()) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "b": pa.array(ids // B, pa.int64()),
                         "n_tokens": pa.array(nw, pa.int64())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    st = docs.map_batches(stats, batch_format="pyarrow").materialize()

    bsums = hash_grouped_aggregate(
        st, ["b"],
        grouped_arrow_agg(["b"], [("n_tokens", "sum")],
                          rename=["b", "toks"])).to_pandas().sort_values("b")
    base = dict(zip(bsums["b"],
                    np.concatenate([[0], bsums["toks"].cumsum()
                                    .to_numpy()[:-1]]).astype(np.int64)))
    base_ref = ray.put(base)

    def pack(t: pa.Table) -> pa.Table:
        bd = ray.get(base_ref)
        df = t.to_pandas().sort_values("doc_id")
        out_parts = []
        for b, grp in df.groupby("b", sort=True):
            n = grp["n_tokens"].to_numpy(np.int64)
            cum = int(bd[b]) + np.concatenate([[0], n.cumsum()[:-1]])
            start_seq = cum // seq_len
            end_seq = np.where(n == 0, start_seq - 1,
                               (cum + np.maximum(n, 1) - 1) // seq_len)
            out_parts.append(pa.table({
                "doc_id": pa.array(grp["doc_id"].to_numpy(np.int64),
                                   pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "cum_before": pa.array(cum.astype(np.int64), pa.int64()),
                "start_seq": pa.array(start_seq.astype(np.int64),
                                      pa.int64()),
                "start_off": pa.array((cum % seq_len).astype(np.int64),
                                      pa.int64()),
                "end_seq": pa.array(end_seq.astype(np.int64), pa.int64())}))
        return pa.concat_tables(out_parts) if out_parts else pa.table(
            {c: pa.array([], pa.int64()) for c in
             ("doc_id", "n_tokens", "cum_before", "start_seq",
              "start_off", "end_seq")})

    return hash_grouped_aggregate(st, ["b"], pack)


def corpus_split(sf_dir: str, val_pct: int = 1, test_pct: int = 1,
                 docs_ds=None):
    """Deterministic stratified train/val/test split: assignment is a
    pure function of md5(doc_id) — stateless, reshard/rerun-invariant,
    and (unlike row-number splits) stable under corpus growth: adding
    docs never moves an existing doc between splits.  Value-based
    thresholds on the first 4 hex chars (65536 slots): val = slots
    [0, 655), test = [655, 1310) at the 1%/1% defaults.  Stratification
    is implicit — a uniform hash splits every `source`/language stratum
    at the same rates without grouping.  No shuffle: one vectorized map."""

    lo_val = (65536 * val_pct) // 100
    lo_test = lo_val + (65536 * test_pct) // 100

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        slots = [int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16)
                 for d in ids]
        split = ["val" if s < lo_val else
                 "test" if s < lo_test else "train" for s in slots]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "source": batch.column("source"),
                         "slot": pa.array(slots, pa.int64()),
                         "split": pa.array(split, pa.string())})

    docs = (docs_ds if docs_ds is not None else
            _docs(sf_dir, columns=("doc_id", "source")))
    return docs.map_batches(assign, batch_format="pyarrow")


def gopher_quality(sf_dir: str, min_words: int = 50,
                   max_words: int = 100_000, docs_ds=None):
    """Gopher document-quality filter (Rae+ 2021 §A1.1.2): per-doc integer
    counts (``functions.textstats.gopher_stats``) + the keep flag
    (``gopher_keep`` — every ratio rule is exact integer
    cross-multiplication, so the DuckDB oracle needs zero staging and no
    float discipline at all).  Stateless vectorized-enough map: one pass
    per doc over its words/lines, no shuffle, prunes to (doc_id, text) at
    the read."""
    from ..functions.textstats import gopher_keep, gopher_stats

    def stats(batch: pa.Table) -> pa.Table:
        rows = [gopher_stats(t) for t in batch.column("text").to_pylist()]
        cols = {"doc_id": batch.column("doc_id")}
        for k in ("n_words", "total_word_chars", "n_alpha_words", "n_sym",
                  "n_lines", "n_bullet_lines", "n_ellipsis_lines",
                  "n_stop_distinct"):
            cols[k] = pa.array([r[k] for r in rows], pa.int64())
        cols["keep"] = pa.array(
            [gopher_keep(r, min_words, max_words) for r in rows], pa.bool_())
        return pa.table(cols)

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(stats, batch_format="pyarrow")


def gopher_repetition(sf_dir: str, docs_ds=None):
    """Gopher repetition filters (Rae+ 2021 §A1.1.1): per-doc integer
    counts (``functions.textstats.gopher_repetition_stats`` — dup
    line/paragraph counts+chars, top-{2,3,4}-gram chars, duplicated
    {5..10}-gram chars) + the keep flag (every threshold an exact integer
    cross-multiplication).  Stateless map, no shuffle; the oracle
    re-derives all 22 counters in SQL with zero staging."""
    from ..functions.textstats import (gopher_repetition_keep,
                                       gopher_repetition_stats)

    def stats(batch: pa.Table) -> pa.Table:
        rows = [gopher_repetition_stats(t)
                for t in batch.column("text").to_pylist()]
        cols = {"doc_id": batch.column("doc_id")}
        if rows:
            keys = list(rows[0].keys())
        else:
            keys = (["n_lines", "dup_lines", "line_chars", "dup_line_chars",
                     "n_paras", "dup_paras", "para_chars", "dup_para_chars",
                     "word_chars"] +
                    [f"top{n}_chars" for n in (2, 3, 4)] +
                    [f"dup{n}_chars" for n in range(5, 11)])
        for k in keys:
            cols[k] = pa.array([r[k] for r in rows], pa.int64())
        cols["keep"] = pa.array([gopher_repetition_keep(r) for r in rows],
                                pa.bool_())
        return pa.table(cols)

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(stats, batch_format="pyarrow")


def decontaminate(sf_dir: str, n: int = 8, eval_mod: int = 100,
                  eval_rem: int = 7, docs_ds=None):
    """Benchmark decontamination (GPT-3 appx C / Llama style): flag
    training docs sharing any n-token shingle with the eval set.  The
    eval split is deterministic (``doc_id % eval_mod == eval_rem``) so
    tests and the oracle replay it; tokens via ``lm_tokenize``.

    Scale shape: the eval side is SMALL by definition → its distinct
    shingles are collected once and broadcast (``ray.put``), membership
    is a vectorized ``pc.is_in`` per batch — the textbook
    broadcast-small-side pattern, no shuffle at all on the corpus.  At
    real scale broadcast 64-bit shingle hashes instead of strings (same
    plumbing; strings here keep the oracle zero-staging).

    Output: (doc_id, is_eval, n_shingles, n_overlap, contaminated) with
    DISTINCT-shingle counting."""
    import ray

    def shingles(text: str) -> set[str]:
        toks = lm_tokenize(text)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)

    def eval_sh(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if d % eval_mod == eval_rem:
                out |= shingles(t)
        return pa.table({"sh": pa.array(sorted(out), pa.string())})

    ev_df = docs.map_batches(eval_sh, batch_format="pyarrow").to_pandas()
    ev = set(ev_df["sh"]) if "sh" in ev_df.columns else set()
    ev_ref = ray.put(ev)

    def mark(batch: pa.Table) -> pa.Table:
        evs = ray.get(ev_ref)
        ids = batch.column("doc_id").to_pylist()
        n_sh, n_ov = [], []
        for t in batch.column("text").to_pylist():
            sh = shingles(t)
            n_sh.append(len(sh))
            n_ov.append(len(sh & evs))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "is_eval": pa.array([d % eval_mod == eval_rem for d in ids],
                                pa.bool_()),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_overlap": pa.array(n_ov, pa.int64()),
            "contaminated": pa.array([v >= 1 for v in n_ov], pa.bool_())})

    return docs.map_batches(mark, batch_format="pyarrow")


def domain_mixture(sf_dir: str, budget: int = 800, docs_ds=None):
    """Reproducible per-domain corpus mixing to a token budget (the
    Pile/DoReMi-style sampling step): within each ``source``, order docs
    by ``md5(doc_id)`` (a deterministic permutation — reruns and
    resharding cannot change the sample) and select the greedy prefix:
    a doc is selected iff the cumulative token count BEFORE it is still
    under the budget.

    Scale shape — a distributed exact order-statistic, NOT a per-source
    sort: docs bucket by the first md5 byte (hex order ≡ md5 order);
    per-(source,bucket) token sums aggregate distributed, the driver
    walks 256 ints per source to find each boundary bucket, and ONLY the
    boundary buckets (1/256 of each source) are resolved exactly via a
    per-source grouped pass; everything else is decided by bucket id
    against a broadcast cutoff map.  Output covers ALL docs with a
    ``selected`` flag."""
    import ray
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [hashlib.md5(str(d).encode()).hexdigest() for d in ids]
        nw = [len(t.split()) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "source": batch.column("source"),
                         "h": pa.array(hs, pa.string()),
                         "b": pa.array([int(x[:2], 16) for x in hs],
                                       pa.int64()),
                         "n_words": pa.array(nw, pa.int64())})

    docs = (docs_ds if docs_ds is not None else
            _docs(sf_dir, columns=("doc_id", "text", "source")))
    st = docs.map_batches(stats, batch_format="pyarrow").materialize()

    per_bucket = hash_grouped_aggregate(
        st, ["source", "b"],
        grouped_arrow_agg(["source", "b"], [("n_words", "sum")],
                          rename=["source", "b", "toks"])).to_pandas()
    # driver walk: 256 ints per source -> boundary bucket + prefix tokens
    bound: dict[str, tuple[int, int]] = {}  # source -> (b*, tokens_before)
    for src, grp in per_bucket.groupby("source"):
        grp = grp.sort_values("b")
        cum = grp["toks"].cumsum().to_numpy()
        bs = grp["b"].to_numpy()
        hit = np.nonzero(cum >= budget)[0]
        if hit.size == 0:
            bound[src] = (256, 0)  # whole source under budget
        else:
            i = int(hit[0])
            bound[src] = (int(bs[i]), int(cum[i - 1]) if i else 0)
    bound_ref = ray.put(bound)

    def boundary_only(batch: pa.Table) -> pa.Table:
        bd = ray.get(bound_ref)
        keep = [bd[s][0] == b for s, b in
                zip(batch.column("source").to_pylist(),
                    batch.column("b").to_pylist())]
        return batch.filter(pa.array(keep, pa.bool_()))

    def resolve(t: pa.Table) -> pa.Table:
        bd = ray.get(bound_ref)
        df = t.to_pandas().sort_values(["source", "h", "doc_id"])
        out_id, out_sel = [], []
        for src, grp in df.groupby("source", sort=False):
            before = bd[src][1]
            for d, w in zip(grp["doc_id"], grp["n_words"]):
                out_id.append(int(d))
                out_sel.append(before < budget)
                before += int(w)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "sel": pa.array(out_sel, pa.bool_())})

    picks = hash_grouped_aggregate(
        st.map_batches(boundary_only, batch_format="pyarrow"),
        ["source"], resolve).to_pandas()
    picks_map = (dict(zip(picks["doc_id"], picks["sel"]))
                 if "doc_id" in picks.columns else {})
    picks_ref = ray.put(picks_map)

    def assign(batch: pa.Table) -> pa.Table:
        bd, pm = ray.get(bound_ref), ray.get(picks_ref)
        sel = []
        for d, s, b in zip(batch.column("doc_id").to_pylist(),
                           batch.column("source").to_pylist(),
                           batch.column("b").to_pylist()):
            sel.append(b < bd[s][0] if b != bd[s][0] else bool(pm[d]))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "source": batch.column("source"),
                         "n_words": batch.column("n_words"),
                         "selected": pa.array(sel, pa.bool_())})

    return st.map_batches(assign, batch_format="pyarrow")


def curation_report(sf_dir: str, docs_ds=None):
    """One-row corpus composition report: how much of the corpus survives
    the Gopher quality and repetition gates, in docs and words — the
    summary a curation run prints before committing to a filter config.

    ONE pass over the docs computes both filter verdicts per batch
    (kernels shared with ``gopher_quality``/``gopher_repetition``), emits
    per-block integer partials, and the driver sums a ≤ n_blocks-row
    table — no shuffle at any scale."""
    from ..functions.textstats import (gopher_keep,
                                       gopher_repetition_keep,
                                       gopher_repetition_stats,
                                       gopher_stats)

    def partial(batch: pa.Table) -> pa.Table:
        nd = nq = nr = nb = tw = kw = 0
        for t in batch.column("text").to_pylist():
            s = gopher_stats(t)
            q = gopher_keep(s)
            r = gopher_repetition_keep(gopher_repetition_stats(t))
            nd += 1
            nq += q
            nr += r
            nb += q and r
            tw += s["n_words"]
            kw += s["n_words"] if (q and r) else 0
        return pa.table({k: pa.array([v], pa.int64()) for k, v in
                         (("n_docs", nd), ("n_quality_pass", nq),
                          ("n_repetition_pass", nr), ("n_both_pass", nb),
                          ("total_words", tw), ("kept_words", kw))})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    parts = (docs.map_batches(partial, batch_format="pyarrow")
             .to_pandas())  # one row per block
    tot = parts.sum()
    return pa.table({c: pa.array([int(tot[c])], pa.int64())
                     for c in parts.columns})


def bm25_df(sf_dir: str):
    """Corpus document frequencies over the BM25 tokenizer
    (``retrieval/bm25.rs:70-113``): two-phase — per-batch distinct
    (term, doc) pairs, then a hash-bucketed vectorized count (vocab is a
    high-cardinality key; see ``stages/hashagg.py``)."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def term_docs(batch: pa.Table) -> pa.Table:
        terms, dids = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for t in set(bm25_tokenize(text)):
                terms.append(t); dids.append(did)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(dids, pa.int64())})

    return hash_grouped_aggregate(
        _docs(sf_dir).map_batches(term_docs, batch_format="pyarrow"),
        ["term"],
        grouped_arrow_agg(["term"], [("doc_id", "count")], rename=["term", "df"]))


def bm25_corpus_stats(sf_dir: str):
    """Global BM25 corpus stats: total docs, total tokens, avg doc length."""
    from ray.data.aggregate import Count, Mean, Sum

    def doclen(batch: pa.Table) -> pa.Table:
        lens = [len(bm25_tokenize(t)) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "doc_len": pa.array(lens, pa.int64())})

    agg = (_docs(sf_dir)
           .map_batches(doclen, batch_format="pyarrow")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("doc_len", alias_name="total_tokens"),
                      Mean("doc_len", alias_name="avg_doc_len")))
    # Dataset.aggregate returns a plain dict — shape it into a 1-row table
    return pa.table({
        "n_docs": pa.array([int(agg["n_docs"])], pa.int64()),
        "total_tokens": pa.array([int(agg["total_tokens"])], pa.int64()),
        "avg_doc_len": pa.array([float(agg["avg_doc_len"])], pa.float64()),
    })


def bm25_scores(sf_dir: str, query: str = "fast hash join", k1: float = 1.2, b: float = 0.75):
    """BM25 scoring of all documents against a fixed query — the full
    index-side semantics of ``retrieval/bm25.rs:70-153``: normalized TF
    (count/doc_len), Lucene IDF ln(N/df)+1, k1/b length normalization.
    Corpus stats (N, df per query term, avg doc length) are computed
    distributed, broadcast once, then scoring is a stateless map."""
    import ray

    q_terms = sorted(set(bm25_tokenize(query)))
    # prune the DF table to the query terms BEFORE it reaches the driver
    # (the vocabulary is corpus-sized; only |q_terms| rows are needed)
    qt = pa.array(q_terms, pa.string())

    def _keep_q(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("term"), value_set=qt))

    df_tbl = (bm25_df(sf_dir).map_batches(_keep_q, batch_format="pyarrow")
              .to_pandas())
    df_map = {t: int(v) for t, v in zip(df_tbl["term"], df_tbl["df"])}
    import pyarrow.parquet as _pq
    n_docs = _pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    # avg doc length over the bm25 tokenizer
    stats = bm25_corpus_stats(sf_dir)
    avg_len = float(stats.column("avg_doc_len")[0].as_py())
    ref = ray.put((q_terms, df_map))

    def score(batch: pa.Table) -> pa.Table:
        terms, dfm = ray.get(ref)
        out_id, out_score = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = bm25_tokenize(text)
            dl = len(toks)
            if dl == 0:
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            s = 0.0
            for t in terms:
                c = counts.get(t)
                if not c:
                    continue
                df_t = dfm.get(t, 0)
                if df_t == 0:
                    continue
                idf = math.log(n_docs / df_t) + 1.0
                tf = c / dl                       # normalized TF (bm25.rs:88-90)
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avg_len))
            if s > 0.0:
                out_id.append(did)
                out_score.append(round(s, 6))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_score, pa.float64())})

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def bm25_topk(sf_dir: str, query: str = "fast hash join", k: int = 10):
    """BM25 search: global top-k by score (``retrieval/bm25.rs:115-153``
    sort+truncate), deterministic tie-break by doc_id."""
    return (bm25_scores(sf_dir, query=query)
            .sort(["score", "doc_id"], descending=[True, False]).limit(k))


def sentence_stats(sf_dir: str):
    """Sentence count per doc (split on ``.!?``, non-empty trimmed
    segments; ``text/mod.rs:339-363``)."""
    from ..functions.textstats import sentence_count

    def stats(batch: pa.Table) -> pa.Table:
        ns = [sentence_count(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_sentences": pa.array(ns, pa.int64())})

    return _docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def tfidf_topk(sf_dir: str, top_k: int = 5):
    """Per-doc TF-IDF top-k keywords with a CORPUS DF table
    (``text/keyword_extraction.rs:37-58,143-153``): DF via hash-bucketed
    count, broadcast once (vocab is the small side), per-doc scoring
    vectorized in the map stage.  Output: (doc_id, rank, term)."""
    import ray
    from ..functions.keywords import tfidf_keywords, tfidf_tokenize
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def term_docs(batch: pa.Table) -> pa.Table:
        terms, dids = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for t in set(tfidf_tokenize(text)):
                terms.append(t); dids.append(did)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(dids, pa.int64())})

    df_tbl = hash_grouped_aggregate(
        _docs(sf_dir).map_batches(term_docs, batch_format="pyarrow"),
        ["term"],
        grouped_arrow_agg(["term"], [("doc_id", "count")], rename=["term", "df"])
    ).to_pandas()
    df_map = dict(zip(df_tbl["term"], df_tbl["df"].astype(int)))
    import pyarrow.parquet as _pq
    total_docs = _pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    ref = ray.put(df_map)

    def topk(batch: pa.Table) -> pa.Table:
        dfm = ray.get(ref)
        dids, ranks, terms = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for r, (term, _score) in enumerate(
                    tfidf_keywords(text, dfm, total_docs, top_k), 1):
                dids.append(did); ranks.append(r); terms.append(term)
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "rank": pa.array(ranks, pa.int64()),
                         "term": pa.array(terms, pa.string())})

    return _docs(sf_dir).map_batches(topk, batch_format="pyarrow")


def semantic_chunks(sf_dir: str):
    """Semantic chunking over documents — actor pool (the embedder's
    word-vector memo is per-actor state)."""
    import ray.data as rd
    from ..functions.semantic_chunking import SemanticChunker, SemanticChunkerConfig

    class SemanticChunkStage:
        def __init__(self):
            self.chunker = SemanticChunker(SemanticChunkerConfig(
                breakpoint_strategy="percentile", threshold_amount=80.0))

        def __call__(self, batch: pa.Table) -> pa.Table:
            dids, idxs, texts, counts = [], [], [], []
            for did, text in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist()):
                for i, c in enumerate(self.chunker.chunk(text or "")):
                    dids.append(did); idxs.append(i)
                    texts.append(c["text"]); counts.append(c["sentence_count"])
            return pa.table({"doc_id": pa.array(dids, pa.int64()),
                             "chunk_idx": pa.array(idxs, pa.int64()),
                             "text": pa.array(texts, pa.string()),
                             "sentence_count": pa.array(counts, pa.int64())})

    from ..stages.memo import memoized_stage
    fn = memoized_stage("semantic-chunks", SemanticChunkStage)
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


def enriched_chunks(sf_dir: str):
    """Chunk + enrich the documents table (chapter/keywords/summary)."""
    import ray.data as rd
    from ..config import KGConfig
    from ..stages.enrich import EnrichedChunkStage

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def to_str_ids(batch: pa.Table) -> pa.Table:
        ids = [f"doc{i}" for i in batch.column("doc_id").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "text": batch.column("text")})

    cfg = KGConfig(chunk_size=400, chunk_overlap=50)
    return (ds.map_batches(to_str_ids, batch_format="pyarrow")
              .map_batches(EnrichedChunkStage(cfg), batch_format="pyarrow"))


# ------------------------------------------------ relational patterns --

def orders_by_segment(sf_dir: str):
    """Broadcast hash join (orders ⋈ customer on custkey) + grouped
    aggregate — the canonical small-side join pattern (SURVEY §2.4 /
    ray_guide joins): the dimension table is ``ray.put`` once, looked up
    per batch with a vectorized pandas map; money sums in exact cents."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as _pq
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    cust = _pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_mktsegment"])
    seg_map = dict(zip(cust.column("c_custkey").to_pylist(),
                       cust.column("c_mktsegment").to_pylist()))
    ref = ray.put(seg_map)

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])

    def join(batch: pa.Table) -> pa.Table:
        import pandas as pd
        m = ray.get(ref)
        df = batch.to_pandas()
        seg = df["o_custkey"].map(m)
        cents = (df["o_totalprice"] * 100).round().astype("int64")
        return pa.table({"segment": pa.array(seg.astype(str), pa.string()),
                         "cents": pa.array(cents, pa.int64())})

    return hash_grouped_aggregate(
        orders.map_batches(join, batch_format="pyarrow"), ["segment"],
        grouped_arrow_agg(["segment"], [("cents", "count"), ("cents", "sum")],
                          rename=["segment", "n_orders", "total_cents"]))


def top_parts_by_size(sf_dir: str, k: int = 10):
    """Global top-k via sort+limit (SURVEY §2.7): k largest parts by
    (p_size desc, p_partkey asc) — deterministic tie-break."""
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name", "p_size"])
    return (ds.sort(["p_size", "p_partkey"], descending=[True, False]).limit(k))


def order_priority_revenue(sf_dir: str):
    """LARGE×LARGE partitioned hash join (lineitem ⋈ orders on orderkey,
    no broadcast — `stages/hashagg.bucketed_join`) + grouped aggregate:
    item count and exact-cent revenue per order priority."""
    import ray.data as rd
    from ..stages.hashagg import bucketed_join, grouped_arrow_agg, hash_grouped_aggregate

    lineitem = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_extendedprice"])

    def li_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("l_extendedprice"), 100)),
                        pa.int64())
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "cents": cents})

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")

    joined = bucketed_join(lineitem.map_batches(li_cents, batch_format="pyarrow"),
                           orders, on=["l_orderkey"])
    return hash_grouped_aggregate(
        joined, ["o_orderpriority"],
        grouped_arrow_agg(["o_orderpriority"], [("cents", "count"), ("cents", "sum")],
                          rename=["o_orderpriority", "n_items", "total_cents"]))


def purchases_asof_click(sf_dir: str):
    """AS-OF join (a custom operator Ray Data lacks): each purchase event
    joined to the user's most recent STRICTLY-PRIOR click.  Implemented as
    the documented composition (ray_guide joins): hash-partition by key,
    sort within partition, ``pd.merge_asof`` per bucket.  Oracle: DuckDB
    ``ASOF LEFT JOIN``."""
    import ray.data as rd
    import pandas as pd
    from ..stages.hashagg import hash_grouped_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "event_type", "ts"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("event_type"),
                                    value_set=pa.array(["purchase", "click"]))),
        batch_format="pyarrow")

    def asof_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        p = df[df["event_type"] == "purchase"].sort_values("ts")
        c = df[df["event_type"] == "click"].sort_values("ts")
        out = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            c[["user_id", "ts"]].rename(columns={"ts": "last_click_ts"}),
            left_on="ts", right_on="last_click_ts", by="user_id",
            direction="backward", allow_exact_matches=False)
        return pa.table({
            "event_id": pa.array(out["event_id"], pa.int64()),
            "user_id": pa.array(out["user_id"], pa.int64()),
            "purchase_ts": pa.array(out["ts"], pa.timestamp("us")),
            "last_click_ts": pa.array(out["last_click_ts"], pa.timestamp("us")),
        })

    return hash_grouped_aggregate(ds, ["user_id"], asof_bucket)


def shipped_within_window(sf_dir: str, days: int = 30):
    """Equi+range join: lineitems shipped within ``days`` of their order's
    date (partitioned hash join on orderkey, vectorized interval filter,
    grouped count by return flag) — the range-join pattern on top of
    ``bucketed_join``."""
    import ray.data as rd
    from ..stages.hashagg import bucketed_join, grouped_arrow_agg, hash_grouped_aggregate

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    joined = bucketed_join(li, orders, on=["l_orderkey"])
    window_us = days * 86400 * 1_000_000

    def in_window(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        odate = pc.cast(t.column("o_orderdate"), pa.int64())
        delta = pc.subtract(ship, odate)
        mask = pc.and_(pc.greater_equal(delta, 0), pc.less(delta, window_us))
        return t.filter(mask)

    return hash_grouped_aggregate(
        joined.map_batches(in_window, batch_format="pyarrow"),
        ["l_returnflag"],
        grouped_arrow_agg(["l_returnflag"], [("l_orderkey", "count")],
                          rename=["l_returnflag", "n_items"]))


def customers_semi_anti(sf_dir: str, anti: bool = False):
    """SEMI (default) / ANTI join via broadcast key set (ray_guide:
    "broadcast the key set (or a Bloom filter of it) and filter inside
    map_batches"): customers with (semi) / without (anti) orders.  The
    distinct order-custkey set is the small side."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as _pq

    keys = _pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_custkey"]).column("o_custkey") \
        .combine_chunks().unique()
    ref = ray.put(keys)           # broadcast the Arrow key array itself

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_name"])

    def fltr(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        mask = pc.is_in(batch.column("c_custkey"), value_set=k)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return cust.map_batches(fltr, batch_format="pyarrow")


def rrf_fuse(rankings: list[list], k: int = 60) -> list[tuple]:
    """Reciprocal Rank Fusion: score(d) = Σ 1/(k + rank_i(d)) over the
    rankers that returned d (``HOW_IT_WORKS.md:880-905``, k=60).
    Deterministic tie-break by id."""
    scores: dict = {}
    for ranking in rankings:
        for rank, doc in enumerate(ranking, 1):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (k + rank)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def hybrid_rankings(sf_dir: str, query: str = "fast hash join",
                    depth: int = 50) -> pa.Table:
    """The two ranker outputs as (ranker, rank, doc_id) rows — BM25 and
    the deterministic hash-embedding cosine ranking, top-``depth`` each.
    Both rankers run distributed; only the tiny top lists materialize."""
    import ray
    import numpy as np
    from ..functions.embedding import HashEmbedder

    def _topk_ranking(scores_ds) -> list:
        # distributed top-k: per-batch partial top-`depth` (global top-k
        # is contained in the union of per-batch top-ks), driver merges
        # blocks×depth rows — never the full N-doc score table
        def part(t: pa.Table) -> pa.Table:
            df = (t.select(["doc_id", "score"]).to_pandas()
                  .sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(depth))
            return pa.Table.from_pandas(df, preserve_index=False)

        parts = [b for b in scores_ds
                 .map_batches(part, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
        if not parts:
            return []
        merged = pa.concat_tables(parts).to_pandas()
        return (merged.sort_values(["score", "doc_id"],
                                   ascending=[False, True])
                ["doc_id"].head(depth).tolist())

    bm25_rank = _topk_ranking(bm25_scores(sf_dir, query=query))

    embedder = HashEmbedder(dim=64)
    qv = embedder.embed(query)
    qref = ray.put(qv)

    def cos(batch: pa.Table) -> pa.Table:
        e = HashEmbedder(dim=64)
        qvec = ray.get(qref)
        sims = [float(np.dot(e.embed(t), qvec))
                for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "score": pa.array(sims, pa.float64())})

    vec_rank = _topk_ranking(
        _docs(sf_dir).map_batches(cos, batch_format="pyarrow"))

    rows = [("bm25", r, d) for r, d in enumerate(bm25_rank, 1)] + \
           [("dense", r, d) for r, d in enumerate(vec_rank, 1)]
    return pa.table({
        "ranker": pa.array([x[0] for x in rows], pa.string()),
        "rank": pa.array([x[1] for x in rows], pa.int64()),
        "doc_id": pa.array([x[2] for x in rows], pa.int64()),
    })


def hybrid_search(sf_dir: str, query: str = "fast hash join", top_k: int = 10,
                  rankings=None):
    """Hybrid retrieval (bonus beyond the indexing scope): BM25 + dense
    rankings fused with RRF k=60.  ``rankings`` (optional) supplies the
    (ranker, rank, doc_id) rows — the query layer stages them so the
    fusion arithmetic is DuckDB-oracle-checked."""
    if rankings is None:
        rankings = hybrid_rankings(sf_dir, query)
    df = rankings.to_pandas()        # pa.Table and rd.Dataset both support it
    lists = [df[df["ranker"] == r].sort_values("rank")["doc_id"].tolist()
             for r in sorted(df["ranker"].unique())]
    fused = rrf_fuse(lists)[:top_k]
    return pa.table({
        "rank": pa.array(range(1, len(fused) + 1), pa.int64()),
        "doc_id": pa.array([d for d, _ in fused], pa.int64()),
        "rrf_score": pa.array([round(s, 8) for _, s in fused], pa.float64()),
    })


# ------------------------------------------------- windowed aggregates --

def temporal_edges(sf_dir: str):
    """Timestamped graph edges from the event stream: one edge per
    (user, event_type) with first_seen / last_seen / count — the
    table-shaped equivalent of the reference's temporal graph edges
    (``graph/temporal.rs``: timestamped edges with validity intervals)."""
    import ray.data as rd
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])
    return hash_grouped_aggregate(
        ds, ["user_id", "event_type"],
        grouped_arrow_agg(["user_id", "event_type"],
                          [("ts", "min"), ("ts", "max"), ("ts", "count")],
                          rename=["user_id", "event_type", "first_seen",
                                  "last_seen", "n_events"]))


def temporal_snapshot(sf_dir: str):
    """Temporal-graph snapshot at the corpus-midpoint timestamp
    (``graph/temporal.rs:174-186`` ``snapshot_at``: an edge is active when
    its validity interval [first_seen, last_seen] contains t;
    ``Snapshot::node_degree`` ``:101-107``).  Edge intervals come from the
    event stream (one edge per (user, event_type), as in
    ``temporal_edges``); output = per-node active-edge degree at t."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])
    rng = ds.aggregate(Min("ts", alias_name="lo"), Max("ts", alias_name="hi"))
    lo = pa.scalar(rng["lo"]).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    hi = pa.scalar(rng["hi"]).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    mid = (lo + hi) // 2

    intervals = hash_grouped_aggregate(
        ds, ["user_id", "event_type"],
        grouped_arrow_agg(["user_id", "event_type"],
                          [("ts", "min"), ("ts", "max")],
                          rename=["user_id", "event_type", "fs", "ls"]))

    def active(t: pa.Table) -> pa.Table:
        fs = pc.cast(t.column("fs"), pa.int64())
        ls = pc.cast(t.column("ls"), pa.int64())
        mask = pc.and_(pc.less_equal(fs, mid), pc.greater_equal(ls, mid))
        return t.filter(mask).select(["user_id", "event_type"])

    return hash_grouped_aggregate(
        intervals.map_batches(active, batch_format="pyarrow"), ["user_id"],
        grouped_arrow_agg(["user_id"], [("event_type", "count")],
                          rename=["user_id", "n_active"]))


# ------------------------------------------- temporal analytics ---------
# Port of the analytics half of ``graph/temporal.rs:271-407``
# (evolution_metrics, node_churn, top_growing_nodes, temporal_centrality)
# over the same event-derived interval-edge model as ``temporal_snapshot``:
# one edge per (user, event_type) valid over [first_seen, last_seen].
# Node ids are namespaced strings ('u<user_id>' / 'e:<event_type>') so the
# bipartite graph has the reference's generic string-node shape.


def _temporal_interval_edges(sf_dir: str, edges_ds=None):
    """(src, dst, fs, ls) interval edges.  ``edges_ds`` injects a pre-built
    edge table (the ported reference unit tests use the Rust test graph);
    otherwise edges derive from the events table exactly as
    ``temporal_snapshot`` does (timestamps as int64 epoch-µs)."""
    if edges_ds is not None:
        return edges_ds
    import ray.data as rd
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])
    iv = hash_grouped_aggregate(
        ds, ["user_id", "event_type"],
        grouped_arrow_agg(["user_id", "event_type"],
                          [("ts", "min"), ("ts", "max")],
                          rename=["user_id", "event_type", "fs", "ls"]))

    def nodes(t: pa.Table) -> pa.Table:
        uid = pc.binary_join_element_wise(
            pa.array(["u"] * t.num_rows, pa.string()),
            pc.cast(t.column("user_id"), pa.string()), "")
        et = pc.binary_join_element_wise(
            pa.array(["e:"] * t.num_rows, pa.string()),
            pc.cast(t.column("event_type"), pa.string()), "")
        return pa.table({
            "src": uid, "dst": et,
            "fs": pc.cast(pc.cast(t.column("fs"), pa.timestamp("us")),
                          pa.int64()),
            "ls": pc.cast(pc.cast(t.column("ls"), pa.timestamp("us")),
                          pa.int64())})

    return iv.map_batches(nodes, batch_format="pyarrow")


def _temporal_range(edges) -> tuple[int, int]:
    from ray.data.aggregate import Max, Min
    r = edges.aggregate(Min("fs", alias_name="lo"), Max("ls", alias_name="hi"))
    return int(r["lo"]), int(r["hi"])


def _temporal_windows(lo: int, hi: int, granularity: int | None):
    """``evolution_metrics``' window walk (``temporal.rs:273-291``):
    t = start; while t <= end: window [t, t+g]; t += g."""
    g = granularity if granularity else max(1, (hi - lo) // 8)
    starts = list(range(lo, hi + 1, g))
    return g, starts


def _window_expand(starts: list[int], g: int):
    """Edge batch → one row per (window, edge) the edge is active in
    (interval overlap ``temporal.rs:52-60``: fs ≤ w_end AND ls ≥ w_start)."""
    def fn(t: pa.Table) -> pa.Table:
        outs = []
        for w in starts:
            m = pc.and_(pc.less_equal(t.column("fs"), w + g),
                        pc.greater_equal(t.column("ls"), w))
            f = t.filter(m)
            outs.append(pa.table({
                "w": pa.array(np.full(f.num_rows, w, np.int64)),
                "src": f.column("src"), "dst": f.column("dst")}))
        return pa.concat_tables(outs)
    return fn


def _per_window_counts(edges, starts, g, wexp=None):
    """{window → (edge_count, node_count)} — distributed distinct-node
    counting (group (w, node) then count by w), tiny W-row collect.
    Pass a pre-materialized ``wexp`` to share one window expansion
    across consumers (``temporal_centrality`` reuses it for degrees)."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    if wexp is None:
        wexp = edges.map_batches(_window_expand(starts, g),
                                 batch_format="pyarrow").materialize()
    ec = hash_grouped_aggregate(
        wexp, ["w"], grouped_arrow_agg(["w"], [("src", "count")],
                                       rename=["w", "n"])).to_pandas()

    def nodes_of(col):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"w": t.column("w"), "node": t.column(col)})
        return fn

    nodes = wexp.map_batches(nodes_of("src"), batch_format="pyarrow").union(
        wexp.map_batches(nodes_of("dst"), batch_format="pyarrow"))
    distinct = hash_grouped_aggregate(
        nodes, ["w", "node"],
        grouped_arrow_agg(["w", "node"], [("node", "count")],
                          rename=["w", "node", "_c"]))
    nc = hash_grouped_aggregate(
        distinct, ["w"], grouped_arrow_agg(["w"], [("node", "count")],
                                           rename=["w", "n"])).to_pandas()
    e_of = dict(zip(ec["w"], ec["n"]))
    n_of = dict(zip(nc["w"], nc["n"]))
    return {w: (int(e_of.get(w, 0)), int(n_of.get(w, 0))) for w in starts}


def temporal_evolution(sf_dir: str, granularity: int | None = None,
                       edges_ds=None) -> pa.Table:
    """``evolution_metrics`` (``temporal.rs:271-291``): per window —
    node_count, edge_count, density (``:110-119``: E / (N·(N−1)/2),
    integer max_edges), avg_degree (``:294-307``: Σdegree/N = 2E/N).
    Default granularity (hi−lo)//8 over the corpus time range.  All
    ratios are int/int float64 divisions — bit-exact vs the SQL oracle."""
    edges = _temporal_interval_edges(sf_dir, edges_ds).materialize()
    lo, hi = _temporal_range(edges)
    g, starts = _temporal_windows(lo, hi, granularity)
    counts = _per_window_counts(edges, starts, g)
    dens, avg = [], []
    for w in starts:
        e, n = counts[w]
        max_edges = (n * (n - 1)) // 2
        dens.append(e / max_edges if n >= 2 else 0.0)
        avg.append(2.0 * e / n if n else 0.0)
    return pa.table({
        "window_start": pa.array(starts, pa.int64()),
        "node_count": pa.array([counts[w][1] for w in starts], pa.int64()),
        "edge_count": pa.array([counts[w][0] for w in starts], pa.int64()),
        "density": pa.array(dens, pa.float64()),
        "avg_degree": pa.array(avg, pa.float64())})


def temporal_node_churn(sf_dir: str, edges_ds=None):
    """``node_churn`` (``temporal.rs:310-345``): point snapshots at the
    range endpoints (edge active at t iff fs ≤ t ≤ ls, ``:42-49``);
    status = added (end only) / removed (start only) / stable (both)."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    edges = _temporal_interval_edges(sf_dir, edges_ds).materialize()
    lo, hi = _temporal_range(edges)

    def flags(col):
        def fn(t: pa.Table) -> pa.Table:
            a0 = pc.and_(pc.less_equal(t.column("fs"), lo),
                         pc.greater_equal(t.column("ls"), lo))
            a1 = pc.and_(pc.less_equal(t.column("fs"), hi),
                         pc.greater_equal(t.column("ls"), hi))
            keep = pc.or_(a0, a1)
            f = pa.table({"node": t.column(col),
                          "at_start": pc.cast(a0, pa.int64()),
                          "at_end": pc.cast(a1, pa.int64())})
            return f.filter(keep)
        return fn

    nodes = edges.map_batches(flags("src"), batch_format="pyarrow").union(
        edges.map_batches(flags("dst"), batch_format="pyarrow"))
    per_node = hash_grouped_aggregate(
        nodes, ["node"],
        grouped_arrow_agg(["node"], [("at_start", "max"), ("at_end", "max")],
                          rename=["node", "s", "e"]))

    def status(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        e = t.column("e").to_numpy(zero_copy_only=False)
        st = np.where(s & e, "stable", np.where(e, "added", "removed"))
        return pa.table({"node": t.column("node"),
                         "status": pa.array(st.tolist(), pa.string())})

    return per_node.map_batches(status, batch_format="pyarrow")


def temporal_top_growing(sf_dir: str, top_k: int = 10,
                         granularity: int | None = None, edges_ds=None):
    """``top_growing_nodes`` (``temporal.rs:348-372``): degree in the
    first window [lo, lo+g] vs the last [hi−g, hi]; nodes present in the
    END snapshot score (end−start)/start (or end when start degree 0);
    top_k by growth desc.  The reference's tie order is HashSet iteration
    (nondeterministic); we fix ties by node asc — documented delta."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    edges = _temporal_interval_edges(sf_dir, edges_ds).materialize()
    lo, hi = _temporal_range(edges)
    g = granularity if granularity else max(1, (hi - lo) // 8)

    def window_degrees(ws, we):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.less_equal(t.column("fs"), we),
                        pc.greater_equal(t.column("ls"), ws))
            f = t.filter(m)
            return pa.table({"node": pa.concat_arrays(
                [f.column("src").combine_chunks().cast(pa.string()),
                 f.column("dst").combine_chunks().cast(pa.string())])})
        return hash_grouped_aggregate(
            edges.map_batches(fn, batch_format="pyarrow"), ["node"],
            grouped_arrow_agg(["node"], [("node", "count")],
                              rename=["node", "deg"])).materialize()

    start_deg = window_degrees(lo, lo + g)
    end_deg = window_degrees(hi - g, hi)
    from ..stages.hashagg import bucketed_join
    joined = bucketed_join(
        end_deg.map_batches(lambda t: t.rename_columns(["node", "e"]),
                            batch_format="pyarrow"),
        start_deg.map_batches(lambda t: t.rename_columns(["node", "s"]),
                              batch_format="pyarrow"),
        ["node"], how="left").materialize()

    def growth(t: pa.Table) -> pa.Table:
        e = t.column("e").to_numpy(zero_copy_only=False).astype(np.float64)
        s = pc.fill_null(pc.cast(t.column("s"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        gr = np.where(s > 0, (e - s) / np.where(s > 0, s, 1.0), e)
        return pa.table({"node": t.column("node"),
                         "growth": pa.array(gr, pa.float64())})

    return (joined.map_batches(growth, batch_format="pyarrow")
            .sort([("growth"), ("node")], descending=[True, False])
            .limit(top_k))


def temporal_centrality(sf_dir: str, granularity: int | None = None,
                        edges_ds=None):
    """``temporal_centrality`` (``temporal.rs:375-395``) tabled over ALL
    active nodes: per window, centrality = degree / (node_count − 1)
    (0 when the window has ≤ 1 node).  The reference's single-node call
    is a lookup into this table; windows where a node is inactive
    (degree 0 rows) are omitted — documented delta."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    edges = _temporal_interval_edges(sf_dir, edges_ds).materialize()
    lo, hi = _temporal_range(edges)
    g, starts = _temporal_windows(lo, hi, granularity)
    wexp = edges.map_batches(_window_expand(starts, g),
                             batch_format="pyarrow").materialize()
    counts = _per_window_counts(edges, starts, g, wexp=wexp)
    nc_of = {w: counts[w][1] for w in starts}

    def nodes(t: pa.Table) -> pa.Table:
        return pa.table({
            "w": pa.concat_arrays([t.column("w").combine_chunks().cast(pa.int64())] * 2),
            "node": pa.concat_arrays(
                [t.column("src").combine_chunks().cast(pa.string()),
                 t.column("dst").combine_chunks().cast(pa.string())])})

    deg = hash_grouped_aggregate(
        wexp.map_batches(nodes, batch_format="pyarrow"), ["w", "node"],
        grouped_arrow_agg(["w", "node"], [("node", "count")],
                          rename=["w", "node", "deg"]))

    def cent(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        nc = np.array([nc_of[x] for x in w], np.float64)
        c = np.where(nc > 1, d / np.where(nc > 1, nc - 1.0, 1.0), 0.0)
        return pa.table({"node": t.column("node"),
                         "window_start": pa.array(w, pa.int64()),
                         "centrality": pa.array(c, pa.float64())})

    return deg.map_batches(cent, batch_format="pyarrow")


def session_windows(sf_dir: str, gap_minutes: int = 30):
    """Gap-based session windows per user: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.  Ray Data has no
    event-time sessions; the documented batch equivalent (ray_guide
    streaming section) is hash-partition by key + per-key ts-sorted
    sessionization — implemented vectorized (pandas diff/cumsum) inside
    hash buckets.  Session ids are per-user ordinals (1-based), so output
    is deterministic and oracle-checkable with window functions."""
    import ray.data as rd
    import pandas as pd
    from ..stages.hashagg import hash_grouped_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts"])
        new_sess = (df.groupby("user_id")["ts"].diff() > gap) | \
                   df.groupby("user_id")["ts"].diff().isna()
        df["session_id"] = new_sess.groupby(df["user_id"]).cumsum().astype("int64")
        out = (df.groupby(["user_id", "session_id"], as_index=False)
                 .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                      n_events=("ts", "count")))
        return pa.table({
            "user_id": pa.array(out["user_id"], pa.int64()),
            "session_id": pa.array(out["session_id"], pa.int64()),
            "session_start": pa.array(out["session_start"], pa.timestamp("us")),
            "session_end": pa.array(out["session_end"], pa.timestamp("us")),
            "n_events": pa.array(out["n_events"], pa.int64()),
        })

    return hash_grouped_aggregate(ds, ["user_id"], sessionize)


def sliding_window_counts(sf_dir: str, window_minutes: int = 60, slide_minutes: int = 15):
    """SLIDING windows (size 60 min, slide 15 min): each event lands in
    size/slide windows — emitted by a vectorized flat map (one row per
    covering window), counted with the hash-bucketed aggregate.  The
    batch-mode equivalent of a sliding event-time window."""
    import ray.data as rd
    import numpy as np
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type"])
    slide_us = slide_minutes * 60 * 1_000_000
    k = window_minutes // slide_minutes

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        base = ts // slide_us                          # last slide boundary ≤ ts
        offs = np.arange(k, dtype=np.int64)
        starts = ((base[:, None] - offs[None, :]) * slide_us).ravel()
        types = np.repeat(et, k)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "window_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
        })

    return hash_grouped_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["event_type", "window_start"],
        grouped_arrow_agg(["event_type", "window_start"],
                          [("window_start", "count")],
                          rename=["event_type", "window_start", "n_events"]))


def windowed_event_counts(sf_dir: str, window_minutes: int = 60):
    """Tumbling-window aggregate over the events stream: per (event_type,
    window) count + sum(value).  Ray Data has no event-time windows; the
    window key is computed per batch (epoch floor) and the aggregate is a
    plain groupby — the documented batch equivalent (ray_guide streaming
    section)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type", "value"])
    w_us = window_minutes * 60 * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())     # µs since epoch
        win = pc.multiply(pc.divide(ts, w_us), w_us)     # integer floor
        # exact integer cents: float sums are order-dependent in the last
        # ulp across engines, which breaks value-hash comparison; values
        # carry 2 decimals, so cents are exact in int64
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.table({
            "event_type": batch.column("event_type"),
            "window_start": pc.cast(win, pa.timestamp("us")),
            "cents": cents,
        })

    return (ds.map_batches(add_window, batch_format="pyarrow")
              .groupby(["event_type", "window_start"])
              .aggregate(Count(alias_name="n_events"),
                         Sum("cents", alias_name="sum_value_cents")))


# ------------------------------------------------------ web cleaning --

def c4_clean(sf_dir: str, min_kept_lines: int = 3, docs_ds=None):
    """C4 document cleaning (Raffel+ 2020 §2.2, `functions.webclean.
    c4_clean`): line filters (terminal punctuation, >= 5 words, no
    'javascript') + doc gates (curly brace, 'lorem ipsum', >= 3 surviving
    lines).  Stateless vectorized-enough map, no shuffle; all counters are
    integers and the cleaned text is a deterministic splice, so the
    DuckDB oracle re-derives everything from ``documents.text`` with zero
    staging."""
    from ..functions.webclean import c4_clean as _c4

    def stats(batch: pa.Table) -> pa.Table:
        rows = [_c4(t, min_kept_lines)
                for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_lines": pa.array([r["n_lines"] for r in rows], pa.int64()),
            "n_kept_lines": pa.array([r["n_kept_lines"] for r in rows],
                                     pa.int64()),
            "has_brace": pa.array([r["has_brace"] for r in rows], pa.bool_()),
            "has_lorem": pa.array([r["has_lorem"] for r in rows], pa.bool_()),
            "keep": pa.array([r["keep"] for r in rows], pa.bool_()),
            "cleaned": pa.array([r["cleaned"] for r in rows], pa.string()),
        })

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(stats, batch_format="pyarrow")


def pii_redact(sf_dir: str, docs_ds=None):
    """PII redaction (CCNet / BigScience-ROOTS style,
    `functions.webclean.pii_redact`): emails → IPv4 → phone numbers
    replaced by typed placeholder tokens in a pinned pass order, with
    per-type non-overlapping match counts.  Stateless map over compiled
    module-level regexes (RE2-compatible: no lookaround, no capture
    groups, no \\b), zero-staging oracle via regexp_replace/g."""
    from ..functions.webclean import pii_redact as _pii

    def redact(batch: pa.Table) -> pa.Table:
        rows = [_pii(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_email": pa.array([r["n_email"] for r in rows], pa.int64()),
            "n_ip": pa.array([r["n_ip"] for r in rows], pa.int64()),
            "n_phone": pa.array([r["n_phone"] for r in rows], pa.int64()),
            "redacted": pa.array([r["redacted"] for r in rows], pa.string()),
        })

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(redact, batch_format="pyarrow")


def line_dedup(sf_dir: str, broadcast_limit: int = 200_000, docs_ds=None,
               force_join: bool = False):
    """Corpus-wide exact line dedup (CCNet §4.1 / RefinedWeb line-wise
    correction): a non-blank line occurring more than once in the corpus
    keeps only its FIRST occurrence (min (doc_id, line_idx)); blank lines
    are document structure and never dedup.  Output per doc: line counts
    + the cleaned text (kept raw lines rejoined with \\n).

    Scale shape: explode lines → hash-grouped aggregate on the line text
    finds DUPLICATED lines only (count > 1, a tiny set on real corpora)
    with their first-occurrence key; unique lines never leave their
    bucket.  The dup table flows back as a broadcast dict under
    ``broadcast_limit`` rows, else via ``bucketed_join`` (two paths, one
    semantics — equality-gated; ``force_join`` pins the join path for
    tests).  Per-doc reassembly is one more hash-grouped pass.  The
    occurrence key packs doc_id * 2^20 + line_idx (bound: < 2^20 lines
    per doc, asserted at explode)."""
    import ray
    from ..functions.webclean import _STRIP
    from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                  hash_grouped_aggregate)

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids, li, ln, blank, pk = [], [], [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            lines = t.split("\n")
            assert len(lines) < (1 << 20), "line_dedup: >=2^20 lines/doc"
            for i, s in enumerate(lines, start=1):
                ids.append(d)
                li.append(i)
                ln.append(s)
                blank.append(len(s.strip(_STRIP)) == 0)
                pk.append(d * (1 << 20) + i)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "li": pa.array(li, pa.int64()),
                         "ln": pa.array(ln, pa.string()),
                         "blank": pa.array(blank, pa.bool_()),
                         "pk": pa.array(pk, pa.int64())})

    lines = docs.map_batches(explode, batch_format="pyarrow").materialize()

    def dup_firsts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("blank")))
        agg = t.group_by(["ln"]).aggregate([("pk", "min"), ("pk", "count")])
        agg = agg.rename_columns(["ln", "mpk", "n"])
        return agg.filter(pc.greater(agg.column("n"), 1)).drop_columns(["n"])

    dups = hash_grouped_aggregate(lines, ["ln"], dup_firsts).materialize()

    if not force_join and dups.count() <= broadcast_limit:
        dup_df = dups.to_pandas()
        dmap = ({} if dup_df.empty else
                dict(zip(dup_df["ln"], dup_df["mpk"].astype("int64"))))
        dref = ray.put(dmap)

        def mark(batch: pa.Table) -> pa.Table:
            dm = ray.get(dref)
            keep = [b or dm.get(s, p) == p
                    for s, b, p in zip(batch.column("ln").to_pylist(),
                                       batch.column("blank").to_pylist(),
                                       batch.column("pk").to_pylist())]
            return batch.append_column("keep", pa.array(keep, pa.bool_()))

        marked = lines.map_batches(mark, batch_format="pyarrow")
    else:
        joined = bucketed_join(lines, dups, on=["ln"], how="left")

        def flag(batch: pa.Table) -> pa.Table:
            mpk = batch.column("mpk").to_pylist()
            keep = [b or (m is None) or int(m) == p
                    for b, m, p in zip(batch.column("blank").to_pylist(),
                                       mpk, batch.column("pk").to_pylist())]
            return (batch.drop_columns(["mpk"])
                    .append_column("keep", pa.array(keep, pa.bool_())))

        marked = joined.map_batches(flag, batch_format="pyarrow")

    def rebuild(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["doc_id", "li"])
        out = {"doc_id": [], "n_lines": [], "n_dropped": [], "cleaned": []}
        for d, g in df.groupby("doc_id", sort=True):
            out["doc_id"].append(int(d))
            out["n_lines"].append(len(g))
            out["n_dropped"].append(int((~g["keep"]).sum()))
            out["cleaned"].append("\n".join(g.loc[g["keep"], "ln"]))
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "n_lines": pa.array(out["n_lines"], pa.int64()),
                         "n_dropped": pa.array(out["n_dropped"], pa.int64()),
                         "cleaned": pa.array(out["cleaned"], pa.string())})

    return hash_grouped_aggregate(
        marked.drop_columns(["blank", "pk"]), ["doc_id"], rebuild)


def vocab_topk(sf_dir: str, k: int = 1000, docs_ds=None):
    """Corpus vocabulary builder (the counting pass of BPE/unigram vocab
    training): global token frequencies via per-block Counter partials →
    hash-grouped sum → per-block local top-k → driver final top-k (≤ k ×
    n_blocks rows ever reach the driver).  Tokens via ``lm_tokenize``
    (the proven-parity split → lower → strip \\p{L}\\p{N} shape); rank
    ties break on token ASC.  Returns a pandas DataFrame (small by
    construction)."""
    from collections import Counter

    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(lm_tokenize(t))
        toks = sorted(c)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n": pa.array([c[t] for t in toks], pa.int64())})

    counts = hash_grouped_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"), ["token"],
        grouped_arrow_agg(["token"], [("n", "sum")], rename=["token", "n"]))

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = counts.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if "n" not in cand.columns:         # empty corpus
        cand = cand.reindex(columns=["token", "n"])
    fin = (cand.sort_values(["n", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    fin["rnk"] = (fin.index + 1).astype("int64")
    fin["n"] = fin["n"].astype("int64")
    return fin


# ------------------------------------------------------------------ BPE --

def bpe_word_freqs(sf_dir: str, docs_ds=None):
    """Distributed word-TYPE frequency table feeding BPE learning:
    per-block Counter partials → hash-grouped sum (the ``vocab_topk``
    counting shape — every block emits at most its distinct-token count,
    never its token stream)."""
    from collections import Counter

    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(lm_tokenize(t))
        toks = sorted(c)
        return pa.table({"word": pa.array(toks, pa.string()),
                         "n": pa.array([c[t] for t in toks], pa.int64())})

    return hash_grouped_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"), ["word"],
        grouped_arrow_agg(["word"], [("n", "sum")], rename=["word", "n"]))


def bpe_merges(sf_dir: str, n_merges: int = 20, max_types: int = 300,
               freqs_ds=None):
    """Learn BPE merges (Sennrich+ 2016) from the corpus.

    Scale shape: the distributed pass is the word-type counting
    (``bpe_word_freqs``); the merge loop itself runs driver-side over the
    top-``max_types`` types by (freq DESC, word ASC) — bounded BY
    CONTRACT, the standard practice for BPE learners (the type table a
    learner consumes is always frequency-capped; the corpus never ships).
    Returns a pandas DataFrame (rnk, lhs, rhs).  Oracle: the ENTIRE
    learning loop is re-derived in generated SQL straight from
    ``documents`` (one window-pass merge round per rank — zero staging).
    """
    import pandas as pd

    from ..functions.bpe import learn_bpe

    freqs = (freqs_ds if freqs_ds is not None
             else bpe_word_freqs(sf_dir)).to_pandas()
    freqs = freqs.sort_values(["n", "word"], ascending=[False, True]
                              ).head(max_types)
    merges = learn_bpe(list(zip(freqs["word"], freqs["n"].astype(int))),
                       n_merges)
    return pd.DataFrame({
        "rnk": pd.array(range(1, len(merges) + 1), dtype="int64"),
        "lhs": [m[0] for m in merges],
        "rhs": [m[1] for m in merges],
    })


def bpe_segments(sf_dir: str, n_merges: int = 20, max_types: int = 300,
                 merges=None, docs_ds=None):
    """Tokenize every DISTINCT corpus word with the learned merges:
    (word, pieces, n_pieces).  Stateless map over the distinct-word
    table; the merge list (≤ n_merges tuples) ships in the closure."""
    from ..functions.bpe import apply_bpe

    if merges is None:
        mdf = bpe_merges(sf_dir, n_merges=n_merges, max_types=max_types)
        merges = list(zip(mdf["lhs"], mdf["rhs"]))

    words = bpe_word_freqs(sf_dir, docs_ds=docs_ds)

    def seg(batch: pa.Table) -> pa.Table:
        ws = batch.column("word").to_pylist()
        pieces = [apply_bpe(w, merges) for w in ws]
        return pa.table({
            "word": batch.column("word"),
            "pieces": pa.array([" ".join(p) for p in pieces], pa.string()),
            "n_pieces": pa.array([len(p) for p in pieces], pa.int64()),
        })

    return words.map_batches(seg, batch_format="pyarrow")


def bpe_token_stats(sf_dir: str, n_merges: int = 20, max_types: int = 300,
                    merges=None, docs_ds=None):
    """Per-document BPE token counts: (doc_id, n_words, n_pieces).
    Stateless per-doc map — the apply step is memoized per worker process
    on the distinct words each batch sees (Zipf makes the hit rate high);
    no join, no shuffle at any scale."""
    from collections import Counter

    from ..functions.bpe import apply_bpe

    if merges is None:
        mdf = bpe_merges(sf_dir, n_merges=n_merges, max_types=max_types)
        merges = list(zip(mdf["lhs"], mdf["rhs"]))

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    memo: dict = {}

    def stats(batch: pa.Table) -> pa.Table:
        ids, nw, npc = [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            c = Counter(lm_tokenize(t))
            total = words = 0
            for w, k in c.items():
                ln = memo.get(w)
                if ln is None:
                    ln = memo[w] = len(apply_bpe(w, merges))
                total += k * ln
                words += k
            ids.append(did); nw.append(words); npc.append(total)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_words": pa.array(nw, pa.int64()),
                         "n_pieces": pa.array(npc, pa.int64())})

    return docs.map_batches(stats, batch_format="pyarrow")


# ------------------------------------------------------------ SemDeDup --

# Driver-side k-means bounds for auto-k (ADVICE r04): sample rows the
# driver will hold/cluster, and the largest auto-k before the build must
# move off-driver.  Both are loud bounds, not silent truncations.
_SEMDEDUP_SAMPLE_CAP = 262_144
_SEMDEDUP_MAX_DRIVER_K = 16_384


def semdedup(sf_dir: str, threshold: float = 0.35,
             n_centroids: int | None = None,
             seed: int = 11, sample_size: int = 512, kmeans_iters: int = 8,
             cent=None, target_cluster_size: int = 1024):
    """SemDeDup (Abbas+ 2023, PAPERS.md): semantic near-dedup via
    k-means blocking.  Spherical k-means centroids from a bounded
    driver-side sample (the ``ivf_index`` build), stateless cluster
    assignment (argmax cosine; ties → lowest cluster id, numpy argmax ==
    the oracle's row_number tie-break), then WITHIN each cluster
    pairwise cosine ≥ ``threshold`` defines duplicate groups (connected
    components over the pair graph); every group keeps the member LEAST
    similar to its centroid (the paper's keep-low-centroid-sim rule),
    ties on vec_id.  Output (vec_id, cluster, grp, keep); singletons
    keep themselves.

    Scale shape: the only exchange is the cluster groupby
    (``hash_grouped_aggregate``); the quadratic verify is bounded per
    cluster by the k choice — the paper's own device (k grows with the
    corpus so cluster size stays fixed).  ``n_centroids=None`` (the
    default) ENFORCES that device: k = max(8, n_vecs //
    target_cluster_size), so expected cluster size stays
    ~``target_cluster_size`` and the within-cluster O(m²) is bounded as
    the corpus grows (the k-means sample is widened to 8·k so every
    centroid can seed).  Pass an explicit k to reproduce a fixed-k run.
    Centroids broadcast once via ``ray.put``; union-find runs inside the
    bucket, never driver-side.

    Driver bound (same guard discipline as ``node2vec_embeddings``): the
    centroid build is driver-side k-means at O(k · sample · dim · iters),
    so the widened sample is CAPPED at ``_SEMDEDUP_SAMPLE_CAP`` rows
    (never ~n_vecs/128 — the uncapped widening re-grew driver footprint
    with the corpus) and auto-k REFUSES loudly past
    ``_SEMDEDUP_MAX_DRIVER_K`` centroids (~16M vecs at the default
    target) rather than silently burning driver hours; past that bound
    build centroids externally (e.g. distributed mini-batch k-means) and
    pass ``cent=``, or raise ``target_cluster_size``.
    """
    from ..stages.hashagg import hash_grouped_aggregate

    if cent is None:
        if n_centroids is None:
            import ray.data as rd
            n_vecs = rd.read_parquet(
                os.path.join(sf_dir, "embeddings.parquet"),
                columns=["vec_id"]).count()
            n_centroids = max(8, int(n_vecs) // target_cluster_size)
            if n_centroids > _SEMDEDUP_MAX_DRIVER_K:
                raise ValueError(
                    f"semdedup: auto n_centroids={n_centroids:,} exceeds "
                    f"the driver k-means bound {_SEMDEDUP_MAX_DRIVER_K:,} "
                    f"({n_vecs:,} vecs / target_cluster_size="
                    f"{target_cluster_size}); the centroid build is "
                    "driver-side at O(k*sample*dim*iters). Build centroids "
                    "externally and pass cent=, or raise "
                    "target_cluster_size.")
            sample_size = max(sample_size,
                              min(8 * n_centroids, _SEMDEDUP_SAMPLE_CAP))
        _, _, cent, _ = ivf_index(
            sf_dir, n_queries=1, n_centroids=n_centroids, nprobe=1,
            seed=seed, sample_size=sample_size, kmeans_iters=kmeans_iters)

    def per_bucket(t: pa.Table) -> pa.Table:
        out_v, out_c, out_g, out_k = [], [], [], []
        df_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        df_cl = np.asarray(t.column("cluster").to_pylist(), dtype=np.int64)
        df_cs = np.asarray(t.column("csim").to_pylist(), dtype=np.float64)
        embs = t.column("embedding").to_pylist()
        for cl in np.unique(df_cl):
            idx = np.where(df_cl == cl)[0]
            order = idx[np.argsort(df_ids[idx])]
            ids = df_ids[order]
            cs = df_cs[order]
            vecs = np.array([embs[i] for i in order], dtype=np.float64)
            vecs /= np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vecs @ vecs.T
            m = len(ids)
            parent = list(range(m))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            for a, b in zip(ii, jj):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            comp: dict[int, list[int]] = {}
            for i in range(m):
                comp.setdefault(find(i), []).append(i)
            for members in comp.values():
                grp = int(min(ids[i] for i in members))
                best = min(members, key=lambda i: (cs[i], ids[i]))
                for i in members:
                    out_v.append(int(ids[i]))
                    out_c.append(int(cl))
                    out_g.append(grp)
                    out_k.append(i == best)
        return pa.table({"vec_id": pa.array(out_v, pa.int64()),
                         "cluster": pa.array(out_c, pa.int64()),
                         "grp": pa.array(out_g, pa.int64()),
                         "keep": pa.array(out_k, pa.bool_())})

    assigned = semdedup_assignments(sf_dir, cent)
    return hash_grouped_aggregate(assigned, ["cluster"], per_bucket)


def semdedup_assignments(sf_dir: str, cent):
    """Stateless argmax-cosine cluster assignment for SemDeDup —
    (vec_id, cluster, csim, embedding).  Factored out so the oracle can
    STAGE the assignment (the ``ivf_topk`` device): the argmax and the
    centroid-similarity keep-ordering are float-op-order surfaces
    (numpy normalize-then-matmul vs DuckDB list_cosine_similarity), so
    DuckDB consumes Python's own assignment instead of re-deriving it."""
    import ray
    import ray.data as rd

    cref = ray.put(np.asarray(cent, dtype=np.float64))
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        ce = ray.get(cref)
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-12)
        sims = vecs @ ce.T
        cid = np.argmax(sims, axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(cid, pa.int64()),
            "csim": pa.array(sims[np.arange(len(cid)), cid], pa.float64()),
            "embedding": batch.column("embedding"),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------- model-based quality filter --

def quality_classifier(sf_dir: str, weights=None, docs_ds=None):
    """Model-based quality filtering (the GPT-3 appx-A / LLaMA curation
    step; fastText-style hashing-trick linear scorer, Joulin+ 2016):
    per-doc (doc_id, n_toks, logit_sum, keep) with keep = mean token
    weight > 0.  Stateless per-doc map, per-worker token→weight memo
    (Zipf makes the hit rate high); a trained model ships as a dense
    ``weights`` array broadcast via ``ray.put``, the default is the
    deterministic md5-derived stand-in (``functions/quality_clf``) so
    the oracle re-derives EVERYTHING from ``documents`` — zero staging.
    """
    import ray

    from ..functions.quality_clf import doc_logit

    wref = ray.put(weights) if weights is not None else None
    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    memo: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(wref) if wref is not None else None
        ids, nt, ls, keep = [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            n, s = doc_logit(lm_tokenize(t), weights=w, _memo=memo)
            ids.append(did); nt.append(n); ls.append(s); keep.append(s > 0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_toks": pa.array(nt, pa.int64()),
                         "logit_sum": pa.array(ls, pa.int64()),
                         "keep": pa.array(keep, pa.bool_())})

    return docs.map_batches(score, batch_format="pyarrow")


# --------------------------------------------- training-order shuffle --

def shuffle_shards(sf_dir: str, n_shards: int = 16, seed: str = "shuf",
                   docs_ds=None, bucket_hex: int = 4):
    """Deterministic global training-order shuffle + shard manifest:
    every doc gets its position in the md5-permuted corpus order and
    the output shard that position falls in (contiguous equal chop, the
    way a shuffled stream is cut into training files).  Hash order makes
    the shuffle seeded, rerun- and reshard-invariant — the GPT/LLaMA
    data-order reproducibility requirement — with no random state.

    Scale shape — a distributed exact order-statistic, NOT a global
    sort: docs bucket by the first ``bucket_hex`` md5 hex chars (hex
    order ≡ hash order; 4 chars = 65536 buckets keeps groups ~15M docs
    at 10^12), per-bucket counts roll up to the driver (one int per
    bucket), a prefix walk yields each bucket's base offset, and ranks
    WITHIN a bucket come from one grouped pass — so the only exchange is
    the bucket groupby, never an all-to-all sort of the corpus."""
    import ray
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest() for d in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "h": pa.array(hs, pa.string()),
                         "b": pa.array([int(x[:bucket_hex], 16) for x in hs],
                                       pa.int64()),
                         "one": pa.array([1] * len(ids), pa.int64())})

    docs = (docs_ds if docs_ds is not None else
            _docs(sf_dir, columns=("doc_id",)))
    st = docs.map_batches(stats, batch_format="pyarrow").materialize()

    counts = hash_grouped_aggregate(
        st, ["b"], grouped_arrow_agg(["b"], [("one", "sum")],
                                     rename=["b", "n"])).to_pandas()
    if counts.empty or "b" not in counts.columns:   # empty corpus
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
            "shard_pos": pa.array([], pa.int64())}))
    counts = counts.sort_values("b")
    total = int(counts["n"].sum())
    base = dict(zip(counts["b"].astype(int),
                    counts["n"].cumsum().shift(fill_value=0).astype(int)))
    base_ref = ray.put(base)

    def resolve(t: pa.Table) -> pa.Table:
        bmap = ray.get(base_ref)
        df = t.to_pandas().sort_values(["b", "h", "doc_id"])
        pos = (df["b"].map(bmap).to_numpy(dtype=np.int64)
               + df.groupby("b").cumcount().to_numpy(dtype=np.int64))
        shard = pos * n_shards // total
        start = (shard * total + n_shards - 1) // n_shards
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "shard": pa.array(shard, pa.int64()),
                         "shard_pos": pa.array(pos - start, pa.int64())})

    return hash_grouped_aggregate(st, ["b"], resolve)


# ------------------------------------------ domain mixture weights --

def mixture_weights(sf_dir: str, alpha: float = 0.3, docs_ds=None):
    """Temperature-scaled domain sampling weights (the mT5 / DoReMi-init
    corpus-mixing table, Xue+ 2021 §3.1): per ``source``, doc and token
    counts, unnormalized weight floor(1e6·tokens^alpha) and its integer
    micro-share of the corpus mix.  Per-block integer partials stream to
    a driver reduce of ≤ blocks × sources rows — no shuffle at any
    scale; pow via libm (math.pow ≡ DuckDB pow), quantized BEFORE the
    normalizing division so every downstream value is exact integer
    arithmetic."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        nw = [len(t.split()) for t in batch.column("text").to_pylist()]
        agg: dict[str, list[int]] = {}
        for s, w in zip(src, nw):
            a = agg.setdefault(s, [0, 0])
            a[0] += 1
            a[1] += w
        return pa.table({"source": pa.array(list(agg), pa.string()),
                         "n_docs": pa.array([v[0] for v in agg.values()],
                                            pa.int64()),
                         "n_toks": pa.array([v[1] for v in agg.values()],
                                            pa.int64())})

    docs = (docs_ds if docs_ds is not None else
            _docs(sf_dir, columns=("doc_id", "text", "source")))
    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "source" not in parts.columns:   # empty corpus
        parts = parts.reindex(columns=["source", "n_docs", "n_toks"])
    agg = (parts.groupby("source", as_index=False)[["n_docs", "n_toks"]]
           .sum().sort_values("source").reset_index(drop=True))
    agg["wq"] = [int(math.floor(1e6 * math.pow(float(t), alpha)))
                 for t in agg["n_toks"]]
    sum_wq = int(agg["wq"].sum()) or 1   # empty corpus: no shares
    agg["share_micro"] = [int(w) * 1_000_000 // sum_wq for w in agg["wq"]]
    return pd.DataFrame({"source": agg["source"],
                         "n_docs": agg["n_docs"].astype("int64"),
                         "n_toks": agg["n_toks"].astype("int64"),
                         "wq": agg["wq"].astype("int64"),
                         "share_micro": agg["share_micro"].astype("int64")})


# ------------------------------------- sharded training-corpus sink --

def write_corpus_shards(curated_dir: str, out_dir: str,
                        num_shards: int = 64, seed: str = "shuf",
                        input_token: str = "") -> dict:
    """Materialize a curated document table as a shuffled, sharded
    training corpus: ``shard=K/`` Parquet partitions in deterministic
    md5 training order (``shuffle_shards`` manifest joined back onto the
    rows), each partition with a lineage manifest.

    Resume is PARTITION-granular, the same contract as the KG graph sink
    (``pipelines/kg.py::write_graph``): a rerun with the same
    ``(num_shards, seed, input_token)`` returns immediately when the
    top-level manifest matches, otherwise rewrites ONLY the shards whose
    manifest is missing or stale — data always lands before its
    manifest, so a crashed write never looks complete."""
    import glob
    import shutil

    import ray.data as rd

    from ..state.manifests import (fingerprint_config, read_manifest,
                                   stage_complete, write_manifest)
    from ..stages.hashagg import bucketed_join

    def shard_fp(k: int) -> str:
        return fingerprint_config("corpus-shard", input_token, num_shards,
                                  seed, f"shard={k}")

    def count_rows(d: str) -> int:
        import pyarrow.dataset as pads
        files = glob.glob(os.path.join(d, "*.parquet"))
        return pads.dataset(files).count_rows() if files else 0

    top_fp = fingerprint_config("corpus", input_token, num_shards, seed)
    if stage_complete(out_dir, top_fp):
        return read_manifest(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    done = {k for k in range(num_shards)
            if stage_complete(os.path.join(out_dir, f"shard={k}"),
                              shard_fp(k))}
    if not done:
        for entry in glob.glob(os.path.join(out_dir, "shard=*")):
            shutil.rmtree(entry)       # config change / first run
    missing = [k for k in range(num_shards) if k not in done]
    for k in missing:                  # data without manifest = crash
        d = os.path.join(out_dir, f"shard={k}")
        if os.path.exists(d):
            shutil.rmtree(d)

    # only a genuinely file-less curated dir counts as an empty corpus;
    # a corrupt file / transient FS error must propagate, not silently
    # complete the job with rows=0 manifests
    if glob.glob(os.path.join(curated_dir, "**", "*.parquet"),
                 recursive=True):
        curated_ds = rd.read_parquet(curated_dir)
        n_curated = curated_ds.count()
    else:
        curated_ds = None
        n_curated = 0
    written = list(missing)
    if missing and n_curated == 0:
        for k in missing:      # an empty corpus still completes: every
            d = os.path.join(out_dir, f"shard={k}")   # shard is empty
            os.makedirs(d, exist_ok=True)
            write_manifest(d, "corpus_shard", shard_fp(k), rows=0)
        missing = []
    if missing:
        # the (doc_id → pos, shard) ORDER manifest is a pure function of
        # (curated ids, seed, num_shards) — stage it beside the shards so
        # a crash-redo reads it back (~2 s) instead of recomputing the
        # distributed order statistic (~31 s at 9.4M docs)
        order_dir = os.path.join(out_dir, "_order")
        order_fp = fingerprint_config("corpus-order", input_token,
                                      num_shards, seed)
        if stage_complete(order_dir, order_fp):
            manifest_ds = rd.read_parquet(glob.glob(
                os.path.join(order_dir, "*.parquet")))
        else:
            if os.path.exists(order_dir):      # write_parquet APPENDS
                shutil.rmtree(order_dir)
            os.makedirs(order_dir)
            shuffle_shards(
                "", n_shards=num_shards, seed=seed,
                docs_ds=curated_ds.map_batches(
                    lambda t: t.select(["doc_id"]),
                    batch_format="pyarrow")).write_parquet(order_dir)
            write_manifest(order_dir, "corpus_order", order_fp)
            manifest_ds = rd.read_parquet(glob.glob(
                os.path.join(order_dir, "*.parquet")))
        if done:
            # RESUME: prune BEFORE the text-carrying join — the manifest
            # is ids-only (cheap to filter), and broadcasting the missing
            # shards' doc_ids lets the curated table drop finished rows
            # MAP-SIDE, so the exchange moves only the redone shards'
            # text (measured: a 2-of-64-shard redo paid ~90% of the full
            # write through the unpruned join).  Above the broadcast
            # limit the old filter-after-join path still holds.
            import ray
            todo = pa.array(missing, pa.int64())
            man_missing = manifest_ds.map_batches(
                lambda t: t.filter(pc.is_in(t.column("shard"),
                                            value_set=todo)),
                batch_format="pyarrow").materialize()
            redo_broadcast_limit = 10_000_000
            if man_missing.count() <= redo_broadcast_limit:
                chunks = [b.column("doc_id").combine_chunks()
                          for b in man_missing.iter_batches(
                              batch_format="pyarrow") if b.num_rows]
                ids_ref = ray.put(pa.concat_arrays(
                    [c.cast(pa.int64()) for c in chunks]) if chunks
                    else pa.array([], pa.int64()))

                def only_missing(t: pa.Table) -> pa.Table:
                    return t.filter(pc.is_in(t.column("doc_id"),
                                             value_set=ray.get(ids_ref)))

                joined = bucketed_join(
                    curated_ds.map_batches(only_missing,
                                           batch_format="pyarrow"),
                    man_missing, ["doc_id"])
            else:
                joined = bucketed_join(curated_ds, manifest_ds,
                                       ["doc_id"]).map_batches(
                    lambda t: t.filter(pc.is_in(t.column("shard"),
                                                value_set=todo)),
                    batch_format="pyarrow")
        else:
            joined = bucketed_join(curated_ds, manifest_ds, ["doc_id"])
        joined.write_parquet(out_dir, partition_cols=["shard"])
        for k in missing:
            d = os.path.join(out_dir, f"shard={k}")
            os.makedirs(d, exist_ok=True)   # empty shards get a dir too
            write_manifest(d, "corpus_shard", shard_fp(k),
                           rows=count_rows(d))

    shard_rows = {k: read_manifest(
        os.path.join(out_dir, f"shard={k}"))["rows"]
        for k in range(num_shards)}
    return write_manifest(out_dir, "corpus", top_fp,
                          rows=sum(shard_rows.values()),
                          extra={"num_shards": num_shards,
                                 "resumed_shards": sorted(done),
                                 "written_shards": written,
                                 "shard_rows": {str(k): v for k, v
                                                in shard_rows.items()}})


# --------------------------------------------- HyperLogLog sketch --

HLL_M = 4096          # 2^12 buckets (first 3 md5 hex chars)
HLL_W = 40            # rank window: next 10 hex chars
_HLL_RMAX = HLL_W + 1


def _hll_bucket_rank(token: str) -> tuple[int, int]:
    hx = hashlib.md5(token.encode()).hexdigest()
    v = int(hx[3:13], 16)
    return int(hx[:3], 16), (_HLL_RMAX if v == 0
                             else _HLL_RMAX - v.bit_length())


def hll_registers(sf_dir: str, docs_ds=None):
    """Distributed HyperLogLog registers for the corpus's distinct-token
    cardinality (Flajolet+ 2007): bucket = 12 md5 bits, rank = leading
    zeros in the next 40 bits + 1, register = max rank per bucket.

    The sketch IS the scale story: each block reduces to ≤ 4096 integer
    rows regardless of input size, merge = max per bucket (associative,
    order-free), so a 100-TB distinct count moves only
    blocks × 4096 ints through the exchange.  Zero-staging oracle — the
    whole derivation (tokenize, md5 bucket/remainder, bit_length rank,
    max) replays in SQL (``bin()`` gives bit_length exactly)."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        regs: dict[int, int] = {}
        seen: set[str] = set()
        for t in batch.column("text").to_pylist():
            for tok in lm_tokenize(t):
                if tok in seen:
                    continue
                seen.add(tok)
                b, r = _hll_bucket_rank(tok)
                if regs.get(b, 0) < r:
                    regs[b] = r
        return pa.table({"bucket": pa.array(list(regs), pa.int64()),
                         "reg": pa.array(list(regs.values()), pa.int64())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    parts = docs.map_batches(partial, batch_format="pyarrow")
    return hash_grouped_aggregate(
        parts, ["bucket"],
        grouped_arrow_agg(["bucket"], [("reg", "max")],
                          rename=["bucket", "reg"]))


def hll_estimate(sf_dir: str, docs_ds=None):
    """One-row HLL cardinality estimate from the registers: the harmonic
    mean is summed as EXACT dyadic rationals (Σ 2^(RMAX−reg) over a
    common 2^RMAX denominator — pure BIGINT, order-free), then the
    float epilogue (alpha·m²·2^RMAX / S, linear-counting correction when
    est ≤ 2.5 m with empty buckets) runs in one pinned op order on both
    sides, so the floor-quantized micro value matches exactly."""
    import pandas as pd

    regs = hll_registers(sf_dir, docs_ds=docs_ds).to_pandas()
    if "reg" not in regs.columns:       # empty corpus: no registers
        regs = regs.reindex(columns=["bucket", "reg"])
    observed = len(regs)
    v_zero = HLL_M - observed
    s_scaled = (int(v_zero) << _HLL_RMAX) + int(
        sum(1 << (_HLL_RMAX - int(r)) for r in regs["reg"]))
    alpha = 0.7213 / (1 + 1.079 / 4096.0)
    est = alpha * 4096.0 * 4096.0 * float(1 << _HLL_RMAX) / float(s_scaled)
    if est <= 2.5 * 4096.0 and v_zero > 0:
        est = 4096.0 * math.log(4096.0 / float(v_zero))
    return pd.DataFrame({"m": [HLL_M],
                         "n_buckets_used": [observed],
                         "v_zero": [v_zero],
                         "est_x10k": [math.floor(est * 10000.0)]}).astype(
        "int64")


# --------------------------------------------- Count-Min sketch --

CMS_D = 4             # hash rows
CMS_W = 16384         # cells per row (first 4 md5 hex chars of "i:tok")


def _cms_cells(token: str) -> list[int]:
    return [int(hashlib.md5(f"{i}:{token}".encode()).hexdigest()[:4], 16)
            % CMS_W for i in range(CMS_D)]


def cms_registers(sf_dir: str, docs_ds=None):
    """Distributed Count-Min sketch over token INSTANCES (Cormode &
    Muthukrishnan 2005): d=4 independent md5 rows × 16384 cells; cell
    value = Σ counts of tokens hashing there.  Pure integer counters,
    merge = sum (associative) — each block reduces to ≤ 65536 rows no
    matter the input size, the same bounded-exchange shape as the HLL
    sketch.  Zero-staging oracle (md5 cell arithmetic replayed in SQL)."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        tok_n: Counter = Counter()
        for t in batch.column("text").to_pylist():
            tok_n.update(lm_tokenize(t))
        # hash once per DISTINCT token (Zipf: distinct << instances),
        # then add the token's block count to its 4 cells
        cnt: Counter = Counter()
        for tok, n in tok_n.items():
            for i, c in enumerate(_cms_cells(tok)):
                cnt[(i, c)] += n
        keys = list(cnt)
        return pa.table({"row": pa.array([k[0] for k in keys], pa.int64()),
                         "cell": pa.array([k[1] for k in keys], pa.int64()),
                         "cnt": pa.array([cnt[k] for k in keys],
                                         pa.int64())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return hash_grouped_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"), ["row", "cell"],
        grouped_arrow_agg(["row", "cell"], [("cnt", "sum")],
                          rename=["row", "cell", "cnt"]))


def cms_heavy_hitters(sf_dir: str, k: int = 20, docs_ds=None):
    """Heavy-hitter point queries against the sketch: for the exact
    global top-k tokens, the CMS estimate (min over the d row cells) next
    to the true count — ``overestimate = est − n_exact ≥ 0`` is the CMS
    guarantee, gated in tests and visible to the oracle.  The exact side
    reuses the vocab machinery (per-block partials, never a raw token
    shuffle); the sketch side is a driver lookup into the ≤65536-row
    register table."""
    import pandas as pd

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    docs = docs.materialize()
    top = vocab_topk(sf_dir, k=k, docs_ds=docs)
    if "token" not in top.columns or len(top) == 0:   # empty corpus
        return pd.DataFrame({"token": pd.array([], dtype="str"),
                             "n_exact": pd.array([], dtype="int64"),
                             "est": pd.array([], dtype="int64"),
                             "overestimate": pd.array([], dtype="int64")})
    regs = cms_registers(sf_dir, docs_ds=docs).to_pandas()
    lut = {(int(r), int(c)): int(n) for r, c, n in
           zip(regs["row"], regs["cell"], regs["cnt"])}
    toks = list(top["token"])
    est = [min(lut.get((i, c), 0)
               for i, c in enumerate(_cms_cells(t))) for t in toks]
    exact = [int(n) for n in top["n"]]
    return pd.DataFrame({
        "token": toks,
        "n_exact": pd.array(exact, dtype="int64"),
        "est": pd.array(est, dtype="int64"),
        "overestimate": pd.array([e - x for e, x in zip(est, exact)],
                                 dtype="int64")})


# ------------------------------------------------ Bloom filter --

BLOOM_M = 1 << 18     # bits
BLOOM_K = 7           # hash functions (md5 of "i:tok", first 5 hex)


def _bloom_bits(token: str) -> list[int]:
    return [int(hashlib.md5(f"{i}:{token}".encode()).hexdigest()[:5], 16)
            % BLOOM_M for i in range(BLOOM_K)]


def bloom_bits(sf_dir: str, docs_ds=None):
    """Distributed Bloom filter over the corpus's distinct tokens (the
    Dolma-style membership structure for cross-shard dedup): k=7 md5
    hashes into 2^18 bits; the filter is the DISTINCT set-bit table, so
    merge = set union (a distinct groupby) and each block contributes at
    most its distinct-bit count — the same bounded-exchange contract as
    the HLL/CMS sketches.  Zero-staging oracle."""
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        bits: set[int] = set()
        seen: set[str] = set()
        for t in batch.column("text").to_pylist():
            for tok in lm_tokenize(t):
                if tok in seen:
                    continue
                seen.add(tok)
                bits.update(_bloom_bits(tok))
        out = sorted(bits)
        return pa.table({"bit": pa.array(out, pa.int64()),
                         "one": pa.array([1] * len(out), pa.int64())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    dedup = hash_grouped_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"), ["bit"],
        grouped_arrow_agg(["bit"], [("one", "max")], rename=["bit", "one"]))
    return dedup.map_batches(lambda t: t.select(["bit"]),
                             batch_format="pyarrow")


def bloom_membership(sf_dir: str, docs_ds=None):
    """Membership probes against the Bloom filter: a deterministic probe
    set — every corpus token with md5 starting 'a' (present) plus its
    '__absent_<token>' twin (absent by construction) — each probed for
    all-bits-set.  The Bloom guarantee surfaces as columns: present
    tokens are ALWAYS hits (no false negatives); absent twins may rarely
    hit (false positives, rate ~(1−e^{−kn/m})^k)."""
    import pandas as pd

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    docs = docs.materialize()
    bits_df = bloom_bits(sf_dir, docs_ds=docs).to_pandas()
    bits = set(bits_df["bit"]) if "bit" in bits_df.columns else set()

    def probes(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch.column("text").to_pylist():
            for tok in lm_tokenize(t):
                if hashlib.md5(tok.encode()).hexdigest()[0] == "a":
                    out.add(tok)
        out_l = sorted(out)
        return pa.table({"token": pa.array(out_l, pa.string()),
                         "one": pa.array([1] * len(out_l), pa.int64())})

    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate
    probe_ds = hash_grouped_aggregate(
        docs.map_batches(probes, batch_format="pyarrow"), ["token"],
        grouped_arrow_agg(["token"], [("one", "max")],
                          rename=["token", "one"]))
    probe_df = probe_ds.to_pandas()
    toks = (sorted(probe_df["token"])
            if "token" in probe_df.columns else [])

    rows = []
    for tok in toks:
        for probe, present in ((tok, True), ("__absent_" + tok, False)):
            hit = all(b in bits for b in _bloom_bits(probe))
            rows.append((probe, present, hit))
    return pd.DataFrame({
        "probe": [r[0] for r in rows],
        "in_corpus": pd.array([r[1] for r in rows], dtype="boolean"),
        "hit": pd.array([r[2] for r in rows], dtype="boolean")}).astype(
        {"in_corpus": "bool", "hit": "bool"})


# ------------------------------------------ unicode + quantiles --

def unicode_audit(sf_dir: str, docs_ds=None):
    """Unicode normalization audit (the CC-pipeline NFC pass): per doc —
    char count, non-ASCII char count, whether NFC normalization changes
    the text, and the NFC length.  Stateless map; DuckDB
    ``nfc_normalize`` ≡ Python ``unicodedata.normalize('NFC', ·)`` and
    RE2's ``[[:ascii:]]`` ≡ ``ord(c) <= 127``, so the oracle is
    zero-staging."""
    import unicodedata

    def audit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        nch, nna, chg, nnf = [], [], [], []
        for t in batch.column("text").to_pylist():
            nfc = unicodedata.normalize("NFC", t)
            nch.append(len(t))
            nna.append(sum(1 for c in t if ord(c) > 127))
            chg.append(nfc != t)
            nnf.append(len(nfc))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": pa.array(nch, pa.int64()),
                         "n_nonascii": pa.array(nna, pa.int64()),
                         "nfc_changed": pa.array(chg, pa.bool_()),
                         "n_chars_nfc": pa.array(nnf, pa.int64())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    return docs.map_batches(audit, batch_format="pyarrow")


def length_quantiles(sf_dir: str, q_milles=(500, 900, 990, 999),
                     docs_ds=None):
    """Exact distributed word-count quantiles WITHOUT a global sort (the
    corpus-report percentile table): per-doc word counts collapse to a
    value histogram (one grouped exchange over ≤ distinct-length rows),
    the driver walks the cumulative histogram, and quantile q‰ = the
    smallest value whose cumulative count reaches ceil(n·q/1000) — the
    same order-statistic discipline as ``domain_mixture``."""
    import pandas as pd

    def words(batch: pa.Table) -> pa.Table:
        nw = [len(t.split()) for t in batch.column("text").to_pylist()]
        return pa.table({"v": pa.array(nw, pa.int64()),
                         "c": pa.array([1] * len(nw), pa.int64())})

    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate
    docs = docs_ds if docs_ds is not None else _docs(sf_dir)
    hist = hash_grouped_aggregate(
        docs.map_batches(words, batch_format="pyarrow"), ["v"],
        grouped_arrow_agg(["v"], [("c", "sum")], rename=["v", "c"]))
    df = hist.to_pandas()
    if "v" not in df.columns or len(df) == 0:   # empty corpus
        return pd.DataFrame({"q_mille": pd.array([], dtype="int64"),
                             "value": pd.array([], dtype="int64")})
    df = df.sort_values("v").reset_index(drop=True)
    cum = df["c"].cumsum()
    n = int(df["c"].sum())
    vals = []
    for q in q_milles:
        thr = (n * q + 999) // 1000
        vals.append(int(df["v"][cum >= thr].iloc[0]))
    return pd.DataFrame({"q_mille": pd.array(q_milles, dtype="int64"),
                         "value": pd.array(vals, dtype="int64")})


# ------------------------------------------------ corpus snapshot diff --

def corpus_diff(sf_dir: str, docs_ds=None, prev_ds=None):
    """Cross-snapshot corpus diff (the iterative-crawl bookkeeping step):
    per doc_id, status vs the previous snapshot — ``added`` (new id),
    ``removed`` (id gone), ``changed`` (md5(text) differs), ``same``.

    Shape: one bucketed full-outer join on doc_id comparing text
    fingerprints — no text ever crosses the exchange, only (id, md5).
    Without an explicit ``prev_ds`` the previous snapshot derives
    DETERMINISTICALLY from the current table (so the oracle re-derives
    it with zero staging): docs with ``doc_id % 11 == 3`` are treated as
    new (absent from prev), prev text for ``doc_id % 13 == 5`` was the
    first half of the current text (changed), and prev additionally
    held ids ``1_000_000_000 + doc_id`` for ``doc_id % 17 == 2``
    (removed since)."""
    from ..stages.hashagg import hash_grouped_aggregate

    docs = docs_ds if docs_ds is not None else _docs(sf_dir)

    def cur_fp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        fps = [hashlib.md5(t.encode()).hexdigest()
               for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string()),
                         "side": pa.array([0] * len(ids), pa.int64())})

    def prev_fp(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if d % 11 != 3:                      # existed before
                old = t[:len(t) // 2] if d % 13 == 5 else t
                ids.append(d)
                fps.append(hashlib.md5(old.encode()).hexdigest())
            if d % 17 == 2:                      # a doc removed since
                ids.append(1_000_000_000 + d)
                fps.append(hashlib.md5(f"gone:{d}".encode()).hexdigest())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string()),
                         "side": pa.array([1] * len(ids), pa.int64())})

    cur = docs.map_batches(cur_fp, batch_format="pyarrow")
    prev = (prev_ds.map_batches(
        lambda t: t.append_column("side", pa.array([1] * t.num_rows,
                                                   pa.int64())),
        batch_format="pyarrow") if prev_ds is not None
        else docs.map_batches(prev_fp, batch_format="pyarrow"))

    def verdict(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_id, out_st = [], []
        for d, g in df.groupby("doc_id"):
            sides = dict(zip(g["side"], g["fp"]))
            if 1 not in sides:
                st = "added"
            elif 0 not in sides:
                st = "removed"
            elif sides[0] == sides[1]:
                st = "same"
            else:
                st = "changed"
            out_id.append(int(d))
            out_st.append(st)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "status": pa.array(out_st, pa.string())})

    both = cur.union(prev)
    return hash_grouped_aggregate(both, ["doc_id"], verdict)


# ------------------------------------------------ deterministic sample --

def corpus_sample(sf_dir: str, rate_ppm: int = 100_000,
                  seed: str = "sample", docs_ds=None):
    """Reproducible uniform subsample (the debug-slice / ablation-corpus
    step): keep a doc iff the first 8 md5 hex digits of ``seed:doc_id``
    fall under ``rate_ppm`` parts-per-million of 2^32 — stateless,
    rerun/reshard-invariant, growth-stable (new docs never flip old
    verdicts), integer threshold arithmetic end to end."""
    thr = rate_ppm * (1 << 32) // 1_000_000

    def flag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = [int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8],
                    16) < thr for d in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sampled": pa.array(keep, pa.bool_())})

    docs = docs_ds if docs_ds is not None else _docs(sf_dir,
                                                     columns=("doc_id",))
    return docs.map_batches(flag, batch_format="pyarrow")


# -------------------------------------------- schema-on-read JSON --

def event_props_stats(sf_dir: str, key: str = "k", events_ds=None):
    """Schema-on-read extraction over the events table's JSON ``props``
    column (the semi-structured-log workload): parse per row, pull one
    integer key, aggregate per event_type — n_events, rows carrying the
    key, sum/min/max, and distinct value count.

    Scale shape: a two-level rollup — blocks group locally by
    (event_type, value) so the exchange carries only distinct pairs
    (bounded by the value domain, not the event count), then a tiny
    per-type reduce.  -1 sentinels for types where no row carries the
    key (house no-NULL-numerics rule)."""
    import json as _json

    import pandas as pd

    def parse(batch: pa.Table) -> pa.Table:
        ets, vals, ns = [], [], []
        agg: dict[tuple[str, int], int] = {}
        miss: dict[str, int] = {}
        for et, pr in zip(batch.column("event_type").to_pylist(),
                          batch.column("props").to_pylist()):
            v = None
            if pr:
                try:
                    v = _json.loads(pr).get(key)
                except ValueError:
                    v = None
            if isinstance(v, bool) or not isinstance(v, int):
                miss[et] = miss.get(et, 0) + 1
            else:
                agg[(et, v)] = agg.get((et, v), 0) + 1
        has = []
        for (et, v), n in agg.items():
            ets.append(et)
            vals.append(v)
            has.append(1)
            ns.append(n)
        # keyless rows: integer sentinel + has_key=0 — never a NULL in
        # the group key (a null v makes to_pandas yield float64 for
        # some batches and int64 for others, so the same (type, v)
        # value hash-buckets differently and a group splits)
        for et, n in miss.items():
            ets.append(et)
            vals.append(0)
            has.append(0)
            ns.append(n)
        return pa.table({"event_type": pa.array(ets, pa.string()),
                         "v": pa.array(vals, pa.int64()),
                         "has_key": pa.array(has, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    if events_ds is None:
        import ray.data as rd
        events_ds = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "props"])
    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate
    pairs = hash_grouped_aggregate(
        events_ds.map_batches(parse, batch_format="pyarrow"),
        ["event_type", "v", "has_key"],
        grouped_arrow_agg(["event_type", "v", "has_key"], [("n", "sum")],
                          rename=["event_type", "v", "has_key", "n"]))
    df = pairs.to_pandas()
    if "event_type" not in df.columns or len(df) == 0:
        return pd.DataFrame({c: pd.array([], dtype=t) for c, t in [
            ("event_type", "str"), ("n_events", "int64"),
            ("n_with_key", "int64"), ("sum_v", "int64"),
            ("min_v", "int64"), ("max_v", "int64"),
            ("n_distinct_v", "int64")]})
    rows = []
    for et, g in df.groupby("event_type"):
        has = g[g["has_key"] == 1]
        n_with = int(has["n"].sum())
        rows.append({
            "event_type": et,
            "n_events": int(g["n"].sum()),
            "n_with_key": n_with,
            "sum_v": int((has["v"] * has["n"]).sum()) if n_with else -1,
            "min_v": int(has["v"].min()) if n_with else -1,
            "max_v": int(has["v"].max()) if n_with else -1,
            "n_distinct_v": int(len(has)),
        })
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(
        drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


# ------------------------------------------------ event funnels --

def event_funnel(sf_dir: str, steps: list[str] | None = None,
                 events_ds=None):
    """Ordered funnel analysis over the events table (the product-log
    workload): per user, how deep the step sequence was completed —
    step k counts only when it occurs strictly AFTER the first match of
    step k-1 (first-touch semantics; event order = (ts, event_id), a
    total order).  ``steps`` defaults to the three alphabetically-first
    event types, derived identically by the oracle.

    Scale shape: one hash-bucketed exchange on user_id; each bucket
    sorts its own users' events and walks the subsequence in one pass —
    no window function over the global stream, no cross-user state."""
    import ray.data as rd

    from ..stages.hashagg import hash_grouped_aggregate

    if events_ds is None:
        events_ds = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type", "ts"])
    ev = events_ds.materialize()

    if steps is None:
        types = sorted(set(
            t for b in ev.map_batches(
                lambda t: pa.table({"event_type":
                                    pc.unique(t.column("event_type"))}),
                batch_format="pyarrow").iter_batches(batch_format="pyarrow")
            for t in b.column("event_type").to_pylist()))
        steps = types[:3]

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        out_u, out_r = [], []
        for uid, g in df.groupby("user_id", sort=False):
            depth = 0
            for et in g["event_type"]:
                if depth < len(steps) and et == steps[depth]:
                    depth += 1
            out_u.append(int(uid))
            out_r.append(depth)
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "reached": pa.array(out_r, pa.int64())})

    return hash_grouped_aggregate(ev, ["user_id"], per_bucket)


def event_retention(sf_dir: str, events_ds=None):
    """Cohort retention over the events table: users cohort by the DAY
    of their first event; a cohort is "retained at offset k" by every
    user with any activity exactly k days after their cohort day.
    Output: (cohort_day, day_offset, n_users) — the classic retention
    triangle.

    Scale shape: one user_id-bucketed exchange; each bucket computes its
    users' (cohort, offset) pairs locally and emits DISTINCT-per-user
    integer partials, so the second exchange carries at most
    users × active-days rows pre-collapsed to triangle cells per block."""
    import ray.data as rd

    from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate

    if events_ds is None:
        events_ds = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"])

    def per_user(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        cells: dict[tuple, int] = {}
        for _uid, g in df.groupby("user_id", sort=False):
            days = sorted(set(g["day"]))
            c0 = days[0]
            for d in days:
                key = (c0, (d - c0).days)
                cells[key] = cells.get(key, 0) + 1
        return pa.table({
            "cohort_day": pa.array([k[0] for k in cells], pa.timestamp("us")),
            "day_offset": pa.array([k[1] for k in cells], pa.int64()),
            "n": pa.array(list(cells.values()), pa.int64())})

    cells = hash_grouped_aggregate(events_ds, ["user_id"], per_user)
    return hash_grouped_aggregate(
        cells, ["cohort_day", "day_offset"],
        grouped_arrow_agg(["cohort_day", "day_offset"], [("n", "sum")],
                          rename=["cohort_day", "day_offset", "n_users"]))
