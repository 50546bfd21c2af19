"""Persisted winnowing-fingerprint index for INCREMENTAL corpus dedup —
the streaming-ingest story: when a new shard of documents arrives, flag
its near-dups against everything already ingested WITHOUT re-reading or
re-fingerprinting the old corpus, then append the shard's fingerprints.

Layout (one directory per ingested batch, manifest-guarded so re-running
a crashed or duplicate ingest is a no-op — same discipline as
``pipelines/kg.write_graph``):

    <base>/index.json                  — k/w config, ingested batch ids
    <base>/batch=<id>/*.parquet        — distinct (doc_id, fp) rows
    <base>/batch=<id>/_manifest.json

At 100 TB the index is the small side per shard only in aggregate — the
membership check is a ``bucketed_join`` on fp against the stored
Parquet (partition-prunable by fp hash if the store is later bucketed),
never an in-memory set of the whole corpus.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .manifests import (atomic_write_dir, fingerprint_config,
                        stage_complete, write_manifest)


class FingerprintIndex:
    def __init__(self, base_dir: str, k: int = 40, w: int = 10):
        self.base_dir = base_dir
        self.k, self.w = k, w
        os.makedirs(base_dir, exist_ok=True)
        self._meta_path = os.path.join(base_dir, "index.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            if (meta["k"], meta["w"]) != (k, w):
                raise ValueError(
                    f"index at {base_dir} was built with k={meta['k']} "
                    f"w={meta['w']}, got k={k} w={w}")
        else:
            self._write_meta([])

    def _write_meta(self, batches: list[str]):
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": self.k, "w": self.w, "batches": batches}, f)
        os.replace(tmp, self._meta_path)

    def batches(self) -> list[str]:
        with open(self._meta_path) as f:
            return json.load(f)["batches"]

    def _batch_dir(self, batch_id: str) -> str:
        return os.path.join(self.base_dir, f"batch={batch_id}")

    def _distinct_fps(self, docs_ds):
        """Distinct (doc_id, fp) rows — computed ENTIRELY map-side: a
        document's fingerprints are all produced by the one map call
        that winnows it, so per-doc ``np.unique`` inside that call is
        exact and the stage needs NO exchange.  (The original
        hash-grouped dedup shuffled one row per raw fingerprint —
        ~45 GB of transient sort spill at 10M docs/batch, measured.)"""
        from ..functions.dedup import Winnower

        if docs_ds.schema() is None or "text" not in docs_ds.schema().names:
            return None
        k, w = self.k, self.w

        class DistinctFps:
            def __init__(self):
                self.wn = Winnower(k=k, w=w)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                out_id, out_fp = [], []
                for d, t in zip(ids,
                                batch.column("text").to_pylist()):
                    _, h = self.wn.fingerprints(t)
                    u = np.unique(h)
                    out_id.append(np.full(u.size, d, np.int64))
                    out_fp.append(u)
                cat = (lambda xs: np.concatenate(xs)
                       if xs else np.empty(0, np.int64))
                return pa.table({"doc_id": pa.array(cat(out_id), pa.int64()),
                                 "fp": pa.array(cat(out_fp), pa.int64())})

        from ..stages.memo import memoized_stage
        fn = memoized_stage(("fpidx_distinct", k, w), DistinctFps)
        return docs_ds.map_batches(fn, batch_format="pyarrow")

    def ingest(self, batch_id: str, docs_ds, min_shared: int = 1):
        """Flag ``docs_ds`` against every batch ALREADY ingested, then
        append this batch's fingerprints (idempotent per batch_id).
        Returns a Dataset (doc_id, n_fps, n_shared_with_corpus,
        dup_of_corpus) covering every doc in the batch.

        Scale shape (reworked after the 10M-docs/batch ladder ENOSPC'd
        the original): the batch's fingerprints are persisted to their
        Parquet batch dir FIRST and read back from disk — no
        object-store copy of the ~40-row-per-doc fp table stays pinned —
        and every per-fp leg feeding the flags sort is pre-aggregated to
        per-(block, doc) partial counts inside ``map_batches`` (the
        per-block-combiner rule), so the union exchange carries ~|docs|
        rows instead of ~|fps|.  The final reduce sums partials, so the
        output is identical."""
        import ray.data as rd
        from ..stages.hashagg import (bucketed_join, grouped_arrow_agg,
                                      hash_grouped_aggregate)

        # --- persist this batch's fps, then read them from disk --------
        fpc = fingerprint_config("fp_index", batch_id, self.k, self.w)
        bdir = self._batch_dir(batch_id)
        lazy_fps = self._distinct_fps(docs_ds)
        new_fps = None
        if lazy_fps is not None:
            if not stage_complete(bdir, fpc):
                def write(tmp_dir):
                    lazy_fps.write_parquet(tmp_dir)
                    import glob as _g
                    if not _g.glob(os.path.join(tmp_dir, "*.parquet")):
                        import pyarrow.parquet as pq
                        pq.write_table(          # empty batch: keep the
                            pa.table({           # dir readable
                                "doc_id": pa.array([], pa.int64()),
                                "fp": pa.array([], pa.int64())}),
                            os.path.join(tmp_dir, "part-empty.parquet"))

                atomic_write_dir(write, bdir)
                rows = rd.read_parquet(bdir).count()   # metadata count
                write_manifest(bdir, "fp_index_batch", fpc, rows=rows)
            if batch_id not in self.batches():
                self._write_meta(self.batches() + [batch_id])
            new_fps = rd.read_parquet(bdir)

        def _doc_counts(tag: int):
            import pyarrow.compute as pc

            def f(t: pa.Table) -> pa.Table:
                g = t.group_by(["doc_id"]).aggregate([("fp", "count")])
                return pa.table({
                    "doc_id": g.column("doc_id"),
                    "n": pc.cast(g.column("fp_count"), pa.int64()),
                    "tag": pa.array([tag] * g.num_rows, pa.int64())})
            return f

        # --- membership against the already-ingested corpus ------------
        shared = None
        prior = [b for b in self.batches() if b != batch_id]
        if new_fps is not None and prior:
            import glob
            files = [f for b in prior for f in sorted(
                glob.glob(os.path.join(self._batch_dir(b), "*.parquet")))]
            old = rd.read_parquet(files)
            old_fp = hash_grouped_aggregate(
                old, ["fp"],
                grouped_arrow_agg(["fp"], [("doc_id", "count")],
                                  rename=["fp", "_nd"])
            ).select_columns(["fp"])
            hit = bucketed_join(new_fps, old_fp, on=["fp"])
            shared = hit.map_batches(_doc_counts(1), batch_format="pyarrow")

        def per_doc_fps(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("doc_id"),
                             "n": pa.array([0] * len(batch), pa.int64()),
                             "tag": pa.array([0] * len(batch), pa.int64())})

        base = docs_ds.map_batches(per_doc_fps, batch_format="pyarrow")
        cnt = None
        if new_fps is not None:
            cnt = new_fps.map_batches(_doc_counts(2),
                                      batch_format="pyarrow")
        tagged = base
        for extra in (cnt, shared):
            if extra is not None:
                tagged = tagged.union(extra)

        def reduce(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["sh"] = np.where(df["tag"] == 1, df["n"], 0)
            df["nf"] = np.where(df["tag"] == 2, df["n"], 0)
            agg = df.groupby("doc_id", sort=True)[["sh", "nf"]].sum()
            sh = agg["sh"].to_numpy(np.int64)
            return pa.table({
                "doc_id": pa.array(agg.index.to_numpy(np.int64), pa.int64()),
                "n_fps": pa.array(agg["nf"].to_numpy(np.int64), pa.int64()),
                "n_shared_with_corpus": pa.array(sh, pa.int64()),
                "dup_of_corpus": pa.array((sh >= min_shared).tolist(),
                                          pa.bool_())})

        flags = hash_grouped_aggregate(tagged, ["doc_id"], reduce)

        return flags
