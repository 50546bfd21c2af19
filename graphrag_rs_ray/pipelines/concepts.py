"""LazyGraphRAG-style concept graph construction (deterministic, no LLM).

Reference path: ``lightrag/concept_graph.rs`` — concepts per chunk, global
concept→chunk-set table, co-occurrence edges (shared-chunk count ≥ 2) with
Jaccard confidence.

Ray design: concepts of one chunk are batch-local, so PAIRS are emitted at
extraction time (no self-join shuffle, SURVEY §2.5 "avoids O(n²) pair
loop"); shared-chunk counts come from a hash-bucketed count over pair
rows; Jaccard denominators come from the (small) per-concept count table
broadcast via ``ray.put`` — the documented assumption is that the concept
VOCABULARY fits in driver memory (chunk sets never materialize anywhere).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.concepts import extract_concepts, jaccard_confidence
from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate


def concept_mention_rows(chunks_ds):
    """chunks → (concept, chunk_id) rows (one per concept per chunk)."""

    def extract(batch: pa.Table) -> pa.Table:
        concepts, chunk_ids = [], []
        for cid, text in zip(batch.column("chunk_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for c in extract_concepts(text):
                concepts.append(c)
                chunk_ids.append(cid)
        return pa.table({"concept": pa.array(concepts, pa.string()),
                         "chunk_id": pa.array(chunk_ids, pa.string())})

    return chunks_ds.map_batches(extract, batch_format="pyarrow")


def concept_pair_rows(chunks_ds):
    """chunks → (concept_a < concept_b, chunk_id) co-occurrence pair rows."""

    def extract(batch: pa.Table) -> pa.Table:
        a_out, b_out, cid_out = [], [], []
        for cid, text in zip(batch.column("chunk_id").to_pylist(),
                             batch.column("text").to_pylist()):
            cs = extract_concepts(text)   # sorted + deduped
            for i in range(len(cs)):
                for j in range(i + 1, len(cs)):
                    a_out.append(cs[i]); b_out.append(cs[j]); cid_out.append(cid)
        return pa.table({"concept_a": pa.array(a_out, pa.string()),
                         "concept_b": pa.array(b_out, pa.string()),
                         "chunk_id": pa.array(cid_out, pa.string())})

    return chunks_ds.map_batches(extract, batch_format="pyarrow")


def concept_table(chunks_ds):
    """concept → n_chunks (hash-bucketed count)."""
    return hash_grouped_aggregate(
        concept_mention_rows(chunks_ds), ["concept"],
        grouped_arrow_agg(["concept"], [("chunk_id", "count")],
                          rename=["concept", "n_chunks"]))


def concept_combined(chunks_ds):
    """ONE extraction pass emitting both mention rows (kind="m") and
    within-chunk pair rows (kind="p") — concept regex extraction dominates
    the cost, so running it once and splitting the stream halves the
    pipeline (same trick as ``stages/kg_extract.py``)."""

    def extract(batch: pa.Table) -> pa.Table:
        kind, a_out, b_out, cid_out = [], [], [], []
        for cid, text in zip(batch.column("chunk_id").to_pylist(),
                             batch.column("text").to_pylist()):
            cs = extract_concepts(text)
            for c in cs:
                kind.append("m"); a_out.append(c); b_out.append(None); cid_out.append(cid)
            for i in range(len(cs)):
                for j in range(i + 1, len(cs)):
                    kind.append("p"); a_out.append(cs[i]); b_out.append(cs[j]); cid_out.append(cid)
        return pa.table({"kind": pa.array(kind, pa.string()),
                         "concept_a": pa.array(a_out, pa.string()),
                         "concept_b": pa.array(b_out, pa.string()),
                         "chunk_id": pa.array(cid_out, pa.string())})

    return chunks_ds.map_batches(extract, batch_format="pyarrow")


def concept_edges(chunks_ds, co_occurrence_threshold: int = 2):
    """Edges with shared-chunk count ≥ threshold and Jaccard confidence
    (``concept_graph.rs:389-448``).

    The pair exchange is DICTIONARY-ENCODED: the concept vocabulary (small
    side) is broadcast as string→int32, pair rows ship two int32s instead
    of two strings (~20× smaller shuffle), and edge rows decode back after
    aggregation — the standard encoded-exchange trick for wide string
    keys."""
    import numpy as np
    import ray
    import pyarrow.compute as _pc

    combined = concept_combined(chunks_ds).materialize()

    mention_rows = combined.map_batches(
        lambda t: t.filter(_pc.equal(t.column("kind"), "m"))
                   .select(["concept_a", "chunk_id"]).rename_columns(["concept", "chunk_id"]),
        batch_format="pyarrow")
    counts_df = hash_grouped_aggregate(
        mention_rows, ["concept"],
        grouped_arrow_agg(["concept"], [("chunk_id", "count")],
                          rename=["concept", "n_chunks"])).to_pandas()
    counts_df = counts_df.sort_values("concept").reset_index(drop=True)
    vocab = counts_df["concept"].tolist()
    n_chunks = counts_df["n_chunks"].astype(int).to_numpy()
    vocab_ref = ray.put(({c: i for i, c in enumerate(vocab)}, vocab, n_chunks))

    def encode_pairs(t: pa.Table) -> pa.Table:
        cid_map, _, _ = ray.get(vocab_ref)
        t = t.filter(_pc.equal(t.column("kind"), "p"))
        a = np.fromiter((cid_map[x] for x in t.column("concept_a").to_pylist()),
                        dtype=np.int32, count=t.num_rows)
        b = np.fromiter((cid_map[x] for x in t.column("concept_b").to_pylist()),
                        dtype=np.int32, count=t.num_rows)
        return pa.table({"ia": pa.array(a), "ib": pa.array(b)})

    pair_counts = hash_grouped_aggregate(
        combined.map_batches(encode_pairs, batch_format="pyarrow"),
        ["ia", "ib"],
        grouped_arrow_agg(["ia", "ib"], [("ia", "count")],
                          rename=["ia", "ib", "count"]))

    thr = co_occurrence_threshold

    def finish(batch: pa.Table) -> pa.Table:
        _, voc, counts = ray.get(vocab_ref)
        batch = batch.filter(_pc.greater_equal(batch.column("count"), thr))
        ia = batch.column("ia").to_numpy()
        ib = batch.column("ib").to_numpy()
        n = batch.column("count").to_numpy()
        conf = [jaccard_confidence(int(counts[x]), int(counts[y]), int(s))
                for x, y, s in zip(ia, ib, n)]
        return pa.table({
            "concept_a": pa.array([voc[x] for x in ia], pa.string()),
            "concept_b": pa.array([voc[y] for y in ib], pa.string()),
            "count": batch.column("count"),
            "confidence": pa.array(conf, pa.float64()),
        })

    return pair_counts.map_batches(finish, batch_format="pyarrow")
