"""Fuzzy (near-duplicate) entity linking — the non-exact canonicalization
tier.

The reference's greedy single-pass clustering
(``string_similarity_linker.rs:68-127``) is order-dependent and O(n²) over
the WHOLE entity set — not shuffle-friendly.  Equivalent scalable design
(SURVEY §2.6): block entities by ``(type, soundex(first name token))``,
run the reference's greedy clustering INSIDE each block over a
deterministic sort order (by entity_id), emit (entity_id → canonical_id)
link rows.  Cross-block pairs are by construction phonetically dissimilar
first tokens, which at min_similarity=0.85 almost never link — this is the
documented partitioning assumption.

The resulting link set is tiny relative to the corpus (typo variants
only), so it is broadcast via ``ray.put`` and applied inside
``map_batches`` — never a shuffle join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.similarity import LinkingConfig, greedy_cluster, soundex


def add_block_key(batch: pa.Table) -> pa.Table:
    names = batch.column("name").to_pylist()
    types = batch.column("type").to_pylist()
    keys = []
    for n, t in zip(names, types):
        first_tok = (n or "").split(" ", 1)[0]
        keys.append(f"{t}|{soundex(first_tok)}")
    return batch.append_column("block_key", pa.array(keys, pa.string()))


def make_block_clusterer(cfg: LinkingConfig, embedding_threshold: float | None = None,
                         embedding_dim: int = 64):
    """Per-block greedy clustering, optionally refined by BATCHED hash-
    embedding scoring (SURVEY §7.2 step 5): all candidate names in the
    block are embedded in one batch (deterministic hash embedder, state
    amortized per actor) and a string-similarity link survives only if the
    embedding cosine also clears ``embedding_threshold`` — the candidate-
    disambiguation role the reference assigns to embeddings
    (``vector/mod.rs:587-644`` + ``corpus/entity_linker.rs``
    SemanticSimilarity strategy)."""

    def cluster_block(group: pd.DataFrame) -> pa.Table:
        items = list(zip(group["entity_id"], group["name"], group["conf"]))
        links = greedy_cluster(items, cfg)
        if links and embedding_threshold is not None:
            import numpy as np
            from ..functions.embedding import HashEmbedder
            name_of = dict(zip(group["entity_id"], group["name"]))
            embedder = HashEmbedder(dim=embedding_dim)
            ids = sorted({*links.keys(), *links.values()})
            mat = embedder.embed_many([name_of[i] for i in ids])
            row = {i: k for k, i in enumerate(ids)}
            kept = {}
            for src, dst in links.items():
                a, b = mat[row[src]], mat[row[dst]]
                if float(np.dot(a, b)) >= embedding_threshold:  # unit vectors
                    kept[src] = dst
            links = kept
        return pa.table({
            "entity_id": pa.array(list(links.keys()), pa.string()),
            "canonical_id": pa.array(list(links.values()), pa.string()),
        })
    return cluster_block


def compute_links(entities_ds, cfg: LinkingConfig | None = None,
                  stats: dict | None = None,
                  embedding_threshold: float | None = None) -> dict[str, str]:
    """entities Dataset → {entity_id: canonical_id}.  Materializes only the
    link rows (small by assumption, see module docstring).  Pass ``stats``
    to collect linking metrics (mirrors ``corpus/entity_linker.rs:44-85``
    LinkingStatistics: totals + linked counts + ratio)."""
    cfg = cfg or LinkingConfig()
    blocked = entities_ds.map_batches(add_block_key, batch_format="pyarrow")
    # native groupby is safe HERE (exception to the hashagg rule): block
    # keys are coarse (first-char/phonetic), so group count ≪ entity count
    links_ds = blocked.groupby("block_key").map_groups(
        make_block_clusterer(cfg, embedding_threshold=embedding_threshold),
        batch_format="pandas")
    df = links_ds.to_pandas()
    links = {} if df.empty else dict(zip(df["entity_id"], df["canonical_id"]))
    if stats is not None:
        total = entities_ds.count()
        stats.update({
            "total_entities": int(total),
            "linked_entities": len(links),
            "canonical_targets": len(set(links.values())),
            "link_ratio": (len(links) / total) if total else 0.0,
        })
    return links


def make_remap_triples(links_ref):
    """Broadcast-remap subj/obj through the link map inside map_batches."""
    def remap(batch: pa.Table) -> pa.Table:
        import ray
        links = ray.get(links_ref) if not isinstance(links_ref, dict) else links_ref
        if not links:
            return batch
        subj = [links.get(s, s) for s in batch.column("subj").to_pylist()]
        obj = [links.get(o, o) for o in batch.column("obj").to_pylist()]
        batch = batch.set_column(batch.column_names.index("subj"), "subj",
                                 pa.array(subj, pa.string()))
        batch = batch.set_column(batch.column_names.index("obj"), "obj",
                                 pa.array(obj, pa.string()))
        return batch
    return remap


def make_remap_entities(links_ref):
    def remap(batch: pa.Table) -> pa.Table:
        import ray
        links = ray.get(links_ref) if not isinstance(links_ref, dict) else links_ref
        if not links:
            return batch
        eids = [links.get(e, e) for e in batch.column("entity_id").to_pylist()]
        return batch.set_column(batch.column_names.index("entity_id"), "entity_id",
                                pa.array(eids, pa.string()))
    return remap
