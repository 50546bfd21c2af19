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
only), so BELOW ``link_broadcast_limit`` it is broadcast via ``ray.put``
and applied inside ``map_batches``.  Above the limit (open-vocabulary
web scale, where "tiny relative to the corpus" still exceeds driver
memory) the links stay a Dataset end-to-end and remapping becomes a
bucketed left join per remapped column (``remap_column_bucketed``) —
the two-path pattern established by ``semantic_edges``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.similarity import (LinkingConfig, greedy_cluster,
                                    normalize_string, soundex)


_VOWELS = frozenset("aeiou ")


def _sub_block_key(name: str, cfg: LinkingConfig) -> str:
    """Secondary blocking key for the opt-in ``max_block_size`` bound:
    (first-2-consonants, length-band-of-8) of the normalized name.
    Consonants rather than raw chars because single-char typos are
    disproportionately vowel substitutions (soundex ignores vowels for
    the same reason) — a vowel-swap variant keeps its consonant skeleton
    and its length, so it stays in its original's sub-block (measured:
    raw first-2-chars cut planted vowel-typo recall 0.64→0.18 at 1M;
    consonants keep it, BASELINE.md).  Typos in the first two consonants
    or across a band boundary still diverge — the measured cost of the
    bound."""
    norm = normalize_string(name or "", cfg)
    cons = "".join(c for c in norm if c not in _VOWELS)[:2]
    return f"{cons}|{len(norm) // 8}"


def add_block_key(batch: pa.Table, dense_keys=None,
                  cfg: LinkingConfig | None = None) -> pa.Table:
    names = batch.column("name").to_pylist()
    types = batch.column("type").to_pylist()
    keys = []
    for n, t in zip(names, types):
        first_tok = (n or "").split(" ", 1)[0]
        key = f"{t}|{soundex(first_tok)}"
        if dense_keys is not None and key in dense_keys:
            key = f"{key}§{_sub_block_key(n, cfg)}"
        keys.append(key)
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


def compute_links_ds(entities_ds, cfg: LinkingConfig | None = None,
                     embedding_threshold: float | None = None):
    """entities Dataset → links Dataset (entity_id, canonical_id) — the
    scale-safe form: link rows never leave the cluster.  One exchange
    (the block-key groupby); greedy clustering runs inside each block.

    With ``cfg.max_block_size`` set (OPT-IN; default None = faithful
    reference semantics) a cheap pre-pass counts rows per block key
    (block-key cardinality is bounded by types × soundex codes, so the
    count table is tiny) and every block above the bound gets the
    secondary :func:`_sub_block_key` appended to its key — the dense
    (type, soundex) quadratic becomes many bounded sub-block quadratics
    that Ray schedules as separate groups.  Sub-blocking can miss links
    whose members straddle a sub-block boundary; divergence + planted-typo
    recall vs the faithful path are measured in BASELINE.md
    (scripts/scale_fuzzy_links_datapoints.py --max-block-size)."""
    cfg = cfg or LinkingConfig()
    dense_ref = None
    if cfg.max_block_size is not None:
        import ray
        entities_ds = entities_ds.materialize()   # two passes, one execution
        counts: dict[str, int] = {}

        def partial_counts(t: pa.Table) -> pa.Table:
            kb = add_block_key(t)
            import pyarrow.compute as pc
            vc = pc.value_counts(kb.column("block_key"))
            return pa.table({"block_key": vc.field("values"),
                             "n": vc.field("counts")})

        for b in entities_ds.map_batches(
                partial_counts, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for k, c in zip(b.column("block_key").to_pylist(),
                            b.column("n").to_pylist()):
                counts[k] = counts.get(k, 0) + c
        dense = frozenset(k for k, c in counts.items()
                          if c > cfg.max_block_size)
        if dense:
            dense_ref = ray.put(dense)

    if dense_ref is not None:
        import ray

        def key_fn(t: pa.Table) -> pa.Table:
            return add_block_key(t, ray.get(dense_ref), cfg)
    else:
        key_fn = add_block_key
    blocked = entities_ds.map_batches(key_fn, batch_format="pyarrow")
    # native groupby is safe HERE (exception to the hashagg rule): block
    # keys are coarse (first-char/phonetic), so group count ≪ entity count
    return blocked.groupby("block_key").map_groups(
        make_block_clusterer(cfg, embedding_threshold=embedding_threshold),
        batch_format="pandas")


def links_ds_to_dict(links_ds) -> dict[str, str]:
    """Collect a links Dataset into the broadcastable dict form (the
    ≤``link_broadcast_limit`` fast path only)."""
    links: dict[str, str] = {}
    for b in links_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:          # empty blocks carry no columns
            links.update(zip(b.column("entity_id").to_pylist(),
                             b.column("canonical_id").to_pylist()))
    return links


def remap_column_bucketed(ds, links_ds, col: str, num_buckets: int = 64):
    """Remap ``ds[col]`` through (entity_id → canonical_id) with a
    bucketed LEFT join — the above-limit path where the link table never
    ships to the driver or broadcasts whole.  Unlinked values pass
    through unchanged (left join + coalesce)."""
    from .hashagg import bucketed_join

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:     # empty blocks carry no columns
            return pa.table({col: pa.array([], pa.string()),
                             "_canon": pa.array([], pa.string())})
        return pa.table({col: t.column("entity_id"),
                         "_canon": t.column("canonical_id")})

    joined = bucketed_join(ds, links_ds.map_batches(
        rename, batch_format="pyarrow"), [col], how="left",
        num_buckets=num_buckets)

    def fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # an all-miss bucket comes back with a null-TYPED _canon column
        # (pandas → arrow inference); cast before coalesce
        merged = pc.coalesce(pc.cast(t.column("_canon"), pa.string()),
                             t.column(col))
        i = t.column_names.index(col)
        return t.drop_columns(["_canon"]).set_column(
            i, col, pc.cast(merged, pa.string()))

    # MATERIALIZE the remapped output: callers chain two remaps (subj
    # then obj) and feed further exchanges — a lazy chain both stalls
    # the streaming executor (multiple all-to-alls in one plan) and
    # re-runs the first join's full sort for the second join's schema
    # probe (bucketed_join needs schemas; on a lazy input that is a
    # limit-1 execution THROUGH the sort)
    return joined.map_batches(fold,
                              batch_format="pyarrow").materialize()


def compute_links(entities_ds, cfg: LinkingConfig | None = None,
                  stats: dict | None = None,
                  embedding_threshold: float | None = None) -> dict[str, str]:
    """entities Dataset → {entity_id: canonical_id}.  Materializes only the
    link rows (small by assumption, see module docstring).  Pass ``stats``
    to collect linking metrics (mirrors ``corpus/entity_linker.rs:44-85``
    LinkingStatistics: totals + linked counts + ratio)."""
    links = links_ds_to_dict(compute_links_ds(
        entities_ds, cfg, embedding_threshold=embedding_threshold))
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
