"""Canonicalization + dedup aggregates, two-phase (combiner → groupby).

Exact-tier canonicalization is a ``groupby(entity_id)`` merge — possible
without any join because entity ids are content-derived
(``{TYPE}_{normalized_name}``).  Merge semantics follow the reference:
max confidence, summed mentions (``entity/mod.rs:767-788``,
``graph/mod.rs:210-232``), canonical display name = most frequent, ties →
longest (``corpus/entity_linker.rs:468-481``).

Skew design (SURVEY §4): both merges are associative, so each runs as a
per-batch PARTIAL aggregate inside ``map_batches`` (pyarrow ``group_by``,
no shuffle) followed by a global ``groupby`` over the already-collapsed
partials — a hub entity contributes ONE row per block to the shuffle
instead of one row per mention, which is the salted-combine pattern without
needing an explicit salt column.
"""

from __future__ import annotations

import pyarrow as pa


def partial_entity_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse entity rows to one row per
    (entity_id, name) with summed mentions / max conf / row count."""
    g = batch.group_by(["entity_id", "name", "type"]).aggregate([
        ("conf", "max"), ("mention_count", "sum"), ("chunk_id", "count"),
    ])
    return g.rename_columns(["entity_id", "name", "type", "conf", "mention_count", "name_count"])


def entity_bucket_merge(t: pa.Table) -> pa.Table:
    """Vectorized per-bucket entity merge (pandas groupby, no per-key
    Python): canonical name by (total count, length, lexicographic) vote
    (= ``functions/similarity.select_canonical_name`` semantics), max conf,
    summed mentions."""
    df = t.to_pandas()
    per_name = (df.groupby(["entity_id", "name", "type"], as_index=False)
                  .agg(conf=("conf", "max"),
                       mention_count=("mention_count", "sum"),
                       name_count=("name_count", "sum")))
    per_name["_len"] = per_name["name"].str.len()
    ranked = per_name.sort_values(
        ["entity_id", "name_count", "_len", "name"],
        ascending=[True, False, False, False])
    canon = ranked.drop_duplicates("entity_id", keep="first")[["entity_id", "name"]]
    totals = (per_name.groupby("entity_id", as_index=False)
                      .agg(type=("type", "first"), conf=("conf", "max"),
                           mention_count=("mention_count", "sum")))
    out = totals.merge(canon, on="entity_id")
    return pa.table({
        "entity_id": pa.array(out["entity_id"], pa.string()),
        "name": pa.array(out["name"], pa.string()),
        "type": pa.array(out["type"], pa.string()),
        "conf": pa.array(out["conf"], pa.float32()),
        "mention_count": pa.array(out["mention_count"], pa.int64()),
    })


def partial_triple_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for triples: one row per (subj, pred, obj) with
    max conf, occurrence count, and a deterministic sample context
    (min chunk_id)."""
    g = batch.group_by(["subj", "pred", "obj"]).aggregate([
        ("conf", "max"), ("chunk_id", "count"), ("chunk_id", "min"),
    ])
    return g.rename_columns(["subj", "pred", "obj", "conf", "n_contexts", "context_sample"])
