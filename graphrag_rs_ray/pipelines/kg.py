"""The flagship dataflow: Parquet web pages → knowledge-graph shards.

Mirrors the reference's 7-stage indexing path (``graph/mod.rs:89-150``,
``HOW_IT_WORKS.md`` stages 1-5) re-expressed Ray-Data-first:

    read_parquet(pages)                              # url, warc_ts, html, text, lang
      → map_batches(extract_text)                    # automaton; drop html col
      → map_batches(ChunkStage)                      # 1 doc → N chunk rows
      → map_batches(ExtractKG, concurrency=N)        # actor pool → entity+triple rows
      → [entities] partial agg → groupby(entity_id)  # exact canonicalization
      → [fuzzy]   blocked greedy links, broadcast    # near-dup tier
      → [triples] remap → partial agg → groupby(s,p,o)  # exact triple dedup
      → write entities.parquet + triples shards partitioned by hash(subj)%P
        with per-stage manifests (checkpoint-resume)

Single-consumption variants (``triples_dataset``) stay fully lazy — one
streaming pass, no materialization.  ``build_kg`` consumes the combined
extraction stream twice (entities + triples), so it stages it to Parquet
(resumable) or the object store first.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

from ..config import KGConfig
from ..functions.similarity import LinkingConfig
from ..stages.canonicalize import (
    entity_bucket_merge,
    partial_entity_agg,
    partial_triple_agg,
)
from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate
from ..stages.chunk import ChunkStage
from ..stages.extract_text import extract_text_stage
from ..stages.kg_extract import ExtractKG, entities_only, make_extract_fn, triples_only
from ..stages.linking import (
    compute_links_ds,
    links_ds_to_dict,
    make_remap_entities,
    make_remap_triples,
    remap_column_bucketed,
)
from ..state.manifests import (
    fingerprint_config,
    read_manifest,
    stage_complete,
    write_manifest,
)


def pages_to_chunks(pages_ds, cfg: KGConfig):
    docs = pages_ds.map_batches(extract_text_stage, batch_format="pyarrow")
    return docs.map_batches(ChunkStage(cfg), batch_format="pyarrow")


class RegistryStage:
    """Actor-pool wrapper: builds the configured extractor once per actor
    from the stage registry (SURVEY §2.13)."""

    def __init__(self, cfg: KGConfig):
        from ..stages.registry import make_extractor
        self.stage = make_extractor(cfg)

    def __call__(self, batch):
        return self.stage(batch)


def chunks_to_combined(chunks_ds, cfg: KGConfig):
    """Extraction stage, selected by ``cfg.extractor`` (registry).

    Pattern path default: stateless tasks with a per-worker-process
    extractor memo (elastic, no pool sizing).  Any other extractor (or an
    explicit ``cfg.extract_concurrency``) runs as an actor pool — capped
    below the cluster CPU count so the read/shuffle stages never starve."""
    from ..stages.registry import EXTRACTORS
    if cfg.extractor not in EXTRACTORS:   # fail on the driver, not in an actor
        raise ValueError(f"unknown extractor {cfg.extractor!r}; "
                         f"registered: {sorted(EXTRACTORS)}")
    if cfg.extractor == "pattern" and cfg.extract_concurrency is None:
        return chunks_ds.map_batches(make_extract_fn(cfg), batch_format="pyarrow",
                                     batch_size=cfg.batch_size)
    import ray
    from ..stages.hashagg import auto_pool
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    conc = cfg.extract_concurrency
    if conc is None:
        conc = auto_pool()
    elif isinstance(conc, int):
        conc = min(conc, max(1, cpus - 2))
    return chunks_ds.map_batches(RegistryStage, fn_constructor_args=(cfg,),
                                 batch_format="pyarrow", batch_size=cfg.batch_size,
                                 concurrency=conc)


def dedup_triples(triples_rows_ds, cfg: KGConfig):
    """(subj, pred, obj) exact dedup: per-batch combiner (pyarrow group_by,
    no shuffle) then a hash-bucketed shuffle with vectorized C++
    aggregation per bucket (Ray's native groupby pays ~0.3 ms Python per
    GROUP — fatal at triple cardinality; see ``stages/hashagg.py``).
    ``context_sample`` is the global-min chunk_id (deterministic);
    ``n_contexts`` preserves the full context count (the reference's
    unbounded ``context: Vec<ChunkId>`` does not scale; SURVEY §2.5)."""
    # batch_size=None → combine over the WHOLE block (max pre-shuffle
    # collapse; a hub triple contributes one row per block to the shuffle)
    partial = triples_partial(triples_rows_ds)
    return hash_grouped_aggregate(
        partial, ["subj", "pred", "obj"], triple_final_agg(),
        num_buckets=cfg.num_shards * 4)


def triples_partial(triples_rows_ds, coalesce_rows: int | None = None):
    """The pre-exchange combine stage of triple dedup (shared by the
    in-store path above and the disk-shuffle path in ``write_graph``).

    ``coalesce_rows`` adds a SECOND combine level: windows of that many
    partial rows re-combined across blocks with the final aggregate's
    associative ops (conf max / n_contexts sum / context_sample min —
    ``triple_final_agg``, so the semantics are shared by construction).
    The disk-shuffle sink passes it (at 16M pages single-level combining
    still emitted 197.6M partial rows / 22.6 GB because every block
    re-emits the saturated vocabulary; windowing cut the 64M stage to
    9.1 GB).  The DEFAULT in-store path must NOT: bundling partial
    blocks into multi-million-row batches serializes the streaming
    pipeline (measured: the sf0.1 headline went 1.6 s → 21 s when level
    2 ran before the in-store exchange)."""
    partial = triples_rows_ds.map_batches(partial_triple_agg,
                                          batch_format="pyarrow",
                                          batch_size=None)
    if not coalesce_rows:
        return partial
    return partial.map_batches(triple_final_agg(),
                               batch_format="pyarrow",
                               batch_size=coalesce_rows)


def triple_final_agg():
    """The per-group finishing aggregate of triple dedup — ONE
    definition so the in-store and disk-shuffle paths are semantically
    identical by construction."""
    return grouped_arrow_agg(
        ["subj", "pred", "obj"],
        [("conf", "max"), ("n_contexts", "sum"),
         ("context_sample", "min")],
        rename=["subj", "pred", "obj", "conf", "n_contexts",
                "context_sample"])


def triples_dataset(pages_ds, cfg: KGConfig | None = None):
    """Lazy pages → deduped triples (no fuzzy tier): the single-pass
    benchmark path."""
    cfg = cfg or KGConfig()
    combined = chunks_to_combined(pages_to_chunks(pages_ds, cfg), cfg)
    triples = combined.map_batches(triples_only, batch_format="pyarrow")
    return dedup_triples(triples, cfg)


def entities_dataset(pages_ds, cfg: KGConfig | None = None):
    """Lazy pages → canonical entities (exact tier): single streaming pass
    with no materialization — use when triples are not needed."""
    cfg = cfg or KGConfig()
    combined = chunks_to_combined(pages_to_chunks(pages_ds, cfg), cfg)
    e_rows = combined.map_batches(entities_only, batch_format="pyarrow")
    return hash_grouped_aggregate(
        e_rows.map_batches(partial_entity_agg, batch_format="pyarrow",
                           batch_size=None).repartition(cfg.num_shards * 4),
        ["entity_id"], entity_bucket_merge, num_buckets=cfg.num_shards * 4)


@dataclass
class KGResult:
    entities: "object"            # ray.data.Dataset — entities table
    triples: "object"             # ray.data.Dataset — deduped triples
    links: dict[str, str]         # fuzzy-tier map (broadcast path only;
                                  # empty on the bucketed scale path)
    fingerprint: str = ""         # build-config fingerprint (resume token)
    n_links: int = 0              # fuzzy link count (both paths)
    t_partial: "object" = None    # pre-exchange partial triple rows —
                                  # the disk-shuffle sink consumes these
                                  # instead of the in-store dedup


def build_kg(pages_ds, cfg: KGConfig | None = None, work_dir: str | None = None) -> KGResult:
    """Full build.  ``work_dir`` (recommended) stages the combined
    extraction output to Parquet so (a) both downstream branches read it
    without recomputing the extractor and (b) a rerun with the same config
    resumes from it (manifest fingerprint)."""
    import ray
    import ray.data as rd

    cfg = cfg or KGConfig()
    if work_dir:
        combined_dir = os.path.join(work_dir, "combined")
        fp = fingerprint_config("combined", cfg)
        if not stage_complete(combined_dir, fp):
            import shutil
            if os.path.exists(combined_dir):   # stale/partial stage output
                shutil.rmtree(combined_dir)    # (write_parquet APPENDS by default)
            combined = chunks_to_combined(pages_to_chunks(pages_ds, cfg), cfg)
            os.makedirs(combined_dir, exist_ok=True)
            combined.write_parquet(combined_dir)
            write_manifest(combined_dir, "combined", fp)
        combined = rd.read_parquet(combined_dir)
    else:
        combined = chunks_to_combined(pages_to_chunks(pages_ds, cfg), cfg).materialize()

    # ---- entities: exact tier -----------------------------------------
    # coalesce the combined partials before the exchange: the partial
    # stage emits thousands of tiny blocks at big inputs (16M pages →
    # 3174 blocks / 2.85M rows) and Ray's sort fans with the block
    # count (measured: the entity exchange cost 610 s of a 646 s stage)
    e_rows = combined.map_batches(entities_only, batch_format="pyarrow")
    entities = hash_grouped_aggregate(
        e_rows.map_batches(partial_entity_agg, batch_format="pyarrow",
                           batch_size=None).repartition(cfg.num_shards * 4),
        ["entity_id"], entity_bucket_merge, num_buckets=cfg.num_shards * 4)

    links: dict[str, str] = {}
    n_links = 0
    links_ds = None
    if cfg.fuzzy_linking:
        entities = entities.materialize()
        links_ds = compute_links_ds(
            entities,
            LinkingConfig(min_similarity=cfg.min_similarity,
                          use_phonetic=cfg.use_phonetic),
            embedding_threshold=cfg.link_embedding_threshold).materialize()
        n_links = links_ds.count()
        if n_links and n_links <= cfg.link_broadcast_limit:
            # fast path: links fit the driver — broadcast dict remap
            links = links_ds_to_dict(links_ds)
            links_ref = ray.put(links)
            entities = hash_grouped_aggregate(
                entities
                .map_batches(make_remap_entities(links_ref), batch_format="pyarrow")
                .map_batches(partial_entity_agg_from_final, batch_format="pyarrow"),
                ["entity_id"], entity_bucket_merge, num_buckets=cfg.num_shards)
        elif n_links:
            # scale path: links stay a Dataset; remap via bucketed left
            # joins — no driver materialization, no whole-set broadcast
            entities = hash_grouped_aggregate(
                remap_column_bucketed(entities, links_ds, "entity_id")
                .map_batches(partial_entity_agg_from_final, batch_format="pyarrow"),
                ["entity_id"], entity_bucket_merge, num_buckets=cfg.num_shards)

    # ---- triples -------------------------------------------------------
    t_rows = combined.map_batches(triples_only, batch_format="pyarrow")
    if links:
        links_ref2 = ray.put(links)
        t_rows = t_rows.map_batches(make_remap_triples(links_ref2), batch_format="pyarrow")
    elif n_links:
        t_rows = remap_column_bucketed(
            remap_column_bucketed(t_rows, links_ds, "subj"), links_ds, "obj")
    triples = dedup_triples(t_rows, cfg)

    return KGResult(entities=entities, triples=triples, links=links,
                    fingerprint=fingerprint_config("combined", cfg),
                    n_links=n_links, t_partial=triples_partial(t_rows))


def partial_entity_agg_from_final(batch: pa.Table) -> pa.Table:
    """Re-shape final entity rows back into partial-agg rows so the merge
    groupby can run again after fuzzy remapping (name_count := mention_count
    so canonical-name voting weights by corpus frequency)."""
    return pa.table({
        "entity_id": batch.column("entity_id"),
        "name": batch.column("name"),
        "type": batch.column("type"),
        "conf": batch.column("conf"),
        "mention_count": batch.column("mention_count"),
        "name_count": batch.column("mention_count"),
    })


def export_graph(result: KGResult, out_dir: str, fmt: str = "graphml") -> dict:
    """Export a built KG for external/visualization tools via the
    interchange sinks (``sources/rdf_graphml.py``): ``graphml`` or
    ``ntriples``.  Adapts the KG schemas to the import model — entity
    ``conf``/``mention_count`` and triple ``conf``/``n_contexts`` travel
    as attributes (stringified; N-Triples drops edge attributes by that
    sink's documented bound).  Round-trip: ``import_graphml(out)``
    reproduces ids/names/types/attributes exactly."""
    import json as _json

    from ..sources.rdf_graphml import export_graphml, export_ntriples

    def ents_adapter(t: pa.Table) -> pa.Table:
        attrs = [
            _json.dumps({"conf": f"{c:.6f}", "mention_count": str(m)},
                        sort_keys=True)
            for c, m in zip(t.column("conf").to_pylist(),
                            t.column("mention_count").to_pylist())]
        return pa.table({"id": t.column("entity_id"),
                         "name": t.column("name"),
                         "entity_type": t.column("type"),
                         "attributes": pa.array(attrs, pa.string())})

    def rels_adapter(t: pa.Table) -> pa.Table:
        attrs = [
            _json.dumps({"conf": f"{c:.6f}", "n_contexts": str(n)},
                        sort_keys=True)
            for c, n in zip(t.column("conf").to_pylist(),
                            t.column("n_contexts").to_pylist())]
        return pa.table({"source": t.column("subj"),
                         "target": t.column("obj"),
                         "relation_type": t.column("pred"),
                         "attributes": pa.array(attrs, pa.string())})

    ents = result.entities.map_batches(ents_adapter, batch_format="pyarrow")
    rels = result.triples.map_batches(rels_adapter, batch_format="pyarrow")
    if fmt == "graphml":
        return export_graphml(ents, rels, out_dir)
    if fmt == "ntriples":
        return export_ntriples(ents, rels, out_dir)
    raise ValueError(f"unknown export format: {fmt!r}")


def write_graph(result: KGResult, out_dir: str, num_shards: int = 16,
                input_token: str = "", disk_shuffle: bool = False) -> dict:
    """Materialize the graph: ``entities/`` + ``triples/shard=K/`` adjacency
    shards partitioned by hash(subj) % P, each with a manifest (lineage +
    counts) for resume and metrics.

    Resume is PARTITION-granular: a rerun with the same ``(num_shards,
    input_token)`` returns immediately if the top-level manifest matches,
    and otherwise rewrites ONLY the shards (and the entity table) whose
    per-partition manifest is missing or stale — data always lands before
    its manifest, so a crashed write never looks complete.  A failed
    16-shard job with 13 finished shards redoes 3, not 16.
    ``input_token`` identifies the input build; it defaults to the
    KGResult's build-config fingerprint, so a config change upstream
    invalidates the sink even at equal shard count.  Same token = same
    input assumed (the standard same-job-rerun-after-failure contract);
    a changed token or shard count invalidates every partition.

    ``disk_shuffle=True`` replaces the in-object-store triple-dedup sort
    with a DISK-partitioned shuffle for exchange volumes that exceed the
    store (measured at 16M pages: 197.6M partial rows / 22.6 GB sank the
    default 37 GB store — spill storms, then an 85 GB driver OOM):
    the pre-exchange partial rows (``result.t_partial``) stream straight
    to ``_shuffle/shard=K/`` Parquet in ONE map-only pass (no all-to-all
    anywhere), then each shard is reduced by an independent Ray task
    (pyarrow ``group_by`` with EXACTLY the in-store path's aggregate —
    ``triple_final_agg``) into its final adjacency shard.  Raw tasks are
    justified here: Ray Data cannot express a per-directory reduce
    without re-shuffling.  Peak memory per reduce = one shard
    (total/num_shards — num_shards is the memory knob); the stage dir is
    fingerprint-gated so a crashed run resumes it for free, and shard
    reduces keep the usual partition-granular resume."""
    import glob
    import shutil

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    input_token = input_token or getattr(result, "fingerprint", "")
    top_fp = fingerprint_config("graph", num_shards, input_token)
    if stage_complete(out_dir, top_fp):
        return read_manifest(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def _count(d: str) -> int:
        files = glob.glob(os.path.join(d, "*.parquet"))
        return pads.dataset(files).count_rows() if files else 0

    ent_dir = os.path.join(out_dir, "entities")
    tri_dir = os.path.join(out_dir, "triples")
    ent_fp = fingerprint_config("graph-entities", num_shards, input_token)
    if not stage_complete(ent_dir, ent_fp):
        if os.path.exists(ent_dir):           # write_parquet APPENDS —
            shutil.rmtree(ent_dir)            # a rerun must not duplicate
        os.makedirs(ent_dir)
        result.entities.write_parquet(ent_dir)
        write_manifest(ent_dir, "graph_entities", ent_fp,
                       rows=_count(ent_dir))
    n_entities = read_manifest(ent_dir)["rows"]

    def shard_fp(k: int) -> str:
        return fingerprint_config("graph", num_shards, input_token,
                                  f"shard={k}")

    os.makedirs(tri_dir, exist_ok=True)
    done = {k for k in range(num_shards)
            if stage_complete(os.path.join(tri_dir, f"shard={k}"),
                              shard_fp(k))}
    if not done and os.path.exists(tri_dir):
        shutil.rmtree(tri_dir)                # config change / first run:
        os.makedirs(tri_dir)                  # drop stale layouts whole
    missing = [k for k in range(num_shards) if k not in done]

    if missing:
        for k in missing:                     # partial data without a
            d = os.path.join(tri_dir, f"shard={k}")
            if os.path.exists(d):             # manifest = crashed write
                shutil.rmtree(d)

        def add_shard(batch: pa.Table) -> pa.Table:
            h = pc.cast(pa.array(
                [hash_subj(s, num_shards)
                 for s in batch.column("subj").to_pylist()],
                pa.int32()), pa.int32())
            return batch.append_column("shard", h)

        if disk_shuffle:
            import ray

            stage_dir = os.path.join(out_dir, "_shuffle")
            stage_fp = fingerprint_config("graph-shuffle", num_shards,
                                          input_token)
            if not stage_complete(stage_dir, stage_fp):
                if os.path.exists(stage_dir):     # crashed stage write
                    shutil.rmtree(stage_dir)
                os.makedirs(stage_dir)
                # level-2 window combine before the disk write (see
                # triples_partial: 22.6 GB → 9.1 GB of stage volume);
                # safe HERE because the sink is a terminal write, not a
                # streaming exchange
                (result.t_partial
                 .map_batches(triple_final_agg(), batch_format="pyarrow",
                              batch_size=2_000_000)
                 .map_batches(add_shard, batch_format="pyarrow")
                 .write_parquet(stage_dir, partition_cols=["shard"]))
                write_manifest(stage_dir, "graph_shuffle", stage_fp)

            @ray.remote(num_cpus=1)
            def reduce_shard(k: int) -> int:
                files = glob.glob(os.path.join(stage_dir, f"shard={k}",
                                               "*.parquet"))
                d = os.path.join(tri_dir, f"shard={k}")
                os.makedirs(d, exist_ok=True)
                if not files:
                    return 0
                t = pads.dataset(files).to_table(
                    columns=["subj", "pred", "obj", "conf",
                             "n_contexts", "context_sample"])
                out = triple_final_agg()(t)
                import pyarrow.parquet as pq
                pq.write_table(out, os.path.join(d, "part-0.parquet"))
                return out.num_rows

            rows_by_shard = dict(zip(
                missing, ray.get([reduce_shard.remote(k)
                                  for k in missing])))
            for k in missing:
                d = os.path.join(tri_dir, f"shard={k}")
                os.makedirs(d, exist_ok=True)
                write_manifest(d, "triples_shard", shard_fp(k),
                               rows=rows_by_shard[k])
        else:
            sharded = result.triples.map_batches(add_shard,
                                                 batch_format="pyarrow")
            if done:
                todo = pa.array(missing, pa.int32())

                def keep_missing(t: pa.Table) -> pa.Table:
                    return t.filter(pc.is_in(t.column("shard"),
                                             value_set=todo))
                sharded = sharded.map_batches(keep_missing,
                                              batch_format="pyarrow")
            sharded.write_parquet(tri_dir, partition_cols=["shard"])
            for k in missing:
                d = os.path.join(tri_dir, f"shard={k}")
                os.makedirs(d, exist_ok=True)  # empty shards get a dir too
                write_manifest(d, "triples_shard", shard_fp(k),
                               rows=_count(d))

    # per-partition lineage rollup from the shard manifests
    shard_counts = {f"shard={k}":
                    read_manifest(os.path.join(tri_dir, f"shard={k}"))["rows"]
                    for k in range(num_shards)}
    n_triples = sum(shard_counts.values())
    manifest = write_manifest(out_dir, "graph", top_fp,
                              rows=n_triples,
                              extra={"n_entities": n_entities, "n_triples": n_triples,
                                     "num_shards": num_shards,
                                     "shard_rows": shard_counts,
                                     "resumed_shards": sorted(done),
                                     "n_fuzzy_links": result.n_links})
    return manifest


def to_reference_entity_schema(entities_ds):
    """Rename our entity columns to the reference's Parquet persistence
    schema (``persistence/parquet.rs:218-229``): id, name, entity_type,
    confidence, mention_count [, embedding] — so a consumer of the
    reference's entities.parquet can read ours unchanged."""
    def rename(t: pa.Table) -> pa.Table:
        mapping = {"entity_id": "id", "type": "entity_type", "conf": "confidence"}
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])
    return entities_ds.map_batches(rename, batch_format="pyarrow")


def hash_subj(subj: str, num_shards: int) -> int:
    import hashlib
    return int.from_bytes(hashlib.blake2b(subj.encode(), digest_size=4).digest(), "little") % num_shards
